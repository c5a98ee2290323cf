package graft.operators

import org.apache.spark.sql.DataFrame

/** Loud-failure guards for small-side-by-contract inputs.
  *
  * Several operators broadcast a side that is small BY USAGE CONTRACT
  * (fuzzy-match probe sets, ANN query sets): nothing in the plan
  * enforces the contract, so a silently-grown probe set flips the
  * broadcast into a replicated join against the full corpus — at
  * 100 TB that's a cluster-killer that LOOKS like a slow day. These
  * guards spend one bounded count job to fail fast with a named
  * limit instead (the same loud-failure posture as the weight-0
  * mixture rejection in [[Sampling]]).
  */
object Guards {

  /** Return `df` unchanged if it holds at most `maxRows` rows; throw
    * with an actionable message otherwise. Call it on the frame that
    * is about to be `broadcast(...)`.
    */
  def assertBroadcastable(df: DataFrame, maxRows: Long, what: String): DataFrame = {
    // limit+count bounds the guard job itself: it never scans past
    // maxRows+1 rows even when the input is the full corpus
    val n = df.limit((maxRows + 1).min(Int.MaxValue.toLong).toInt).count()
    require(n <= maxRows,
      s"$what holds more than $maxRows rows — broadcasting it would replicate " +
        s"the join against every corpus partition. Shrink the probe set or " +
        s"switch to a shuffled/bucketed join for this size.")
    df
  }
}
