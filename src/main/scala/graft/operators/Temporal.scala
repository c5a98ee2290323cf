package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins the reference lacks entirely (SURVEY §2.6) but a
  * training-data/observability pipeline needs: as-of (point-in-time)
  * join.
  *
  * The naive formulation — range-join `l.ts >= r.ts` then keep the max
  * r.ts per left row — is a cross-ish join that explodes at scale. The
  * scalable shape used here is union + carry-forward:
  *
  *   1. tag both sides, union on (key, ts) — ONE dataset
  *   2. one window over (key) ordered by (ts, side) with
  *      `last(right_value, ignoreNulls)` carries the most recent right
  *      row forward onto every left row
  *   3. filter back to left rows
  *
  * Cost: a single hash shuffle on the join key + an in-partition sort —
  * the same price as one sort-merge join, independent of how many right
  * rows precede each left row. Right rows tie-break BEFORE left rows at
  * equal timestamps (`l.ts >= r.ts` semantics, matching DuckDB's
  * ASOF JOIN, which the oracle uses).
  */
object Temporal {

  /** Left as-of join: for each left row, the latest right row with
    * `r.tsCol <= l.tsCol` on the same key. Right columns (except key
    * and ts) are appended; left rows with no prior right row keep
    * nulls (left-outer semantics).
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String): DataFrame = {
    val rightVals = right.columns.filter(c => c != keyCol && c != tsCol).toSeq
    val leftVals = left.columns.filter(c => c != keyCol && c != tsCol).toSeq

    // side 0 = right sorts before side 1 = left at equal ts (>= match)
    val taggedRight = right.select(
      (col(keyCol) +: col(tsCol).as("__ts") +: lit(0).as("__side") +:
        (rightVals.map(col) ++ leftVals.map(c => lit(null).cast(left.schema(c).dataType).as(c)))): _*)
    val taggedLeft = left.select(
      (col(keyCol) +: col(tsCol).as("__ts") +: lit(1).as("__side") +:
        (rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++ leftVals.map(col))): _*)

    val w = Window.partitionBy(keyCol).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(taggedRight.unionByName(taggedLeft)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select((col(keyCol) +: col("__ts").as(tsCol) +: (leftVals ++ rightVals).map(col)): _*)
  }
}
