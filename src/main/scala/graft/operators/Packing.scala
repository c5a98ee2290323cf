package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: lay ordered chunks end-to-end in one global token
  * stream and cut fixed-budget context windows at exact token offsets —
  * the step between chunking and batch assembly in a training pipeline
  * (chunks may straddle a window boundary, exactly like real
  * concatenate-then-split packing).
  *
  * The global running offset is a prefix sum over a total order, which
  * a naive window (`ORDER BY … ROWS UNBOUNDED PRECEDING` with no
  * partition) computes in ONE reducer — a scale-killer. This operator
  * runs the classic two-phase distributed prefix sum instead:
  *
  *   1. deterministic range buckets on the ordering key (id DIV span),
  *      so bucket order == global order;
  *   2. per-bucket prefix sums in parallel (window partitioned by
  *      bucket);
  *   3. bucket totals → exclusive prefix offsets. Only `buckets` rows
  *      (a few KB) ever reach the driver — the same bounded-model
  *      contract as the IVF centroid collect — and they join back as
  *      a broadcast.
  *
  * All arithmetic is integer, so offsets and window ids are
  * engine-exact and an external SQL oracle (a plain global cumsum)
  * re-derives them bit-for-bit.
  */
object Packing {

  /** Assign global token offsets and context-window ids to chunks.
    *
    * Input must carry an integral ordering pair (`idCol`, `idxCol`) and
    * a token count `tokCol`; ids need not be dense. Output adds
    * `start_tok` (exclusive prefix sum in (id, idx) order), `win_first`
    * and `win_last` (window ids at `budget`-token boundaries).
    */
  def packOffsets(
      spark: SparkSession, df: DataFrame,
      idCol: String, idxCol: String, tokCol: String,
      budget: Long, buckets: Int = 32): DataFrame = {
    require(budget > 0 && buckets > 0, "budget and buckets must be positive")
    // Materialize the narrow (id, idx, tok) projection ONCE as an eager
    // local checkpoint: the bounds pre-pass, the bucket totals, and the
    // windowed pass below all read this snapshot, so a nondeterministic
    // upstream (sample(), re-listed files) cannot give the three passes
    // different rows — which would silently corrupt global offsets —
    // and an expensive lineage (chunking) is not recomputed per pass.
    // localCheckpoint (not persist) because the returned plan keeps
    // reading it, so there is no safe place to unpersist inside this
    // method: checkpoint blocks are freed by the ContextCleaner when the
    // caller drops the returned frame, instead of leaking a manually
    // persisted frame for the session lifetime. Tradeoff, documented:
    // a lost executor cannot recompute checkpoint blocks — but replaying
    // a nondeterministic lineage is exactly the corruption this guards
    // against, so the snapshot is the correct choice at scale too.
    val base = df.select(col(idCol), col(idxCol), col(tokCol))
      .localCheckpoint(true)
    // range buckets from the observed id span: bucket order == id order
    val bounds = base.agg(min(col(idCol)).cast("long"), max(col(idCol)).cast("long")).first()
    if (bounds.isNullAt(0)) { // empty input: keep the output schema stable
      return df.select(col(idCol), col(idxCol), col(tokCol))
        .withColumn("start_tok", lit(0L))
        .withColumn("win_first", lit(0L))
        .withColumn("win_last", lit(0L))
        .limit(0)
    }
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val span = math.max(1L, (hi - lo) / buckets + 1)
    // integer DIV, not float `/`: long/long in Spark divides as DOUBLE,
    // whose 53-bit mantissa mis-rounds quotients past ~9e15 — a
    // boundary id would land in the wrong bucket and break the
    // bucket-order == id-order invariant the prefix sum rests on
    // (id - lo >= 0 by construction, so DIV == floor here)
    val withBucket = base
      .select(col(idCol), col(idxCol), col(tokCol),
        (col(idCol).cast("long") - lit(lo)).as("__rel"))
      .withColumn("__b", expr(s"__rel DIV ${span}L"))
      .drop("__rel")
    // phase 2: per-bucket exclusive prefix sum (parallel across buckets)
    val w = Window.partitionBy("__b").orderBy(col(idCol), col(idxCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = withBucket.withColumn("__local", coalesce(sum(col(tokCol)).over(w), lit(0L)))
    // phase 3: bucket totals → exclusive offsets (buckets rows only)
    val totals = withBucket.groupBy("__b").agg(sum(col(tokCol)).as("__t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((Long.MinValue, 0L)) {
      case ((_, acc), (b, t)) => (b, acc + t)
    }.sliding(2).map { case Array((_, prev), (b, _)) => (b, prev) }.toSeq
    import spark.implicits._
    val offDf = broadcast(offsets.toDF("__b", "__off"))
    val start = (col("__off") + col("__local")).as("start_tok")
    // same integer-DIV discipline as the bucket id: global token
    // offsets are exactly the quantity that outgrows a double mantissa
    // at 100 TB (all operands non-negative, so DIV == floor)
    local.join(offDf, "__b")
      .select(col(idCol), col(idxCol), col(tokCol), start,
        col(tokCol).cast("long").as("__tk"))
      .withColumn("win_first", expr(s"start_tok DIV ${budget}L"))
      .withColumn("win_last",
        when(col("__tk") === 0, col("win_first"))
          .otherwise(expr(s"(start_tok + __tk - 1) DIV ${budget}L")))
      .drop("__tk")
  }
}
