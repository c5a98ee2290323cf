package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-side data layout: range-partition + in-partition sort.
  *
  * At 100 TB the read path lives or dies on file skipping: parquet
  * footers carry per-column min/max, and a scan with a predicate on the
  * layout key prunes every file whose range misses. That only works if
  * the writer clustered the data — this operator is that writer step.
  *
  *   - `repartitionByRange` samples the key distribution and assigns
  *     contiguous, balanced key ranges to output partitions (one file
  *     each) — robust to skew, unlike hash-bucketing by a hot key.
  *   - `sortWithinPartitions` orders rows inside each file so row-group
  *     (page-level) min/max stats prune within the file too.
  *
  * For multi-dimension pruning, pass several columns: the lexicographic
  * range partitioning gives exact pruning on the leading column and
  * coarse pruning on the rest (the classic linear-order tradeoff vs a
  * space-filling curve).
  */
object Layout {

  /** the layout transform itself (composable, plan-testable). */
  def sorted(df: DataFrame, numFiles: Int, keys: Column*): DataFrame =
    df.repartitionByRange(numFiles, keys: _*)
      .sortWithinPartitions(keys: _*)

  /** write parquet files clustered on `keys` — downstream scans with
    * predicates on `keys` skip whole files via footer min/max.
    */
  def writeSorted(df: DataFrame, path: String, numFiles: Int, keys: Column*): Unit =
    sorted(df, numFiles, keys: _*).write.mode("overwrite").parquet(path)

  /** per-file key ranges of a written dataset — the verification view:
    * non-overlapping ranges prove the layout prunes.
    */
  def fileRanges(df: DataFrame, key: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(key).as("lo"), max(key).as("hi"), count(lit(1)).as("rows"))

  /** Write `df` as a BUCKETED (and per-bucket sorted) managed table —
    * the co-location layout for repeated large-×-large joins: two
    * tables bucketed on the same key with the same bucket count join
    * with ZERO exchanges on either side (Spark trusts the on-disk hash
    * partitioning), turning every downstream fact-fact join on that
    * key from two 100 TB shuffles into a local zip of bucket files.
    * Bucket metadata lives in the session catalog (not the parquet
    * files), so readers must go through the table name. Pick `buckets`
    * so one bucket of the LARGER table fits an executor's memory at
    * target scale; per-bucket sort makes the join a merge instead of a
    * hash build. Plan contract pinned in LayoutSpec: a join of two
    * co-bucketed tables contains no Exchange.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    key: String, sortCols: String*): Unit =
    // single implementation — delegates to Bucketing.writeBucketed so
    // the two same-named entry points in this package cannot drift
    // (same overwrite mode, parquet format, key-led sort order)
    Bucketing.writeBucketed(df, table, Seq(key), buckets,
      sortCols = key +: sortCols, format = "parquet")

  /** Z-order (Morton) key: interleave the low `bits` of two
    * non-negative dimensions so 2-D-close rows get close keys — the
    * space-filling-curve answer to [[sorted]]'s lexicographic
    * tradeoff: a predicate on EITHER dimension prunes files, not just
    * the leading one. Pure integer bit arithmetic (shift/and/add), so
    * the key is engine-exact and an external writer/reader derives the
    * identical clustering. Inputs are masked to `bits`; at the default
    * 16 bits the key fits in 32 bits of a long.
    */
  def zOrderKey(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"zOrderKey: bits must be in [1,31], got $bits")
    val mask = (1L << bits) - 1
    val am = a.cast("long").bitwiseAND(lit(mask))
    val bm = b.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      shiftright(am, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(bm, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** [[writeSorted]] clustered on the Morton key of (a, b): range
    * partitioning over the curve gives every file a compact 2-D tile,
    * so footer min/max prunes on predicates over either dimension.
    */
  def writeZOrdered(df: DataFrame, path: String, numFiles: Int,
                    a: Column, b: Column, bits: Int = 16): Unit = {
    // the Morton key only DECIDES the clustering — drop it after the
    // sort so the written schema is exactly the caller's (and a
    // pre-existing __zkey column is not silently overwritten in the
    // output files; the projection after sortWithinPartitions keeps
    // row order)
    require(!df.columns.contains("__zkey"),
      "writeZOrdered: input already has a __zkey column — rename it first")
    sorted(df.withColumn("__zkey", zOrderKey(a, b, bits)), numFiles, col("__zkey"))
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
  }
}
