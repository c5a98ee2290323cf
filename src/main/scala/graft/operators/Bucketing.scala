package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers for co-located joins.
  *
  * At 100 TB the dominant cost of a repeated fact-fact join is the
  * shuffle of the big side on every query. Writing a table bucketed on
  * its join key makes the partitioning part of the table's on-disk
  * contract: two tables bucketed on the same key with the same bucket
  * count hash-join WITHOUT any Exchange (asserted in BucketingSpec),
  * and a groupBy on the bucket key skips its shuffle too.
  *
  * Bucket-count guidance at scale: target ≤ ~128 MB per bucket file per
  * final write task; bucket count must match on both sides of a
  * co-located join (Spark 4 can coalesce mismatched counts when one is
  * a multiple of the other — `spark.sql.bucketing.coalesceBucketedScan`).
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets so
    * merge-join-style access patterns read sequentially).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      buckets: Int,
      sortCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite,
      format: String = "parquet"): Unit = {
    require(bucketCols.nonEmpty, "writeBucketed: bucketCols must be non-empty")
    require(buckets > 0, s"writeBucketed: buckets must be positive, got $buckets")
    val w = df.write.mode(mode).format(format)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val sorted = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
