package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A driver-checkable query: a Spark DataFrame program plus (when
  * SQL-expressible) an equivalent DuckDB oracle over the same parquet
  * tables. Column names/aliases MUST match between the two — the driver
  * sorts columns by name before hashing values.
  *
  * `headline = true` marks queries included in the Bench run.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

object Tables {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.LongType

  /** Load a driver-provided testdata table (TESTDATA.md).
    *
    * `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 only reads
    * with `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    * Verify/Bench sessions). Normalize it back to a microsecond
    * TimestampType here with integer division (a double division would
    * lose precision at epoch-nanos magnitude ~1.7e18).
    */
  def apply(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }
}
