package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Epoch arithmetic tolerant of every `ts` encoding the driver's testdata
  * has shipped: parquet TIMESTAMP(MICROS, adjustedToUTC=true) → Spark
  * `TIMESTAMP`, TIMESTAMP(MICROS, adjustedToUTC=false) → `TIMESTAMP_NTZ`,
  * and TIMESTAMP(NANOS) → `LONG` (under `legacy.parquet.nanosAsLong`,
  * normalized to TIMESTAMP by `queries.Tables` before reaching here).
  *
  * `TIMESTAMP_NTZ.cast("long")` / `unix_micros(ntz)` are analysis errors
  * in Spark 4 (DATATYPE_MISMATCH) — the round-7 breakage. The fix is one
  * leading `cast(TimestampType)`: a no-op on TIMESTAMP, the
  * session-timezone reinterpretation on NTZ (every graft entry point pins
  * `spark.sql.session.timeZone=UTC`, so the instant is unchanged), and
  * the seconds→timestamp→seconds identity on an epoch-seconds long.
  */
object EpochTime {

  /** Floor epoch seconds from TIMESTAMP / TIMESTAMP_NTZ / epoch-seconds long. */
  def epochSeconds(c: Column): Column = c.cast(TimestampType).cast(LongType)

  /** Truncated epoch milliseconds from TIMESTAMP / TIMESTAMP_NTZ. */
  def epochMillis(c: Column): Column = unix_millis(c.cast(TimestampType))
}
