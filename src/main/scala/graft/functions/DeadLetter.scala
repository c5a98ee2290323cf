package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dead-letter JSON rendering, byte-compatible with the reference's
  * `EventError.MarshalJSON` (`error.go:29-47`):
  *
  *   {"timestamp":<RFC3339>,"event":<payload>,"error":{"code":...,"message":...}}
  *
  * Built with string concat (not to_json) so the exact field order and
  * timestamp format of the Go encoder are reproduced and the same
  * expression is usable verbatim in an oracle SQL mirror.
  */
object DeadLetter {

  private def jstr(c: Column): Column =
    concat(lit("\""), regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "\"", "\\\\\""), lit("\""))

  def json(timestamp: Column, event: Column, code: Column, message: Column): Column =
    concat(
      lit("{\"timestamp\":\""),
      date_format(timestamp, "yyyy-MM-dd'T'HH:mm:ss'Z'"),
      lit("\",\"event\":"), jstr(event.cast("string")),
      lit(",\"error\":{\"code\":"), jstr(code),
      lit(",\"message\":"), jstr(message),
      lit("}}"))
}
