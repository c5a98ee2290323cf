package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point:
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`) makes
  * every graft kernel available as a SQL function in that session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.inject(ext)
}
