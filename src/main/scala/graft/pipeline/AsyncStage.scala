package graft.pipeline

import java.util.concurrent.Executors

import scala.collection.mutable
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, StringType}

/** Per-row ASYNC node — the one reference shape the declarative
  * [[Stage]] fields can't express (`node/node.go:36-39`,
  * `docs/async-nodes.md:25-31`): each event fires an RPC-style call
  * whose outcome is only known when the callback runs, with
  *
  *   - `ReturnEvent(transformed)` → the event continues to children,
  *   - `ReturnError(err)`         → the event dead-letters to the
  *                                  node's error_handler,
  *   - `ReturnFiltered()`         → the event drops, counted filtered.
  *
  * Spark mapping: a `mapPartitions` pass with a BOUNDED in-flight
  * future pool (`maxInFlight` per partition — the analog of the
  * reference's per-node worker goroutines + channel buffer; total
  * cluster concurrency is partitions × maxInFlight, raised per node
  * via the `workers` partition floor in [[Pipeline]].buildNode). The
  * call runs as [[Stage.pre]], BEFORE failWhen/keepWhen, attaching
  * outcome columns the ordinary declarative routing then splits on —
  * so an async node error-routes through [[ErrorRouting]] exactly like
  * every SyncNode, and the dead-letter envelope wraps the ORIGINAL
  * payload (`node/node.go:277-295` semantics).
  *
  * Results are emitted in INPUT order regardless of completion order
  * (the reference emits in completion order; deterministic order is a
  * strict strengthening, and what makes the operator oracle-able). A
  * throwing call maps to `ERR_ASYNC_PANIC` rather than killing the
  * task — the recovery the reference's own TODO asks for
  * (`node/node.go:41-44`).
  */
object AsyncStage {

  /** The three async callbacks (`docs/async-nodes.md:25-31`). */
  sealed trait Outcome extends Serializable
  final case class Returned(payload: String) extends Outcome
  final case class Errored(code: String, msg: String) extends Outcome
  case object Filtered extends Outcome

  /** Run `f` over `it` with at most `maxInFlight` calls outstanding,
    * yielding results in input order. Pull-driven: a result is awaited
    * only when the consumer asks, and each await refills the window —
    * so the pipeline stays `maxInFlight` deep for the whole partition.
    */
  def boundedMap[A, B](it: Iterator[A], maxInFlight: Int)(f: A => B)(
      implicit ec: ExecutionContext): Iterator[B] =
    boundedMapWithTimeout(it, maxInFlight, 0L)(f,
      a => throw new java.util.concurrent.TimeoutException(s"unreachable for $a"))

  /** [[boundedMap]] plus a per-call deadline — the timeout the
    * reference's own future-work note asks firebolt to enforce
    * (`node/node.go:45-46`): a call that exceeds `timeoutMs` resolves
    * to `onTimeout(input)` and its in-flight slot is released so the
    * window keeps moving (the abandoned call's thread finishes or is
    * interrupted at task completion — the "replace the worker"
    * semantics of the reference's note, which is why the pool backing
    * `ec` should grow on demand rather than be hard-capped).
    * `timeoutMs <= 0` disables the deadline. The deadline runs from
    * SUBMISSION, not from the (possibly later) await; a call whose
    * result is already available when its deadline is checked is
    * delivered rather than discarded — timeouts exist to unblock the
    * window, not to throw away finished work.
    */
  def boundedMapWithTimeout[A, B](it: Iterator[A], maxInFlight: Int, timeoutMs: Long)(
      f: A => B, onTimeout: A => B)(implicit ec: ExecutionContext): Iterator[B] = {
    require(maxInFlight > 0, s"maxInFlight must be positive, got $maxInFlight")
    new Iterator[B] {
      // each entry carries its SUBMISSION time: the deadline is per
      // call, not per await — measuring from dequeue would credit
      // queue-wait time (a 250 ms call behind a 190 ms one would pass
      // a 200 ms deadline), and a partition of hung calls would pay
      // rows×timeout serially instead of ~one timeout per window
      private val inFlight = mutable.Queue.empty[(A, Future[B], Long)]
      private def fill(): Unit =
        while (inFlight.size < maxInFlight && it.hasNext) {
          val a = it.next()
          inFlight.enqueue((a, Future(f(a)), System.nanoTime()))
        }
      fill()
      override def hasNext: Boolean = inFlight.nonEmpty
      override def next(): B = {
        val (a, fut, submitted) = inFlight.dequeue()
        val b =
          if (timeoutMs <= 0L) Await.result(fut, Duration.Inf)
          else {
            val remainNs = submitted + timeoutMs * 1000000L - System.nanoTime()
            // deadline already passed while queued: a completed future
            // still counts (the call finished in time — only the await
            // was late); an incomplete one is timed out immediately
            if (remainNs <= 0L) {
              if (fut.isCompleted) Await.result(fut, Duration.Zero) else onTimeout(a)
            } else
              try Await.result(fut, Duration.fromNanos(remainNs))
              catch { case _: java.util.concurrent.TimeoutException => onTimeout(a) }
          }
        fill()
        b
      }
    }
  }

  private val ResultCol = "__async_result"
  private val CodeCol = "__async_code"
  private val MsgCol = "__async_msg"
  private val FilteredCol = "__async_filtered"

  /** Build the [[Stage]] for an async call: `rpc` maps the string
    * payload to its [[Outcome]] on a bounded pool; routing happens
    * declaratively on the attached outcome columns. `timeoutMs > 0`
    * dead-letters calls that exceed the deadline as
    * `ERR_ASYNC_TIMEOUT` (the reference's own future-work ask,
    * `node/node.go:45-46`) instead of stalling the stage on one hung
    * endpoint.
    */
  def stage(rpc: String => Outcome, maxInFlight: Int, timeoutMs: Long = 0L): Stage = Stage(
    pre = Some(df => callPartitions(df, rpc, maxInFlight, timeoutMs)),
    failWhen = Some(FailSpec(
      cond = col(CodeCol).isNotNull,
      code = col(CodeCol),
      msg = col(MsgCol))),
    keepWhen = Some(!col(FilteredCol)),
    project = df => df.select(
      col(ResultCol).as("payload"), col("created"), col("recovery")))

  private def callPartitions(
      df: DataFrame, rpc: String => Outcome, maxInFlight: Int,
      timeoutMs: Long = 0L): DataFrame = {
    val inSchema = df.schema
    val payloadIdx = inSchema.fieldIndex("payload")
    val outSchema = inSchema
      .add(ResultCol, StringType).add(CodeCol, StringType)
      .add(MsgCol, StringType).add(FilteredCol, BooleanType, nullable = false)
    df.mapPartitions { it =>
      // dedicated pool per partition: the call is allowed to BLOCK
      // (that is the point of an async node) — a shared/global EC would
      // let one slow node starve unrelated tasks' futures. Cached (not
      // hard-capped at maxInFlight): live concurrency is bounded by the
      // in-flight window anyway, and after a TIMEOUT the abandoned
      // call's thread must not eat a fixed slot — a new worker replaces
      // it (node/node.go:45-46), the stuck one dies with the task
      // (shutdownNow interrupts at completion).
      val pool = Executors.newCachedThreadPool()
      Option(TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      def rowOf(row: Row, out: Outcome): Row = {
        val extras = out match {
          case Returned(p)      => Seq(p, null, null, false)
          case Errored(c, m)    => Seq(null, c, m, false)
          case Filtered         => Seq(null, null, null, true)
        }
        Row.fromSeq(row.toSeq ++ extras)
      }
      boundedMapWithTimeout(it, maxInFlight, timeoutMs)(
        row => {
          val payload = Option(row.get(payloadIdx)).map(_.toString).orNull
          val out =
            try rpc(payload)
            catch { case t: Throwable => Errored("ERR_ASYNC_PANIC", String.valueOf(t.getMessage)) }
          rowOf(row, out)
        },
        row => rowOf(row,
          Errored("ERR_ASYNC_TIMEOUT", s"async call exceeded $timeoutMs ms")))
    }(Encoders.row(outSchema))
  }
}
