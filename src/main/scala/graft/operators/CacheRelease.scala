package graft.operators

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** The lazy-operator cache-release contract shared by the iterative
  * operators (mmrRerank, boundedShortestPaths; Dedup.armLshListener is
  * the metric-logging sibling): an operator that persists frames backing
  * its RESULT arms a one-shot listener so a long-lived session calling it
  * repeatedly accumulates no cached frames, while the result stays a
  * plain lazy DataFrame. If a second action races the release it may
  * recompute (or briefly reuse) the cache — both are correct; only the
  * first action is guaranteed the cached plan. */
private[graft] object CacheRelease {

  /** Unrelated completed actions tolerated before a listener gives up
    * waiting and releases anyway: bounds the leak when a caller builds a
    * result but never acts on it (exploratory sessions, abandoned
    * branches). A released-early cache just recomputes if the stale
    * result is used later — correct, merely slower. */
  private val MaxUnrelatedActions = 200

  /** After the first completed action whose plan contains `result`,
    * run `onAction(qe)` (e.g. read observed metrics and warn), unpersist
    * `release`, and unregister. If `MaxUnrelatedActions` other actions
    * complete first, release and unregister WITHOUT the callback — the
    * caches must not outlive an abandoned result. */
  def afterFirstAction(result: DataFrame, release: Seq[DataFrame],
      onAction: QueryExecution => Unit = _ => ()): DataFrame = {
    val spark = result.sparkSession
    val key = result.queryExecution.analyzed.canonicalized
    val listener = new QueryExecutionListener {
      private val done = new AtomicBoolean(false)
      private val unrelated = new java.util.concurrent.atomic.AtomicInteger(0)
      private def maybeRelease(qe: QueryExecution): Unit = {
        val uses = try qe.analyzed.exists(_.canonicalized == key)
          catch { case _: Throwable => false }
        val expired = !uses && unrelated.incrementAndGet() > MaxUnrelatedActions
        if ((uses || expired) && done.compareAndSet(false, true)) {
          if (uses) try onAction(qe) catch { case _: Throwable => () }
          release.foreach(_.unpersist(false))
          spark.listenerManager.unregister(this)
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = maybeRelease(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = maybeRelease(qe)
    }
    spark.listenerManager.register(listener)
    result
  }
}
