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
private[operators] object CacheRelease {

  /** After the first completed action whose plan contains `result`,
    * unpersist `release` and unregister. */
  def afterFirstAction(result: DataFrame, release: Seq[DataFrame]): DataFrame = {
    val spark = result.sparkSession
    val key = result.queryExecution.analyzed.canonicalized
    val listener = new QueryExecutionListener {
      private val done = new AtomicBoolean(false)
      private def maybeRelease(qe: QueryExecution): Unit = {
        val uses = try qe.analyzed.exists(_.canonicalized == key)
          catch { case _: Throwable => false }
        if (uses && done.compareAndSet(false, true)) {
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
