package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Consumer-tied cache release (round-2 verdict #6 / advice on Sequencer's
  * old global-mutable eviction): an operator that persists intermediates
  * for a DataFrame it RETURNS cannot unpersist them itself — the caller's
  * action hasn't run yet — and evicting on the operator's next call can
  * pull the cache out from under a previously returned, not-yet-executed
  * plan. Instead, register a one-shot QueryExecutionListener that releases
  * the entries after the NEXT completed query execution on the session:
  * in any sequential harness (Verify, Bench, tests) that is exactly the
  * consumer's action. If an unrelated query fires first the cost is a
  * recompute, never a wrong result — unpersist is purely advisory. */
object CacheHygiene {

  def releaseAfterNextAction(cached: Seq[DataFrame]): Unit = {
    if (cached.isEmpty) return
    val lm = cached.head.sparkSession.listenerManager
    lm.register(new QueryExecutionListener {
      private val released = new java.util.concurrent.atomic.AtomicBoolean(false)
      private def done(): Unit =
        if (released.compareAndSet(false, true)) {
          val self = this
          // release OFF the listener-bus thread: unpersist takes the
          // CacheManager lock and must never stall event dispatch
          new Thread(() => {
            cached.foreach(df => scala.util.Try(df.unpersist(blocking = false)))
            lm.unregister(self)
          }, "graft-cache-release").start()
        }
      override def onSuccess(name: String, qe: QueryExecution, durationNs: Long): Unit =
        done()
      override def onFailure(name: String, qe: QueryExecution, error: Exception): Unit =
        done()
    })
  }
}
