package graft

import org.apache.spark.sql.SparkSession

/** Session-scoped memo for build-once artifacts — bucketed ANN indexes,
  * checkpointed baselines, per-session locks. Same computeIfAbsent
  * semantics as the raw ConcurrentHashMap it replaces, keyed by
  * (session, key), with one addition: every access first drops entries
  * whose session has STOPPED, so a long-lived JVM cycling sessions does
  * not accumulate strong references to dead sessions and their
  * checkpointed frames (ADVICE r8). Entries of live sessions are kept
  * deliberately — each cached value is the local stand-in for an
  * at-rest index table and is meant to live exactly as long as its
  * session.
  */
final class SessionCache[K, V] {
  private val m = new java.util.concurrent.ConcurrentHashMap[(SparkSession, K), V]()

  def getOrBuild(s: SparkSession, k: K)(build: => V): V = {
    val it = m.keySet.iterator
    while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
    m.computeIfAbsent((s, k), _ => build)
  }
}
