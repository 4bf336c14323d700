package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Session-scoped memo for shared artifact frames (the materialized-view
  * caches in [[SparkEntry]] and the catalog-metadata cache in
  * [[Tables]]).
  *
  * Replaces the ad-hoc `ConcurrentHashMap[String, _]` maps keyed by
  * `System.identityHashCode(session) + "|" + dir`, which had two defects
  * (round-6 advisory): entries were NEVER evicted — a stopped session's
  * persisted DataFrames stayed pinned forever in multi-session processes
  * (test suites, long-lived services) — and an identityHashCode
  * collision between a dead and a live session could silently serve a
  * frame bound to a stopped session.
  *
  * Design:
  *  - keys pair the session OBJECT (reference identity — collisions are
  *    impossible) with a caller-chosen sub-key (dataset dir / scan path);
  *  - on first use per session, an `onApplicationEnd` listener is
  *    registered on that session's context; when the context ends every
  *    entry of that session is dropped and `unpin`ned (same pattern the
  *    round-6 catalog fix used);
  *  - the map is additionally LRU-capped (`maxEntries`): sessions
  *    discarded while their context lives (`newSession` per test) cannot
  *    grow the map unboundedly — the eldest entry is unpinned and
  *    dropped. An evicted-but-still-live artifact merely recomputes on
  *    next use (all values are persist-not-checkpoint plans by
  *    contract, so recompute is always safe).
  *
  * `unpin` runs under `Try`: unpersisting a frame whose session is
  * already stopped throws, and eviction must never propagate that.
  */
private[graft] final class SessionMemo[V](maxEntries: Int)(unpin: V => Unit) {

  private final class Key(val session: SparkSession, val sub: String) {
    override def hashCode: Int = System.identityHashCode(session) * 31 + sub.hashCode
    override def equals(o: Any): Boolean = o match {
      case k: Key => (k.session eq session) && k.sub == sub
      case _ => false
    }
  }

  // access-ordered: LRU iteration order for the cap eviction
  private val map = new java.util.LinkedHashMap[Key, V](16, 0.75f, true)
  // identity set of sessions that already carry the end-of-context hook
  private val hooked = new java.util.IdentityHashMap[SparkSession, java.lang.Boolean]

  def get(s: SparkSession, sub: String)(build: => V): V = synchronized {
    val key = new Key(s, sub)
    val cur = map.get(key)
    if (cur != null) cur
    else {
      hook(s)
      val v = build // plan construction only (lazy frames) — cheap under the lock
      map.put(key, v)
      while (map.size > maxEntries) {
        val it = map.entrySet().iterator()
        val eldest = it.next()
        it.remove()
        scala.util.Try(unpin(eldest.getValue)): Unit
      }
      v
    }
  }

  /** Drop + unpin every entry belonging to `s` (identity match). Called
    * by the end-of-context listener; public to [[graft]] so specs can
    * assert the eviction path without stopping the JVM's only context.
    */
  def evictSession(s: SparkSession): Unit = synchronized {
    val it = map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.session eq s) {
        it.remove()
        scala.util.Try(unpin(e.getValue)): Unit
      }
    }
    hooked.remove(s): Unit
  }

  def size: Int = synchronized(map.size)
  def containsSession(s: SparkSession): Boolean = synchronized {
    map.keySet.stream().anyMatch(_.session eq s)
  }

  private def hook(s: SparkSession): Unit =
    if (!hooked.containsKey(s)) {
      hooked.put(s, java.lang.Boolean.TRUE)
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
          evictSession(s)
      })
    }
}
