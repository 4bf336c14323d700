package graft

import org.apache.spark.SparkContext
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
  *  - ONE `onApplicationEnd` listener per SparkContext (not per
  *    session): when the context ends, every entry of every session of
  *    that context is dropped and `unpin`ned. The round-7 shape hooked
  *    each SESSION with its own listener and never deregistered it, so
  *    `newSession`-per-test workloads accumulated listeners on the
  *    shared bus and the `hooked` map pinned discarded sessions
  *    unboundedly (round-7 advisory); contexts are few (almost always
  *    one per JVM), so the context-keyed map is bounded by construction
  *    and an evicted-then-reused session never registers a duplicate;
  *  - the map is additionally LRU-capped (`maxEntries`): sessions
  *    discarded while their context lives (`newSession` per test) cannot
  *    grow the map unboundedly — the eldest COMPLETED entry is unpinned
  *    and dropped (in-flight builds are never evicted: unpinning one
  *    would race its own completion). An evicted-but-still-live artifact
  *    merely recomputes on next use (all values are recomputable by
  *    contract — lazy plans or idempotent scratch materializations).
  *
  * Values are held as `FutureTask`s so `build` runs OUTSIDE the memo's
  * global lock (round-7 advisory: a slow cold build — now a parquet
  * materialization job in [[SparkEntry]] — must not block every other
  * session's access to unrelated entries). Concurrent callers of the
  * same key block on that key's task only; a failed build is removed
  * from the map so later calls retry instead of replaying the failure.
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

  private type Task = java.util.concurrent.FutureTask[V]

  // access-ordered: LRU iteration order for the cap eviction
  private val map = new java.util.LinkedHashMap[Key, Task](16, 0.75f, true)
  // identity set of contexts that already carry the end-of-context hook
  private val hooked = new java.util.IdentityHashMap[SparkContext, java.lang.Boolean]

  def get(s: SparkSession, sub: String)(build: => V): V = {
    var created: Task = null
    val task = synchronized {
      val key = new Key(s, sub)
      val cur = map.get(key)
      if (cur != null) cur
      else {
        hook(s.sparkContext)
        created = new Task(() => build)
        map.put(key, created)
        if (map.size > maxEntries) {
          val it = map.entrySet().iterator()
          while (map.size > maxEntries && it.hasNext) {
            val e = it.next()
            if (e.getValue.isDone) {
              it.remove()
              scala.util.Try(unpin(e.getValue.get())): Unit
            }
          }
        }
        created
      }
    }
    if (created != null) created.run()
    try task.get()
    catch {
      case e: java.util.concurrent.ExecutionException =>
        synchronized {
          val it = map.values().iterator()
          while (it.hasNext) if (it.next() eq task) it.remove()
        }
        throw e.getCause
    }
  }

  /** Drop + unpin every entry belonging to `s` (identity match). Public
    * to [[graft]] so specs can assert the eviction path without
    * stopping the JVM's only context.
    */
  def evictSession(s: SparkSession): Unit = synchronized {
    val it = map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.session eq s) {
        it.remove()
        if (e.getValue.isDone) scala.util.Try(unpin(e.getValue.get())): Unit
      }
    }
  }

  /** Drop + unpin every entry of every session of `sc` — the
    * end-of-context sweep.
    */
  private def evictContext(sc: SparkContext): Unit = synchronized {
    val it = map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.session.sparkContext eq sc) {
        it.remove()
        if (e.getValue.isDone) scala.util.Try(unpin(e.getValue.get())): Unit
      }
    }
    hooked.remove(sc): Unit
  }

  def size: Int = synchronized(map.size)
  def containsSession(s: SparkSession): Boolean = synchronized {
    map.keySet.stream().anyMatch(_.session eq s)
  }
  /** Number of contexts carrying the end-of-context hook (spec probe:
    * evict + reuse must not register a duplicate listener).
    */
  private[graft] def hookedCount: Int = synchronized(hooked.size)

  private def hook(sc: SparkContext): Unit =
    if (!hooked.containsKey(sc)) {
      hooked.put(sc, java.lang.Boolean.TRUE)
      sc.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
          evictContext(sc)
      })
    }
}
