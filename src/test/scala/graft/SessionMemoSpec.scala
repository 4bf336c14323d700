package graft

import org.apache.spark.storage.StorageLevel

/** [[SessionMemo]] — the eviction semantics the round-6 advisory asked
  * for: session-identity keys (no identityHashCode collisions), entries
  * dropped + unpinned when a session ends, LRU cap against
  * discarded-but-live sessions.
  *
  * The end-of-context path is exercised through `evictSession` (the
  * exact method the registered `onApplicationEnd` listener calls) —
  * stopping a real context here would kill the JVM-wide session every
  * other suite shares.
  */
class SessionMemoSpec extends SparkSpec {

  test("memoizes per (session, sub-key) and rebuilds after session eviction") {
    var builds = 0
    val memo = new SessionMemo[String](maxEntries = 8)(_ => ())
    def v = memo.get(spark, "a") { builds += 1; s"v$builds" }
    assert(v == "v1" && v == "v1" && builds == 1)
    assert(memo.get(spark, "b") { builds += 1; s"v$builds" } == "v2")
    assert(memo.size == 2 && memo.containsSession(spark))

    memo.evictSession(spark)
    assert(memo.size == 0 && !memo.containsSession(spark))
    assert(v == "v3", "an evicted entry must rebuild, not resurrect")
  }

  test("evictSession unpins the evicted values (and only that session's)") {
    val other = spark.newSession()
    var unpinned = List.empty[String]
    val memo = new SessionMemo[String](maxEntries = 8)(s => unpinned ::= s)
    memo.get(spark, "x")("mine")
    memo.get(other, "x")("theirs")
    memo.evictSession(spark)
    assert(unpinned == List("mine"))
    assert(!memo.containsSession(spark) && memo.containsSession(other))
    memo.evictSession(other)
    assert(unpinned.toSet == Set("mine", "theirs"))
  }

  test("unpin failures do not break eviction") {
    val memo = new SessionMemo[String](maxEntries = 8)(_ => sys.error("boom"))
    memo.get(spark, "x")("v")
    memo.evictSession(spark) // must not throw
    assert(memo.size == 0)
  }

  test("LRU cap evicts the least-recently-used entry with unpin") {
    var evicted = List.empty[Int]
    val memo = new SessionMemo[Int](maxEntries = 2)(v => evicted ::= v)
    memo.get(spark, "a")(1)
    memo.get(spark, "b")(2)
    memo.get(spark, "a")(99) // touch a — memoized, refreshes recency
    memo.get(spark, "c")(3)  // cap: b is now eldest
    assert(evicted == List(2))
    assert(memo.get(spark, "a")(98) == 1, "a survived the cap")
    assert(memo.get(spark, "b")(4) == 4, "b was evicted and rebuilds")
  }

  test("evict + reuse never registers a duplicate context hook") {
    val memo = new SessionMemo[String](maxEntries = 8)(_ => ())
    memo.get(spark, "a")("v")
    assert(memo.hookedCount == 1)
    memo.evictSession(spark)
    memo.get(spark, "a")("v2") // reuse after eviction
    assert(memo.hookedCount == 1,
      "the hook is per-CONTEXT: session eviction must not re-register")
    val other = spark.newSession() // same context — still one hook
    memo.get(other, "a")("v3")
    assert(memo.hookedCount == 1)
    memo.evictSession(spark); memo.evictSession(other)
  }

  test("a failed build is dropped so later calls retry") {
    var attempts = 0
    val memo = new SessionMemo[String](maxEntries = 8)(_ => ())
    val e = intercept[RuntimeException] {
      memo.get(spark, "k") { attempts += 1; sys.error("cold-read failed") }
    }
    assert(e.getMessage == "cold-read failed")
    assert(memo.get(spark, "k") { attempts += 1; "ok" } == "ok")
    assert(attempts == 2, "the poisoned entry must not be replayed")
    memo.evictSession(spark)
  }

  test("end-to-end: a persisted artifact frame is unpersisted on eviction") {
    val memo = new SessionMemo[org.apache.spark.sql.DataFrame](maxEntries = 4)(
      _.unpersist(blocking = true): Unit)
    val df = memo.get(spark, "frame") {
      val d = t("nation").select("n_nationkey")
      d.persist(StorageLevel.MEMORY_AND_DISK)
      d.count() // materialize the blocks
      d
    }
    assert(df.storageLevel != StorageLevel.NONE)
    memo.evictSession(spark)
    assert(df.storageLevel == StorageLevel.NONE,
      "eviction must release the pinned blocks")
  }
}
