package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** Per-(session, key) memo for shared cached relations (the TS lake, the
  * LSH pair set, the PSI dimension tables, trained k-means centroids).
  *
  * Lifecycle, unlike a bare ConcurrentHashMap:
  *  - entries whose session has stopped are purged on every access — their
  *    cache blocks died with the session, so holding the key would only
  *    pin the SparkSession (and its plans) against GC in a long-lived JVM
  *    that creates many sessions (the test suite, a multi-tenant service);
  *  - `SessionMemo.clearAll()` evicts everything and runs `onEvict`
  *    (typically `unpersist`) on each value — Bench/Verify teardown hook.
  *
  * Builds run under a lock on the instance, NOT `computeIfAbsent`:
  * builders nest (programs summary -> PAT/PMT/SDT -> latest tables) and a
  * nested computeIfAbsent on one map throws "Recursive update"; a
  * reentrant monitor + double-checked get handles the nesting.
  */
final class SessionMemo[V](onEvict: V => Unit) {
  private val map = new ConcurrentHashMap[(SparkSession, String), V]()
  SessionMemo.register(this)

  def apply(s: SparkSession, key: String)(build: => V): V = {
    purgeStopped()
    val k = (s, key)
    val hit = map.get(k)
    if (hit != null) hit
    else synchronized {
      val again = map.get(k)
      if (again != null) again
      else { val v = build; map.put(k, v); v }
    }
  }

  private[graft] def clear(): Unit = {
    map.values.forEach(v => try onEvict(v) catch { case _: Throwable => () })
    map.clear()
  }

  private def purgeStopped(): Unit = {
    val it = map.entrySet().iterator()
    while (it.hasNext)
      if (it.next().getKey._1.sparkContext.isStopped) it.remove()
  }
}

/** DataFrame memo that OWNS the cache registration: builders hand back
  * a BARE plan and the memo pins it — one idiom, one owner. The
  * assertion catches the round-6 "already cached" warning class at its
  * source: a builder that caches inside a memoized build double-
  * registers the plan with the CacheManager the moment anything
  * re-derives it. */
final class CachedDfMemo {
  private val inner = SessionMemo.forDataFrames()
  def apply(s: SparkSession, key: String)(
      build: => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    inner(s, key) {
      val df = build
      require(
        df.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
        s"memo '$key': built plan is already cached — the memo is the " +
          "single cache owner; drop the inner .cache()")
      df.cache()
    }
}

object SessionMemo {
  private val all =
    new java.util.concurrent.ConcurrentLinkedQueue[SessionMemo[_]]()
  private def register(m: SessionMemo[_]): Unit = all.add(m)

  def forDataFrames(): SessionMemo[org.apache.spark.sql.DataFrame] =
    new SessionMemo[org.apache.spark.sql.DataFrame](df =>
      df.unpersist(blocking = false))

  /** Caching variant — see [[CachedDfMemo]]. */
  def forCachedDataFrames(): CachedDfMemo = new CachedDfMemo

  /** Evict every memo in the JVM (Bench/Verify teardown). */
  def clearAll(): Unit = all.forEach(_.clear())
}
