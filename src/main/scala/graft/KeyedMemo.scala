package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.locks.ReentrantReadWriteLock
import scala.jdk.CollectionConverters._

/** Per-key memoization whose lock is held only to INSTALL an entry,
  * never to serialize UNRELATED builds: the session-scoped caches
  * (VectorOps' served indexes, TextOps' trained-BPE memo) hold
  * multi-second Spark fits, and a single global `synchronized` around
  * `getOrElseUpdate` serialized every build — a concurrent query
  * thread blocked on an UNRELATED index's KMeans fit.
  *
  * Shape: ConcurrentHashMap installs a cheap lazy holder under its
  * per-bin lock (`computeIfAbsent`'s mapping function only constructs
  * the holder); the build itself runs under the holder's own lazy-val
  * monitor, so two callers of the SAME key still get exactly one build
  * (the second blocks on the holder, as before) while different keys
  * build fully in parallel. A build that THROWS leaves the holder's
  * lazy val uninitialized, so the next caller retries rather than
  * caching the failure.
  *
  * Release safety: builds additionally run under the READ side of a
  * ReentrantReadWriteLock (shared — concurrent builds still overlap),
  * and `drain()` takes the WRITE side, so a release observes no build
  * in flight. A snapshot-then-clear release (`builtValues` then
  * `clear()`) had a leak window: a build completing between the two
  * calls published a value the snapshot missed and the clear dropped —
  * for a persisted kNN graph that meant a MEMORY_AND_DISK entry with
  * no remaining release path (the round-11 advice finding). `drain()`
  * closes it: by the time the write lock is granted every in-flight
  * build has completed and is in the drained set, and a caller that
  * arrives after just rebuilds a fresh entry.
  */
final class KeyedMemo[K, V <: AnyRef] {

  private final class Holder(build: () => V) {
    @volatile private[KeyedMemo] var built = false
    lazy val value: V = { val v = build(); built = true; v }
  }

  private val m = new ConcurrentHashMap[K, Holder]()
  private val lifecycle = new ReentrantReadWriteLock()

  def getOrBuild(k: K)(build: => V): V = {
    val rl = lifecycle.readLock()
    rl.lock()
    try m.computeIfAbsent(k, _ => new Holder(() => build)).value
    finally rl.unlock()
  }

  /** Values whose build COMPLETED — non-destructive iteration (a
    * holder mid-build publishes `built` before its lazy-val monitor
    * releases, so a racing reader just blocks until the value is
    * ready). For RELEASE paths use `drain()`, which cannot miss a
    * build racing the call.
    */
  def builtValues: Seq[V] =
    m.values.asScala.toSeq.filter(_.built).map(_.value)

  def clear(): Unit = m.clear()

  /** Atomically remove every entry and return the removed values for
    * the caller to release (unpersist/close). Blocks until in-flight
    * builds complete (write side of the lifecycle lock), so no build
    * can complete into a dropped holder and leak its resource.
    */
  def drain(): Seq[V] = {
    val wl = lifecycle.writeLock()
    wl.lock()
    try {
      val removed = m.values.asScala.toSeq
      m.clear()
      removed.filter(_.built).map(_.value)
    } finally wl.unlock()
  }
}
