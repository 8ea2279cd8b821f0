package graft

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Per-key memoization whose lock is held only to INSTALL an entry,
  * never to run its build: the session-scoped caches (VectorOps'
  * served indexes, TextOps' trained-BPE memo) hold multi-second Spark
  * fits, and a single global `synchronized` around `getOrElseUpdate`
  * serialized every build — a concurrent query thread (or a
  * `releaseCaches()` call) blocked on an UNRELATED index's KMeans fit.
  *
  * Shape: ConcurrentHashMap installs a cheap lazy holder under its
  * per-bin lock (`computeIfAbsent`'s mapping function only constructs
  * the holder); the build itself runs under the holder's own lazy-val
  * monitor, so two callers of the SAME key still get exactly one build
  * (the second blocks on the holder, as before) while different keys
  * build fully in parallel. A build that THROWS leaves the holder's
  * lazy val uninitialized, so the next caller retries rather than
  * caching the failure.
  */
final class KeyedMemo[K, V <: AnyRef] {

  private final class Holder(build: () => V) {
    @volatile private[KeyedMemo] var built = false
    lazy val value: V = { val v = build(); built = true; v }
  }

  private val m = new ConcurrentHashMap[K, Holder]()

  def getOrBuild(k: K)(build: => V): V =
    m.computeIfAbsent(k, _ => new Holder(() => build)).value

  /** Values whose build COMPLETED — release paths iterate these to
    * close resources without forcing never-built entries (a holder
    * mid-build publishes `built` before its lazy-val monitor releases,
    * so a racing reader just blocks until the value is ready).
    */
  def builtValues: Seq[V] =
    m.values.asScala.toSeq.filter(_.built).map(_.value)

  def clear(): Unit = m.clear()
}
