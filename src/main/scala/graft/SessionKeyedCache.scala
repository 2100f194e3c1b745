package graft

import org.apache.spark.sql.SparkSession

/** The ONE keyed trained-artifact cache (r10 review dedup of what had
  * grown into three hand-rolled copies in SparkEntry): weak-session
  * keying (a dead session's entries collect — an identityHashCode key
  * could be reused by a NEW session after the old one is GC'd),
  * SoftReference values (an artifact references nothing the session
  * can't rebuild, so a reclaimed entry just retrains; and a strongly
  * held DataFrame value would reference its SparkSession, i.e. the weak
  * KEY — the WeakHashMap value-refers-to-key pitfall), knob-derived
  * string keys BUILT FROM the caller's actual arguments so different
  * knobs get their own artifact, and a double-checked publish protocol:
  * `build` runs OUTSIDE the monitor (multi-job Lloyd trainings must not
  * serialize unrelated sessions or block resetCaches for their
  * duration); a benign race builds twice and the FIRST published
  * artifact wins for both callers. `onRelease` runs before reset drops
  * an entry, for artifacts that retain off-heap state (checkpoint
  * blocks). Semantics pinned in SessionKeyedCacheSpec. */
private[graft] final class SessionKeyedCache[V <: AnyRef](
    onRelease: V => Unit = (_: V) => ()) {
  private val bySession = new java.util.WeakHashMap[SparkSession,
    scala.collection.mutable.HashMap[
      String, java.lang.ref.SoftReference[V]]]()

  def getOrBuild(s: SparkSession, key: String)(build: => V): V = {
    val cached = synchronized {
      Option(bySession.get(s)).flatMap(_.get(key))
        .flatMap(r => Option(r.get))
    }
    cached.getOrElse {
      val v = build
      val (result, lost) = synchronized {
        val m = bySession.computeIfAbsent(s, _ =>
          scala.collection.mutable.HashMap.empty)
        m.get(key).flatMap(r => Option(r.get)) match {
          case Some(winner) => (winner, true)
          case None => m(key) = new java.lang.ref.SoftReference(v); (v, false)
        }
      }
      // the losing build is discarded without ever being published — run
      // its release hook (outside the monitor, like the build itself) so
      // an artifact type that retains off-heap state (checkpoint blocks,
      // the documented reason onRelease exists) is freed now rather than
      // whenever ContextCleaner catches up
      if (lost) onRelease(v)
      result
    }
  }

  def reset(): Unit = synchronized {
    bySession.values.forEach(_.values.foreach { ref =>
      val v = ref.get
      if (v != null) onRelease(v)
    })
    bySession.clear()
  }
}
