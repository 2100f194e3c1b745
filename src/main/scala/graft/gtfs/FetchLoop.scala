package graft.gtfs

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** The reference's cron topology as the last piece of glue
  * (reference/README.md:172-178: a crontab entry runs the realtime
  * extractor every minute): on each cycle, fetch the feed (S1, 503-
  * tolerant [[Rt.fetch]]) and drop the raw payload into the directory
  * [[graft.streaming.RealtimeStream.startFeedStream]] watches. The fetch
  * loop and the stream are deliberately decoupled through the drop
  * directory — either side can restart without losing the other's
  * progress, exactly like cron + database in the reference.
  *
  * Payloads are written via temp file + atomic move, so the binaryFile
  * stream source never observes a half-written feed. Driver-side by
  * design: one small HTTP fetch per minute is ingestion-edge work, not a
  * distributed job.
  */
object FetchLoop {

  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** One cycle: fetch `url`; on payload, land it as
    * `feed_<stamp>_<seq>.pb` in `dropDir` (atomic). The process-unique
    * sequence number makes equal stamps (clock skew, sub-ms cycles) land
    * as DISTINCT files: the file stream source tracks seen paths in its
    * checkpoint, so overwriting an already-ingested name would silently
    * drop the new payload. None when the fetch was 503-skipped — "try
    * again next minute" (realtime_extractor.py:155-170). */
  def fetchOnce(url: String, dropDir: String, stamp: Long): Option[Path] =
    Rt.fetch(url).map { bytes =>
      val dir = Paths.get(dropDir)
      Files.createDirectories(dir)
      val name = s"feed_${stamp}_${seq.incrementAndGet()}"
      val tmp = dir.resolve(s".$name.tmp")
      val out = dir.resolve(s"$name.pb")
      Files.write(tmp, bytes)
      Files.move(tmp, out, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      out
    }

  /** Run `cycles` fetch cycles spaced `intervalMillis` apart (the cron
    * cadence). `clock`/`sleep` are injectable for tests; the default pair
    * is wall time. Returns the landed paths (503 cycles land nothing). */
  def run(url: String, dropDir: String, cycles: Int, intervalMillis: Long,
          clock: () => Long = () => System.currentTimeMillis(),
          sleep: Long => Unit = Thread.sleep): Seq[Path] =
    (0 until cycles).flatMap { i =>
      if (i > 0) sleep(intervalMillis)
      fetchOnce(url, dropDir, clock())
    }
}
