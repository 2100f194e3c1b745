package graft.operators

import java.util.concurrent.TimeoutException
import java.util.{Timer, TimerTask}

import org.apache.spark.sql.SparkSession

import scala.concurrent.duration.Duration

/** O2 — the reference's run timeout (reference/scripts/
  * realtime_extractor.py:134-143, diff_times.py:11-21): a cron-launched
  * extract that hangs must be killed before the next cron tick piles a
  * second run on top. Spark's unit of cancellation is the job group:
  * tag everything the body launches with one group id, arm a watchdog,
  * and `cancelJobGroup` on expiry — running stages abort (tasks are
  * interrupted), and the body surfaces a [[TimeoutException]].
  *
  * Wrap whole pipeline entry points (one E1/E3 run per call), not
  * individual micro-batch bodies — matching the reference, which times
  * out the process, not a query.
  */
object Timeout {

  private val timer = new Timer("graft-timeout-watchdog", true)

  /** Run `body` with everything it launches in job group `jobGroup`,
    * cancelling the group (and throwing [[TimeoutException]]) if it is
    * still running after `timeout`. The group tag is thread-local, so
    * `body` must launch its Spark jobs from the calling thread (the
    * normal driver-program shape).
    *
    * The watchdog keeps re-cancelling after expiry (every second) rather
    * than firing once: `cancelJobGroup` only aborts jobs active AT the
    * call, and an expired body may still be between jobs — or about to
    * submit its first one. */
  def withTimeout[T](spark: SparkSession, jobGroup: String, timeout: Duration)
                    (body: => T): T = {
    val sc = spark.sparkContext
    @volatile var expired = false
    val task = new TimerTask {
      // a throwing TimerTask would kill the SHARED Timer thread and break
      // every later withTimeout in the JVM (e.g. cancelJobGroup racing a
      // stopping SparkContext) — swallow; the cancel retries in 1s anyway
      override def run(): Unit =
        try { expired = true; sc.cancelJobGroup(jobGroup) }
        catch { case _: Throwable => () }
    }
    sc.setJobGroup(jobGroup, s"graft run (timeout $timeout)",
      interruptOnCancel = true)
    timer.scheduleAtFixedRate(task, timeout.toMillis, 1000L)
    val result =
      try body
      catch {
        case e: Throwable if expired =>
          throw new TimeoutException(
            s"job group '$jobGroup' exceeded $timeout and was cancelled: " +
              e.getMessage)
      } finally {
        task.cancel()
        sc.clearJobGroup()
      }
    // A body that slips past the deadline between Spark jobs (driver-side
    // work survives cancelJobGroup) still violates the contract — enforce
    // it like the reference's SIGALRM, which kills regardless of progress.
    if (expired) throw new TimeoutException(
      s"job group '$jobGroup' exceeded $timeout (completed past deadline)")
    result
  }
}
