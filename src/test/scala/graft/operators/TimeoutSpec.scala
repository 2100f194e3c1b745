package graft.operators

import java.util.concurrent.TimeoutException

import graft.SparkSpec

import scala.concurrent.duration._

/** O2 semantics: a hung run is cancelled at the deadline; a fast run is
  * untouched and the session stays usable afterwards. */
class TimeoutSpec extends SparkSpec {

  test("withTimeout cancels a long-running job group at the deadline") {
    val t0 = System.nanoTime()
    intercept[TimeoutException] {
      Timeout.withTimeout(spark, "tmo-hang", 2.seconds) {
        // ~9e18 filtered rows: unfinishable within the deadline
        spark.range(Long.MaxValue).filter("id % 7 = 3").count()
      }
    }
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(elapsed < 60.0, s"cancellation took ${elapsed}s")
  }

  test("withTimeout is transparent for a run that finishes in time, and " +
    "the session survives a previous cancellation") {
    val n = Timeout.withTimeout(spark, "tmo-ok", 2.minutes) {
      spark.range(10).count()
    }
    assert(n === 10L)
  }
}
