package graft.streaming

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** P9 semantics: at most one API call per window, cached payload inside
  * it, state surviving restarts (the reference's last_api_call.json). */
class ThrottleSpec extends AnyFunSuite {

  private def freshStatePath(name: String): String = {
    val dir = Paths.get("target", "test_throttle")
    Files.createDirectories(dir)
    val p = dir.resolve(name)
    Files.deleteIfExists(p)
    p.toString
  }

  test("rateLimited: one call per window, cached in between, state " +
    "persists across restarts") {
    val state = freshStatePath("s1")
    var now = 1000L
    var calls = 0
    def fetch(): Option[String] = { calls += 1; Some(s"payload$calls") }
    val thunk = Throttle.rateLimited(state, 120000L, () => fetch(), () => now)

    assert(thunk() === Some("payload1") && calls === 1) // first call fetches
    now = 61000L
    assert(thunk() === Some("payload1") && calls === 1) // inside window: cached
    // "restart": a fresh thunk over the same state file stays throttled
    val thunk2 = Throttle.rateLimited(state, 120000L, () => fetch(), () => now)
    assert(thunk2() === Some("payload1") && calls === 1)
    now = 121000L // window (measured from the last CALL) has elapsed
    assert(thunk2() === Some("payload2") && calls === 2)
  }

  test("a payload-less call (503-tolerated miss) is cached as a miss") {
    val state = freshStatePath("s2")
    var now = 0L
    var calls = 0
    val thunk = Throttle.rateLimited(state, 1000L,
      () => { calls += 1; None }, () => now)
    assert(thunk() === None && calls === 1)
    now = 500L
    assert(thunk() === None && calls === 1) // miss cached, no hammering
    now = 1000L
    assert(thunk() === None && calls === 2)
  }

  test("an unreadable state file degrades to a fetch, never a crash") {
    val state = freshStatePath("s3")
    Files.write(Paths.get(state), "not a state file".getBytes)
    var calls = 0
    val thunk = Throttle.rateLimited(state, 1000L,
      () => { calls += 1; Some("p") }, () => 5L)
    assert(thunk() === Some("p") && calls === 1)
    // and the rewritten state is valid again
    assert(Throttle.readState(Paths.get(state)) ===
      Some(Throttle.State(5L, Some("p"))))
  }
}
