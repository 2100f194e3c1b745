package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** P9 — the reference's weather-API staleness throttle
  * (reference/scripts/realtime_extractor.py:39-57; persisted state in
  * last_api_call.json): the upstream weather API is rate-limited, so the
  * realtime loop calls it at most once per `minInterval` and reuses the
  * last payload in between. State (last-call instant + cached payload)
  * lives in a driver-local file exactly like the reference's JSON — it
  * must survive process restarts, because the cron topology restarts the
  * driver every minute while the throttle window is two.
  *
  * Driver-side by design: one fetch per micro-batch feeding a broadcast
  * side input (SURVEY.md §2.9) — never a per-row or per-partition call.
  */
object Throttle {

  /** Persisted throttle state: when the API was last actually called, and
    * what it returned (None = the call yielded no payload, e.g. a 503-
    * tolerated miss — cached as a miss until the window elapses). */
  final case class State(lastCallMillis: Long, payload: Option[String])

  /** File format: line 1 = epoch millis, line 2 = "1"/"0" payload-present
    * flag, remainder = payload verbatim. Written via temp + atomic move so
    * a crash mid-write never leaves a torn state file. */
  def writeState(path: Path, s: State): Unit = {
    val body = s.lastCallMillis.toString + "\n" +
      (if (s.payload.isDefined) "1" else "0") + "\n" + s.payload.getOrElse("")
    Option(path.getParent).foreach(Files.createDirectories(_))
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Read persisted state; None when absent or unparseable (an unreadable
    * state file must degrade to "call the API", never crash the stream). */
  def readState(path: Path): Option[State] =
    if (!Files.exists(path)) None
    else {
      val raw = new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
      raw.split("\n", 3) match {
        case Array(ts, flag, rest @ _*) if ts.forall(c => c.isDigit || c == '-') && ts.nonEmpty =>
          val payload = if (flag == "1") Some(rest.headOption.getOrElse("")) else None
          scala.util.Try(State(ts.toLong, payload)).toOption
        case _ => None
      }
    }

  /** Wrap `fetch` in the ≥`minIntervalMillis` rate limiter: returns a thunk
    * shaped for [[RealtimeStream.startFeedStream]]'s `weatherJson` side
    * input. Inside the window the cached payload is returned WITHOUT
    * calling `fetch`; outside it, `fetch` runs and the state file is
    * rewritten. `clock` is injectable for tests. */
  def rateLimited(statePath: String, minIntervalMillis: Long,
                  fetch: () => Option[String],
                  clock: () => Long = () => System.currentTimeMillis())
      : () => Option[String] = {
    val path = Paths.get(statePath)
    () => {
      val now = clock()
      readState(path) match {
        case Some(s) if now - s.lastCallMillis < minIntervalMillis => s.payload
        case _ =>
          val payload = fetch()
          writeState(path, State(now, payload))
          payload
      }
    }
  }
}
