package graft.streaming

import java.nio.file.{Files, Paths}

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Model-based ScalaCheck properties for the P9 rate limiter: against any
  * sequence of call instants, the file-backed throttle must behave exactly
  * like the obvious in-memory reference model (fetch iff >= window since
  * the last fetch; cached payload otherwise). Pure JVM, no Spark. */
object ThrottleProps extends Properties("Throttle") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(40)

  private val genGaps: Gen[List[Long]] =
    Gen.chooseNum(1, 30).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 5000L)))

  property("equals the in-memory reference model for any call sequence") =
    forAll(genGaps, Gen.chooseNum(1L, 4000L)) { (gaps, window) =>
      val dir = Files.createTempDirectory("throttle-props")
      val state = dir.resolve("s").toString
      var now = 0L
      var fetches = 0
      val thunk = Throttle.rateLimited(state, window,
        () => { fetches += 1; Some(s"p$fetches") }, () => now)

      // reference model
      var lastCall = Long.MinValue
      var cached: Option[String] = None
      var modelFetches = 0

      val ok = gaps.forall { gap =>
        now += gap
        val want =
          if (lastCall == Long.MinValue || now - lastCall >= window) {
            modelFetches += 1; lastCall = now
            cached = Some(s"p$modelFetches"); cached
          } else cached
        thunk() == want
      }
      Files.deleteIfExists(Paths.get(state))
      Files.deleteIfExists(dir)
      ok && fetches == modelFetches
    }

  property("state survives arbitrary restart points in the sequence") =
    forAll(genGaps, Gen.chooseNum(1L, 4000L)) { (gaps, window) =>
      val dir = Files.createTempDirectory("throttle-props")
      val state = dir.resolve("s").toString
      var now = 0L
      var fetches = 0
      def freshThunk() = Throttle.rateLimited(state, window,
        () => { fetches += 1; Some("p") }, () => now)
      // a NEW thunk every call = restart before every call; fetch count
      // must be identical to the single-thunk run because state is on disk
      gaps.foreach { gap => now += gap; freshThunk()() }
      val restartFetches = fetches

      Files.deleteIfExists(Paths.get(state))
      fetches = 0; now = 0L
      val one = freshThunk()
      gaps.foreach { gap => now += gap; one() }
      val ok = fetches == restartFetches
      Files.deleteIfExists(Paths.get(state))
      Files.deleteIfExists(dir)
      ok
    }
}
