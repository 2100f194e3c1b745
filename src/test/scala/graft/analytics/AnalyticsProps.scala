package graft.analytics

import graft.SparkSpec
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the event-analytics family: distributed
  * staging/retention/windowing must equal naive in-memory references on
  * random event logs (arbitrary orders, ties, sparse users). */
object AnalyticsProps extends Properties("Analytics") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.session

  private val stages = Seq("view", "click", "purchase")
  private val genEvent: Gen[(Long, String, Long)] = for {
    u <- Gen.chooseNum(1L, 5L)
    t <- Gen.oneOf(stages ++ Seq("noise"))
    ts <- Gen.chooseNum(0L, 1000L)
  } yield (u, t, ts)
  private val genLog: Gen[List[(Long, String, Long)]] =
    Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, genEvent))

  private def naiveStage(evs: Seq[(Long, String, Long)]): Map[Long, Long] =
    evs.groupBy(_._1).map { case (u, rows) =>
      val mins = stages.map(s =>
        rows.filter(_._2 == s).map(_._3).minOption)
      var k = 0
      var ok = true
      while (ok && k < stages.length) {
        // presence must gate the order check (mins(k) is None otherwise)
        if (mins(k).isDefined &&
          (k == 0 || mins(k - 1).get <= mins(k).get)) k += 1
        else ok = false
      }
      u -> k.toLong
    }

  property("Funnel.userStages equals the naive first-occurrence staging") =
    forAll(genLog) { evs =>
      import spark.implicits._
      val df = evs.toDF("user_id", "event_type", "ts")
        .select(org.apache.spark.sql.functions.col("user_id"),
          org.apache.spark.sql.functions.col("event_type"),
          org.apache.spark.sql.functions
            .timestamp_seconds(org.apache.spark.sql.functions.col("ts"))
            .as("ts"))
      val got = Funnel.userStages(df, "user_id", "event_type", "ts", stages)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == naiveStage(evs)
    }

  property("q94's offset-0 cohort-size identity: every user is active in " +
    "their cohort week, so n_active(cohort, 0) is the cohort size") =
    forAll(genLog) { evs =>
      // the identity the q94 rewrite rests on, checked directly on the
      // naive model: cohort = min week; offset 0 count = distinct users
      val weeks = evs.map { case (u, _, ts) => (u, ts / 100L) }.distinct
      val cohorts = weeks.groupBy(_._1).map { case (u, ws) =>
        u -> ws.map(_._2).min }
      // the (cohort, offset) activity rows the query aggregates...
      val exploded = weeks.map { case (u, w) => (cohorts(u), w - cohorts(u)) }
      val active0 = exploded.filter(_._2 == 0L).groupBy(_._1)
        .map { case (c, xs) => c -> xs.size }
      // ...vs the direct per-cohort distinct-user sizes
      val sizes = cohorts.groupBy(_._2).map { case (c, us) => c -> us.size }
      active0 == sizes
    }
}
