package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered conversion funnels over an event log: a user is at stage k iff
  * the FIRST occurrences of the first k stage events exist in temporal
  * order (a purchase recorded before its click does not convert). One
  * hash aggregate with conditional mins per stage, never a per-stage
  * self-join — the funnel over 10^12 events is exactly one shuffle on
  * the user key. Shared by the registered q93 query and its spec, so the
  * staging rule cannot drift between them. */
object Funnel {

  /** Per-user funnel positions: (userCol, stage ∈ [0, stages.length]).
    * `stages` lists the ordered event types; epochs are integer seconds
    * end-to-end. */
  def userStages(ev: DataFrame, userCol: String, typeCol: String,
                 tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "stages must be non-empty")
    require(stages.distinct == stages, "stages must be distinct")
    val mins = stages.zipWithIndex.map { case (t, i) =>
      min(when(col(typeCol) === t, unix_timestamp(col(tsCol)))).as(s"__t$i")
    }
    val perUser = ev.groupBy(col(userCol)).agg(mins.head, mins.tail: _*)
    // deepest-first when-chain: stage k needs the first k mins present AND
    // ascending; the first matching (deepest) branch wins
    def prefixOk(k: Int) = {
      val present = (0 until k).map(i => col(s"__t$i").isNotNull)
        .reduce(_ && _)
      val ordered = (0 until k - 1).map(i =>
          col(s"__t$i") <= col(s"__t${i + 1}"))
        .reduceOption(_ && _).getOrElse(lit(true))
      present && ordered
    }
    // ascending fold so the DEEPEST stage ends up outermost: the final
    // expression tries stage n first, then n-1, ..., else 0
    val stage = (1 to stages.length).foldLeft(lit(0L)) { (acc, k) =>
      when(prefixOk(k), lit(k.toLong)).otherwise(acc)
    }
    perUser.select(col(userCol), stage.as("stage"))
  }
}
