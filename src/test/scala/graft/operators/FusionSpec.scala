package graft.operators

import graft.SparkSpec

/** RRF semantics: hand-computed fusion scores, one-list-only membership,
  * tie-breaks, and the k cut. */
class FusionSpec extends SparkSpec {

  private def ranked(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("id", "rank")
  }

  test("fused score is 1/(60+ra) + 1/(60+rb), missing sides contribute 0") {
    val a = ranked(1L -> 1L, 2L -> 2L, 3L -> 3L)
    val b = ranked(2L -> 1L, 4L -> 2L)
    val got = Fusion.rrf(a, b, "id", k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(math.abs(got(2L) - (1.0 / 62 + 1.0 / 61)) < 1e-15)
    assert(math.abs(got(1L) - 1.0 / 61) < 1e-15)
    assert(math.abs(got(3L) - 1.0 / 63) < 1e-15)
    assert(math.abs(got(4L) - 1.0 / 62) < 1e-15)
    // both-lists beats either single list here
    val order = Fusion.rrf(a, b, "id", k = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(order.head === 2L)
  }

  test("equal scores tie-break by ascending id; k cuts after ordering") {
    // ids 10 and 20 both appear only once at the same rank → equal rrf
    val a = ranked(20L -> 1L)
    val b = ranked(10L -> 1L)
    val order = Fusion.rrf(a, b, "id", k = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(order === Seq(10L, 20L))
    val cut = Fusion.rrf(a, b, "id", k = 1).collect()
    assert(cut.length === 1 && cut.head.getLong(0) === 10L)
  }

  test("rank columns surface the per-list provenance (null = absent)") {
    val a = ranked(1L -> 1L)
    val b = ranked(2L -> 1L)
    val rows = Fusion.rrf(a, b, "id", k = 10).collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)).isDefined, Option(r.get(2)).isDefined)).toMap
    assert(rows === Map(1L -> (true, false), 2L -> (false, true)))
  }
}
