package graft

import org.scalatest.funsuite.AnyFunSuite

/** S6 sink configuration — the spec-verifiable surface of the JDBC write
  * path (no database or driver exists in the sandbox, so the option map
  * and the staging-merge SQL are what can and must be pinned; the
  * `df.write.jdbc` plumbing itself is Spark's). */
class JdbcSinkSpec extends AnyFunSuite {

  test("jdbcWriteOptions: batch sizing, truncate-overwrite, isolation, " +
    "and caller props (which may override defaults)") {
    val opts = Tables.jdbcWriteOptions("jdbc:postgresql://db/transit",
      "trip_updates", batchSize = 5000, truncate = true,
      props = Map("user" -> "loader", "isolationLevel" -> "NONE"))
    assert(opts("url") === "jdbc:postgresql://db/transit")
    assert(opts("dbtable") === "trip_updates")
    assert(opts("batchsize") === "5000")
    assert(opts("truncate") === "true")
    assert(opts("user") === "loader")
    // caller props win: NONE = fastest bulk-load mode when the staging
    // table is private to the batch
    assert(opts("isolationLevel") === "NONE")
  }

  test("stagingMergeSql mirrors Upsert.upsert: insert new keys, update " +
    "only on a NULL-safe value change") {
    val sql = Tables.stagingMergeSql("trip_updates", "trip_updates_stage",
      keyCols = Seq("trip_id", "stop_sequence"),
      valueCols = Seq("arrival_delay", "departure_delay"))
    assert(sql ===
      """INSERT INTO "trip_updates" ("trip_id", "stop_sequence", "arrival_delay", "departure_delay")
        |SELECT "trip_id", "stop_sequence", "arrival_delay", "departure_delay" FROM "trip_updates_stage"
        |ON CONFLICT ("trip_id", "stop_sequence") DO UPDATE SET "arrival_delay" = EXCLUDED."arrival_delay", "departure_delay" = EXCLUDED."departure_delay"
        |WHERE "trip_updates"."arrival_delay" IS DISTINCT FROM EXCLUDED."arrival_delay" OR "trip_updates"."departure_delay" IS DISTINCT FROM EXCLUDED."departure_delay"""".stripMargin)
  }

  test("stagingMergeSql quotes hostile and schema-qualified identifiers") {
    val sql = Tables.stagingMergeSql("analytics.Trip\"Updates", "stage",
      keyCols = Seq("user"), valueCols = Seq("order"))
    // schema.table quotes each part; embedded quote doubles; reserved
    // words (user, order) are safe inside quotes
    assert(sql.startsWith("INSERT INTO \"analytics\".\"Trip\"\"Updates\" (\"user\", \"order\")"))
    assert(sql.contains("ON CONFLICT (\"user\") DO UPDATE SET \"order\" = EXCLUDED.\"order\""))
  }

  test("stagingMergeSql rejects empty key or value column lists") {
    intercept[IllegalArgumentException] {
      Tables.stagingMergeSql("t", "s", Nil, Seq("v"))
    }
    intercept[IllegalArgumentException] {
      Tables.stagingMergeSql("t", "s", Seq("k"), Nil)
    }
  }
}
