package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Set-oriented replacements for the reference's row-at-a-time Postgres
  * sinks (SURVEY.md §2.1 S9/S10).
  *
  * S9 (`reference/scripts/realtime_extractor.py:191-236`): `INSERT … ON
  * CONFLICT (key) DO UPDATE SET … WHERE <a compare column changed>` —
  * update a matched row only when the prediction actually changed,
  * preserving `created_at` and restamping `updated_at`.
  *
  * S10 (`reference/scripts/historical_extractor.py:85-88`): `ON CONFLICT DO
  * NOTHING` — insert only keys not already present.
  *
  * Both are pure joins — no driver-side loops — so they scale with the
  * shuffle: the full-outer / anti join hash-partitions both sides on the
  * key. At 100 TB the target snapshot rewrite is the standard
  * parquet-without-ACID pattern (with a table format it would be a MERGE;
  * the join shape below is exactly what Delta/Iceberg execute underneath).
  */
object Upsert {

  /** Keep the newest row per key (deterministic pre-dedup for S9: the feed
    * may repeat a key across entities — SURVEY.md §7.4). `orderCol` must be
    * totally ordered per key (e.g. a monotonically increasing id). */
  def latestPerKey(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val dataCols = df.columns.filterNot(keys.contains)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(dataCols.toIndexedSeq.map(col): _*),
        col(orderCol)).as("__latest"))
      .select(keys.map(col) ++ dataCols.map(c => col(s"__latest.$c").as(c)): _*)
  }

  /** S9 — conditional merge. Matched keys take the update row only when any
    * of `compareCols` differs; `createdCol` (if present in the schema) is
    * preserved from the target for matched keys. Unmatched update keys are
    * inserted; unmatched target keys pass through.
    *
    * Requires `target` and `updates` to share a schema and each hold at most
    * one row per key (use [[latestPerKey]] first otherwise).
    */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String],
             compareCols: Seq[String],
             createdCol: Option[String] = None): DataFrame = {
    require(target.columns.sameElements(updates.columns),
      "target/updates schemas must match")
    val dataCols = target.columns.filterNot(keys.contains).toSeq
    val t = target.select(
      (keys.map(col) ++ dataCols.map(col) :+ lit(true).as("__t")): _*).as("t")
    val u = updates.select(
      (keys.map(col) ++ dataCols.map(col) :+ lit(true).as("__u")): _*).as("u")
    val cond: Column = keys.map(k => col(s"t.$k") <=> col(s"u.$k")).reduce(_ && _)
    val j = t.join(u, cond, "full_outer")
    val tPresent = col("t.__t").isNotNull
    val uPresent = col("u.__u").isNotNull
    val changed = compareCols.map(c => !(col(s"t.$c") <=> col(s"u.$c"))).reduce(_ || _)
    val takeUpdate = uPresent && (!tPresent || changed)
    val out = keys.map(k => coalesce(col(s"t.$k"), col(s"u.$k")).as(k)) ++
      dataCols.map { c =>
        if (createdCol.contains(c)) coalesce(col(s"t.$c"), col(s"u.$c")).as(c)
        else when(takeUpdate, col(s"u.$c")).otherwise(col(s"t.$c")).as(c)
      }
    j.select(out: _*)
  }

  /** Snapshot diff (CDC extract) — the read-side inverse of [[upsert]]:
    * given two versions of a table, emit one row per key whose state
    * differs, classified `added` (key only in `newDf`), `removed` (only
    * in `oldDf`) or `changed` (present in both, any of `compareCols`
    * differs null-safely). Unchanged keys — the overwhelming majority of
    * a production snapshot pair — are dropped inside the join's
    * projection, so nothing downstream ever sees them.
    *
    * Same scale shape as upsert: one full-outer sort-merge join
    * hash-partitioned on the key, both sides large (no broadcast), and
    * only `keys ++ compareCols` are shuffled — the diff of two 100 TB
    * snapshots moves two slim projections once. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    val o = oldDf.select(
      (keys.map(col) ++ compareCols.map(col) :+ lit(true).as("__o")): _*).as("o")
    val n = newDf.select(
      (keys.map(col) ++ compareCols.map(col) :+ lit(true).as("__n")): _*).as("n")
    val cond: Column = keys.map(k => col(s"o.$k") <=> col(s"n.$k")).reduce(_ && _)
    val oPresent = col("o.__o").isNotNull
    val nPresent = col("n.__n").isNotNull
    val changed = compareCols.map(c => !(col(s"o.$c") <=> col(s"n.$c"))).reduce(_ || _)
    o.join(n, cond, "full_outer")
      .withColumn("change_type",
        when(!oPresent, lit("added"))
          .when(!nPresent, lit("removed"))
          .when(changed, lit("changed")))
      .where(col("change_type").isNotNull)
      .select(keys.map(k => coalesce(col(s"o.$k"), col(s"n.$k")).as(k)) ++
        compareCols.flatMap(c => Seq(col(s"o.$c").as(s"old_$c"),
          col(s"n.$c").as(s"new_$c"))) :+ col("change_type"): _*)
  }

  /** S10 — append only rows whose key is absent from the target. */
  def insertIfAbsent(target: DataFrame, updates: DataFrame,
                     keys: Seq[String]): DataFrame = {
    val newRows = updates.join(
      target.select(keys.map(col): _*).distinct(), keys, "left_anti")
    target.unionByName(newRows)
  }
}
