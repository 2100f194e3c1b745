package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of (temporal) join: for each left row, attach the single right row
  * with the greatest right time <= left time (backward, the default) or
  * the smallest right time >= left time (forward), per join key. The
  * classic "latest quote at-or-before each trade" operator that plain
  * equi-joins cannot express and naive range joins explode on.
  *
  * Shape (the 100 TB contract): NOT a range join — a range condition
  * `l.t >= r.t` inside a join degenerates to per-key cartesian work and
  * the planner's only safe physical choice there is a nested loop.
  * Instead the two sides are UNIONED, tagged, and swept with ONE window
  * pass: partition by key, order by (time, side), carry the nearest
  * right row across left rows. One shuffle on the join keys, linear
  * per-partition state (the current right row), no replication of
  * either side. A hot key serializes within its partition — the same
  * bound as any per-key ordered operator (cf. [[Sessionize]]); salt the
  * key upstream if a single key's timeline exceeds one task.
  *
  * The matched right row rides as ONE struct through
  * `last(..., ignoreNulls)` — the struct is non-null on every right row,
  * so rows whose individual payload columns are NULL still match
  * atomically (a per-column fill would silently substitute older
  * values for them).
  *
  * Tie rule: a right row AT the left row's exact time matches (at-or-
  * before / at-or-after), enforced by the side component of the sort.
  * Right rows must be unique per (key, time) for deterministic output —
  * pre-aggregate the right side (e.g. max payload per key+time) if not.
  */
object AsOfJoin {

  /** Columns appended to `left`: every non-key, non-time column of
    * `right`, plus `matchedTimeCol` = the matched right row's time (NULL
    * when no right row qualifies — left rows are always kept). */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           matchedTimeCol: String = "matched_time",
           forward: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "asOf requires at least one join key")
    val rvCols = right.columns.toSeq
      .filterNot(c => keys.contains(c) || c == rightTime)
    val lvCols = left.columns.toSeq
      .filterNot(c => keys.contains(c) || c == leftTime)
    require(rvCols.toSet.intersect(lvCols.toSet).isEmpty,
      s"overlapping non-key columns: ${rvCols.toSet.intersect(lvCols.toSet)}")
    val rSchema = right.schema
    val lSchema = left.schema
    val rStructType = StructType(
      StructField("__rt", rSchema(rightTime).dataType) +:
        rvCols.map(c => StructField(c, rSchema(c).dataType)))
    // at equal time the RIGHT row must be visible to the left row: sort
    // rights before lefts for backward (last() carries it forward), and
    // rights after lefts for forward (first() over the following frame
    // still sees them)
    val (rSide, lSide) = if (forward) (1, 0) else (0, 1)
    // NULL-time RIGHT rows can never legitimately match — and unfiltered
    // they would sort NULLS FIRST and become the backward fill for lefts
    // with no true match. NULL-time LEFT rows are kept (left rows always
    // survive) but must see no right row: backward sorts them NULLS
    // FIRST (nothing precedes them), forward sorts them NULLS LAST
    // (only other null-time rows follow).
    val rTagged = right.where(col(rightTime).isNotNull).select(
      keys.map(col) ++ Seq(col(rightTime).as("__t"), lit(rSide).as("__side"),
        struct(col(rightTime).as("__rt") +: rvCols.map(col): _*).as("__r")) ++
        lvCols.map(c => lit(null).cast(lSchema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      keys.map(col) ++ Seq(col(leftTime).as("__t"), lit(lSide).as("__side"),
        lit(null).cast(rStructType).as("__r")) ++ lvCols.map(col): _*)
    val tOrder =
      if (forward) col("__t").asc_nulls_last else col("__t").asc_nulls_first
    val w0 = Window.partitionBy(keys.map(col): _*)
      .orderBy(tOrder, col("__side").asc)
    val fill =
      if (forward) first(col("__r"), ignoreNulls = true)
        .over(w0.rowsBetween(Window.currentRow, Window.unboundedFollowing))
      else last(col("__r"), ignoreNulls = true)
        .over(w0.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    rTagged.unionByName(lTagged)
      .withColumn("__r", fill)
      .where(col("__side") === lSide)
      // getField extracts by LITERAL field name (a parsed col("__r.x")
      // would mangle payload names containing dots)
      .select(keys.map(col) ++ Seq(col("__t").as(leftTime)) ++
        lvCols.map(col) ++ rvCols.map(c => col("__r").getField(c).as(c)) :+
        col("__r").getField("__rt").as(matchedTimeCol): _*)
  }
}
