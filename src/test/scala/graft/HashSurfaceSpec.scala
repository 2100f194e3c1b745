package graft

import org.apache.spark.sql.types._

/** The hashed-surface float lint (round-9 VERDICT item 3).
  *
  * The driver's correctness gate hashes every output cell; a DOUBLE on
  * that surface survives only if BOTH engines produce the identical
  * bits on EVERY DuckDB version — which holds exactly when the double
  * is (a) a raw passthrough of source data, or (b) the end of the
  * one-mirrored-divide discipline over integers that stay below 2^53
  * at gate scale (BIGINT→DOUBLE is value-exact there; +, *, /, sqrt
  * are IEEE-correctly-rounded in both engines, so op-for-op mirrored
  * chains are bit-stable). What is NOT version-stable is casting an
  * int128 (DuckDB HUGEINT, Spark DECIMAL(38,0)) beyond 2^53 to
  * double: DuckDB's int128→double conversion has changed rounding
  * across releases. That exact path produced the only two red rows of
  * CORRECTNESS_r08 (q158's rendered cos; q149's float-cosine
  * assignment) — both now de-floated.
  *
  * This spec freezes the double-typed hashed surface: every
  * double/float column (recursively, through arrays and structs) of
  * every registered query must be REGISTERED here, and every
  * registration must still exist. Adding a query with a new double
  * output forces the author through this file — and through the
  * question "is this double derived only from <2^53 integers and
  * mirrored op-for-op, or should the hashed surface carry the exact
  * integers instead?" (the q158 resolution). Every entry below was
  * hash-verified green against the DuckDB oracle when registered.
  */
class HashSurfaceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** query → double-typed output columns ("col", "col.field" inside a
    * struct, "col[]" for an array of doubles). */
  private val mirroredDoubles: Map[String, Set[String]] = Map(
    "q01_diff_mart" -> Set("arrival_time_diff_in_minutes", "departure_time_diff_in_minutes", "average_diff_in_minutes", "temperature"),
    "q02_star_join" -> Set("revenue", "sum_qty"),
    "q03_avg_delay_by_hour" -> Set("avg_delay_min"),
    "q04_avg_delay_sliced" -> Set("avg_delay_min"),
    "q07_delay_rollup" -> Set("avg_delay_min"),
    "q08_upsert" -> Set("value"),
    "q09_insert_if_absent" -> Set("value"),
    "q102_containment" -> Set("contain_a", "contain_b"),
    "q104_merge_aggregates" -> Set("avg_delay"),
    "q106_share_of_day" -> Set("trip_abs_delay", "share"),
    "q109_delay_ntile" -> Set("delay_min"),
    "q10_latest_per_key" -> Set("value"),
    "q112_partitioned_merge" -> Set("value"),
    "q113_top_quality_per_lang" -> Set("quality_score"),
    "q114_token_rarity" -> Set("mean_df_ratio"),
    "q119_corrupt_tolerance" -> Set("avg_value"),
    "q120_topk_aggregate" -> Set("quality_score"),
    "q123_snapshot_diff" -> Set("old_o_totalprice", "new_o_totalprice"),
    "q125_pmi_cooccur" -> Set("lift"),
    "q126_pareto_frontier" -> Set("o_totalprice"),
    "q127_token_concentration" -> Set("hhi"),
    "q12_weather_bucket" -> Set("avg_value"),
    "q130_prefix_jaccard" -> Set("jaccard"),
    "q131_vocab_coverage" -> Set("cum_share"),
    "q132_contamination_score" -> Set("contamination"),
    // n_hits / n_windows — both <2^53 integers, one mirrored divide
    // (the q132 discipline at char grain)
    "q243_char_contamination" -> Set("contamination"),
    "q133_delay_gini" -> Set("total_abs_delay", "gini"),
    "q134_stop_pagerank" -> Set("pagerank"),
    "q135_jl_topk" -> Set("cosine"),
    "q137_dup_spans" -> Set("dup_share"),
    // n_dup / n_shingles — both <2^53 integers, one mirrored divide
    // (the q137 discipline at char grain)
    "q237_char_dup_spans" -> Set("dup_share"),
    "q139_gap_fill" -> Set("day_value"),
    "q13_json_extract" -> Set("avg_value"),
    "q140_interpolate" -> Set("value_filled"),
    "q141_sq8_ann" -> Set("cosine"),
    "q144_chi2_terms" -> Set("chi2"),
    "q145_mad_outliers" -> Set("med", "mad"),
    "q147_winsorize" -> Set("lo", "hi", "sum_winsorized"),
    "q14_window_latest" -> Set("value"),
    "q152_chi2_drift" -> Set("e_a", "e_b", "chi2"),
    "q153_moving_avg" -> Set("ma"),
    "q157_target_encode" -> Set("loo_mean_chars"),
    "q159_key_skew" -> Set("med_per_key", "max_share", "skew_factor"),
    "q160_corr_matrix" -> Set("corr"),
    "q161_ewma" -> Set("ewma"),
    // q249: identical per-row recursion (one add + one exact halving per
    // step) folded in the same order in both engines — q161's dyadic
    // discipline carried through streaming state
    "q249_tws_ewma_replay" -> Set("ewma"),
    // q251: untouched per-row passthrough of the parquet double (the
    // q112 pattern — no arithmetic, no aggregation order)
    "q251_stream_dedup_replay" -> Set("value"),
    // q252: exact-decimal accumulation then one divide — the
    // exactAvg/exactAvgSql mirrored pair every dashboard row uses
    "q252_stream_window_agg_replay" -> Set("avg_value"),
    // q258: q249's recursion verbatim, reassembled across a checkpoint
    // restart — same dyadic per-row arithmetic, same fold order
    "q258_tws_restart_replay" -> Set("ewma"),
    // q259: q252's exactAvg downstream of the dedup chain — the
    // duplicates are dropped before any accumulation on both sides
    "q259_chained_stateful_replay" -> Set("avg_value"),
    "q162_lm_fluency" -> Set("fluency"),
    "q163_weighted_median" -> Set("weighted_median_price"),
    "q166_cohens_kappa" -> Set("kappa"),
    "q16_minhash_pairs" -> Set("est_jaccard"),
    "q170_rolling_median" -> Set("med"),
    "q171_auc" -> Set("auc"),
    "q172_benford" -> Set("share", "expected", "chi2_term"),
    "q173_jaro_winkler" -> Set("jw"),
    "q174_ols_group" -> Set("slope_cents_per_unit", "intercept_cents"),
    "q179_ann_recall" -> Set("recall"),
    "q180_ks_test" -> Set("ks"),
    "q182_cramers_v" -> Set("chi2", "cramers_v"),
    "q185_split_gini" -> Set("weighted_gini"),
    "q186_calibration_bins" -> Set("pos_rate", "mean_score_micro"),
    "q187_confusion_f1" -> Set("precision", "recall", "f1"),
    "q189_theil_sen" -> Set("theil_sen_slope"),
    "q18_ngram_jaccard" -> Set("jaccard"),
    "q190_seasonal_residual" -> Set("residual"),
    "q191_l_diversity" -> Set("max_dominance"),
    "q192_readability" -> Set("ari"),
    "q195_first_touch" -> Set("conversion_rate"),
    "q196_linear_attribution" -> Set("credit"),
    "q19_cosine_topk" -> Set("cosine"),
    "q201_headway_regularity" -> Set("mean_headway_sec", "var_headway_sec2"),
    "q202_otp" -> Set("otp"),
    "q203_bunching" -> Set("bunching_share"),
    "q204_excess_wait" -> Set("awt_sec", "swt_sec", "ewt_sec"),
    "q205_dwell_time" -> Set("mean_dwell_sec"),
    "q206_run_times" -> Set("mean_run_sec"),
    "q207_delay_accumulation" -> Set("sec_per_stop", "intercept_sec"),
    "q208_delay_survival" -> Set("p_gt60s", "p_gt120s", "p_gt300s", "p_gt600s"),
    "q209_embedding_separation" -> Set("overlap_ratio"),
    "q20_ann_lsh" -> Set("cosine"),
    "q221_hard_negatives" -> Set("cosine"),
    // the same mirrored cosine over the gated candidate set
    "q245_hard_negatives_gated" -> Set("cosine"),
    // rr = 1.0 / first_rel_rank — rank is a <2^53 integer, so the one
    // divide is mirrored exactly (CAST(1.0 AS DOUBLE)/CAST(rank AS
    // DOUBLE) on the oracle side)
    "q222_knn_eval" -> Set("rr"),
    // the same rr divide over the IVF-gated rank (integer <2^53)
    "q238_knn_eval_gated" -> Set("rr"),
    // hits/5 — the q179 recall discipline applied to the IVF gate
    "q240_ivf_recall" -> Set("recall"),
    "q22_quality" -> Set("ttr", "avg_token_len", "stopword_ratio", "quality_score"),
    "q23_token_stats" -> Set("chars_per_token"),
    "q30_weather_attach" -> Set("temperature"),
    "q31_csv_roundtrip" -> Set("avg_value"),
    "q32_ivf_topk" -> Set("cosine"),
    "q33_bucketed_join" -> Set("avg_value"),
    "q36_realtime_e1" -> Set("temperature"),
    "q37_dedup_pipeline" -> Set("jaccard"),
    "q38_jaccard_maxdf" -> Set("jaccard"),
    "q39_salted_join" -> Set("avg_value"),
    "q41_embed_neardup" -> Set("cosine"),
    "q43_trigram_jaccard" -> Set("jaccard"),
    "q47_delay_by_window" -> Set("avg_delay_min"),
    "q50_delay_percentiles" -> Set("p25", "p50", "p75"),
    "q52_corpus_pipeline" -> Set("avg_quality"),
    "q54_ann_banded" -> Set("cosine"),
    "q55_hof_dot_rewrite" -> Set("cosine"),
    "q58_poly_minhash_pairs" -> Set("est_jaccard"),
    "q59_poly_dedup_pipeline" -> Set("jaccard"),
    "q60_tfidf" -> Set("score"),
    "q61_repetition" -> Set("dup_bigram_frac", "top_bigram_frac"),
    "q63_pooled_embeddings" -> Set("unit"),
    "q65_hof_tokens_rewrite" -> Set("chars_per_token"),
    "q69_asof_join" -> Set("purchase_value"),
    "q72_incremental_dedup" -> Set("est_jaccard"),
    "q74_orc_roundtrip" -> Set("avg_value"),
    "q75_partitioned_pruning" -> Set("avg_value"),
    "q77_delay_temp_corr" -> Set("corr_delay_temp"),
    "q79_delay_cube" -> Set("avg_delay_min"),
    "q80_delay_pivot" -> Set("Clear", "Clouds", "Rain", "Snow"),
    "q85_asof_forward" -> Set("purchase_value"),
    "q86_bm25" -> Set("score"),
    "q89_hybrid_rrf" -> Set("rrf"),
    "q90_novelty" -> Set("novelty", "gini"),
    "q91_delay_outliers" -> Set("delay_min", "z"),
    "q94_cohort_retention" -> Set("retention"),
    "q95_sliding_error_rate" -> Set("error_rate"),
    "q96_group_minhash" -> Set("est_jaccard"),
    "q97_schema_evolution" -> Set("avg_value"),
    "q98_unpivot" -> Set("avg_delay"),
    "q99_delay_position" -> Set("delay_min", "pct_rank", "cume")
  )

  test("every double on a hashed surface is consciously registered, " +
    "and no registration is stale") {
    def floats(dt: DataType, prefix: String): Seq[String] = dt match {
      case DoubleType | FloatType => Seq(prefix)
      case s: StructType =>
        s.fields.toSeq.flatMap(f => floats(f.dataType,
          if (prefix.isEmpty) f.name else s"$prefix.${f.name}"))
      case a: ArrayType => floats(a.elementType, s"$prefix[]")
      case m: MapType =>
        floats(m.keyType, s"$prefix{k}") ++ floats(m.valueType, s"$prefix{v}")
      case _ => Nil
    }
    val actual: Map[String, Set[String]] =
      SparkEntry.queries.keys.toSeq.sorted.flatMap { q =>
        val cols = floats(SparkEntry.queries(q)(spark, sf).schema, "").toSet
        if (cols.nonEmpty) Some(q -> cols) else None
      }.toMap
    val unregistered = actual.toSeq.sortBy(_._1).flatMap { case (q, cols) =>
      val extra = cols -- mirroredDoubles.getOrElse(q, Set.empty)
      if (extra.nonEmpty) Some(s"$q: ${extra.toSeq.sorted.mkString(", ")}")
      else None
    }
    val stale = mirroredDoubles.toSeq.sortBy(_._1).flatMap { case (q, cols) =>
      val gone = cols -- actual.getOrElse(q, Set.empty)
      if (gone.nonEmpty) Some(s"$q: ${gone.toSeq.sorted.mkString(", ")}")
      else None
    }
    assert(unregistered.isEmpty,
      "UNREGISTERED double columns on a hashed surface — either carry " +
        "the exact integers instead, or register here after verifying " +
        "the <2^53 mirrored-divide discipline:\n" +
        unregistered.mkString("\n"))
    assert(stale.isEmpty,
      s"stale registrations (column gone or no longer double):\n" +
        stale.mkString("\n"))
  }

  /** (query, cast text) pairs PROVEN to stay below 2^53 — int→double is
    * exact there, so no version's rounding rule can matter. Each entry
    * must carry the bound argument in a comment. EMPTY since r10: the
    * one surviving entry (q63's n2) was respelled with an AS BIGINT
    * wash at its definition (the value is < 2^53, so the wash is
    * exact) — keep it empty; a new entry needs a written bound proof. */
  private val provenSmallCasts: Map[String, Set[String]] = Map.empty

  test("no oracle SQL casts a HUGEINT-DERIVED expression to DOUBLE — the " +
    "int128 to double conversion is the one float op whose rounding has " +
    "drifted across DuckDB versions (the r7/r8 q149+q158 hash misses). " +
    "Tracks derivation through aliases with EXPRESSION-SPAN attribution " +
    "(ADVICE r9): an alias is washed only when ITS definition is an " +
    "outermost AS BIGINT cast (int64→double is correctly rounded " +
    "identically everywhere), tainted when its definition mentions " +
    "HUGEINT or references a tainted identifier; and the DOUBLE-cast " +
    "scan is a balanced-paren walk over CAST(<any expr> AS DOUBLE), " +
    "not an identifier-only regex") {
    val Ident = "[A-Za-z_][A-Za-z0-9_]*"
    val typeWords = Set("double", "bigint", "hugeint", "decimal",
      "integer", "varchar", "date", "boolean", "float")
    val aliasRe = s"(?i)\\bAS\\s+($Ident)".r
    // an alias's definition span: from its AS backward to the nearest
    // same-depth comma / SELECT / opening paren — the expression the
    // alias actually names, across line breaks (the r9 line-level wash
    // could launder a sibling alias on the same line)
    def aliasDefs(sql: String): Seq[(String, String)] = {
      val depthAt = new Array[Int](sql.length + 1)
      var d = 0
      for (i <- sql.indices) {
        depthAt(i) = d
        if (sql.charAt(i) == '(') d += 1
        else if (sql.charAt(i) == ')') d = math.max(0, d - 1)
      }
      depthAt(sql.length) = d
      aliasRe.findAllMatchIn(sql).toSeq
        .filterNot(m => typeWords(m.group(1).toLowerCase))
        .map { m =>
          val asDepth = depthAt(m.start)
          var i = m.start - 1
          var stop = -1
          while (i >= 0 && stop < 0) {
            val c = sql.charAt(i)
            if (depthAt(i) < asDepth) stop = i + 1 // the opening paren
            else if (depthAt(i) == asDepth && c == ',') stop = i + 1
            else if (depthAt(i) == asDepth &&
              sql.regionMatches(true, i, "SELECT", 0, 6)) stop = i + 6
            else i -= 1
          }
          (m.group(1), sql.substring(math.max(stop, 0), m.start).trim)
        }
    }
    // balanced-paren scan for CAST( ... AS DOUBLE ): returns the inner
    // expression text of every double cast
    def doubleCasts(sql: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val castRe = "(?i)\\bCAST\\s*\\(".r
      for (m <- castRe.findAllMatchIn(sql)) {
        var i = m.end; var d = 1
        while (i < sql.length && d > 0) {
          val c = sql.charAt(i)
          if (c == '(') d += 1 else if (c == ')') d -= 1
          i += 1
        }
        if (d == 0) {
          val inner = sql.substring(m.end, i - 1)
          val tail = "(?is)\\s+AS\\s+DOUBLE\\s*$".r
          tail.findFirstMatchIn(inner).foreach { t =>
            out += inner.substring(0, t.start)
          }
        }
      }
      out.toSeq
    }
    def refs(text: String, ident: String): Boolean =
      s"\\b${java.util.regex.Pattern.quote(ident)}\\b".r
        .findFirstIn(text).isDefined
    val outermostWash = "(?is)^CAST\\s*\\(.*AS\\s+BIGINT\\s*\\)$".r
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (q, sql) =>
        val defs = aliasDefs(sql)
        var huge = Set.empty[String]
        var washed = Set.empty[String]
        var changed = true
        while (changed) {
          changed = false
          for ((a, body) <- defs) {
            val wash = outermostWash.findFirstIn(body).isDefined
            val tainted = body.toUpperCase.contains("HUGEINT") ||
              huge.exists(h => refs(body, h))
            if (wash && !washed(a)) { washed += a; changed = true }
            else if (!wash && tainted && !huge(a) && !washed(a)) {
              huge += a; changed = true
            }
          }
        }
        val live = huge -- washed
        // spans of balanced CAST( ... AS BIGINT) inside an expression: a
        // wash clears only the identifiers it COVERS — an unrelated
        // washed sub-cast elsewhere in the same expression must not
        // launder a tainted sibling (the expression-level rerun of the
        // line-level laundering this lint's r10 rewrite closed)
        def bigintSpans(inner: String): Seq[(Int, Int)] = {
          val castRe = "(?i)\\bCAST\\s*\\(".r
          castRe.findAllMatchIn(inner).toSeq.flatMap { m =>
            var i = m.end; var d = 1
            while (i < inner.length && d > 0) {
              val c = inner.charAt(i)
              if (c == '(') d += 1 else if (c == ')') d -= 1
              i += 1
            }
            if (d == 0 && "(?is)AS\\s+BIGINT\\s*$".r
                .findFirstIn(inner.substring(m.end, i - 1)).isDefined)
              Some((m.start, i))
            else None
          }
        }
        val flags = doubleCasts(sql)
          .filter { inner =>
            val spans = bigintSpans(inner)
            def covered(pos: Int) =
              spans.exists { case (s0, e0) => pos >= s0 && pos < e0 }
            live.exists { h =>
              s"\\b${java.util.regex.Pattern.quote(h)}\\b".r
                .findAllMatchIn(inner).exists(m => !covered(m.start))
            }
          }
          .map(inner => "CAST(" + inner.replaceAll("\\s+", " ").trim +
            " AS DOUBLE)")
          .toSet -- provenSmallCasts.getOrElse(q, Set.empty)
        if (flags.nonEmpty) Some(s"$q: ${flags.toSeq.sorted.mkString(", ")}")
        else None
    }
    assert(offenders.isEmpty,
      "oracles casting HUGEINT-derived expressions to DOUBLE — respell " +
        "via an integral divide to BIGINT (the q204 micro pattern) or " +
        "register in provenSmallCasts with a <2^53 bound argument:\n" +
        offenders.mkString("\n"))
    val staleAllow = provenSmallCasts.keys.filterNot { q =>
      SparkEntry.oracleSql.get(q).exists(sql =>
        provenSmallCasts(q).forall(sql.contains))
    }
    assert(staleAllow.isEmpty,
      s"provenSmallCasts entries no longer present in their oracle: " +
        staleAllow.mkString(", "))
  }

  /** Queries allowed to use interpolating quantiles: every probability
    * must be DYADIC (k/2^n — 0.25/0.5/0.75) over INTEGER inputs, which
    * makes the interpolation a + (b−a)·p exact in binary floating point
    * — no rounding for a version to drift on. Anything else (arbitrary
    * p, float inputs) must be respelled as the two-pass discrete rank
    * pick (the q156 pattern). */
  private val dyadicQuantiles = Set("q145_mad_outliers", "q147_winsorize",
    "q159_key_skew", "q50_delay_percentiles")

  test("no oracle SQL uses a non-correctly-rounded or order-dependent " +
    "float function — ln/exp/pow diverge between libm builds, avg and " +
    "double sums are shuffle-order-dependent, random is random; the " +
    "engine's discipline is integer/decimal aggregation with mirrored " +
    "divides, and this freezes it") {
    val banned = Seq(
      "ln/log" -> "(?i)\\b(ln|log|log2|log10)\\s*\\(".r,
      "exp" -> "(?i)\\bexp\\s*\\(".r,
      "pow" -> "(?i)\\b(pow|power)\\s*\\(".r,
      "avg" -> "(?i)\\bavg\\s*\\(".r,
      "stddev/var" -> "(?i)\\b(stddev|var_pop|var_samp|variance)\\s*\\(".r,
      "random" -> "(?i)\\b(random|rand)\\s*\\(".r,
      "double-sum" -> "(?i)sum\\s*\\(\\s*CAST\\s*\\([^)]*AS\\s+DOUBLE".r)
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (q, sql) =>
        val hits = banned.collect {
          case (label, re) if re.findFirstIn(sql).isDefined => label
        }
        if (hits.nonEmpty) Some(s"$q: ${hits.mkString(", ")}") else None
    }
    assert(offenders.isEmpty,
      "oracles using drift-prone float functions — respell with exact " +
        "integer/decimal aggregation and one mirrored divide:\n" +
        offenders.mkString("\n"))
    val quantileRe = "(?i)\\b(percentile|quantile)\\w*\\s*\\(".r
    val quantileUsers = SparkEntry.oracleSql.toSeq.sortBy(_._1).collect {
      case (q, sql) if quantileRe.findFirstIn(sql).isDefined => q
    }
    val unapproved = quantileUsers.filterNot(dyadicQuantiles)
    assert(unapproved.isEmpty,
      "oracles using quantiles without a dyadic-p review — register in " +
        s"dyadicQuantiles after checking p is k/2^n over integers: " +
        unapproved.mkString(", "))
    val staleDyadic = dyadicQuantiles
      .filterNot(q => quantileUsers.contains(q))
    assert(staleDyadic.isEmpty,
      s"stale dyadicQuantiles entries: ${staleDyadic.mkString(", ")}")
  }

  test("no registered query output carries a DECIMAL or FLOAT32 column — " +
    "the driver-side comparator materializes results through pandas, " +
    "where DuckDB HUGEINT/DECIMAL become float64 (lossy past 2^53, " +
    "repr-divergent from Spark's exact Decimal below it) while BIGINT " +
    "stays int64 on every path; q149/q158 were red for three rounds " +
    "because they were the only two queries with an int128-typed output " +
    "column. Big integers ship as int64 limbs (hugeAsDouble / DIV-MOD " +
    "10^12 pairs), never as a decimal column") {
    def decimals(dt: DataType, prefix: String): Seq[String] = dt match {
      case d: DecimalType => Seq(s"$prefix: $d")
      case FloatType => Seq(s"$prefix: float32")
      case s: StructType =>
        s.fields.toSeq.flatMap(f => decimals(f.dataType,
          if (prefix.isEmpty) f.name else s"$prefix.${f.name}"))
      case a: ArrayType => decimals(a.elementType, s"$prefix[]")
      case m: MapType =>
        decimals(m.keyType, s"$prefix{k}") ++
          decimals(m.valueType, s"$prefix{v}")
      case _ => Nil
    }
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { q =>
      val cols = decimals(SparkEntry.queries(q)(spark, sf).schema, "")
      if (cols.nonEmpty) Some(s"$q: ${cols.mkString(", ")}") else None
    }
    assert(offenders.isEmpty,
      "DECIMAL/FLOAT32 on a hashed surface — the comparator's pandas " +
        "path cannot round-trip these; render as int64 limbs or a " +
        "mirrored double instead:\n" + offenders.mkString("\n"))
  }

  test("the hugeAsDouble limb identity holds on Spark exactly as the " +
    "oracles assume of DuckDB: div truncates toward zero, % takes the " +
    "dividend's sign (verified on DuckDB 1.0.0: -7//2 = -3 rem -1), so " +
    "hi*1e16 + lo reconstructs M exactly for positive AND negative " +
    "moments near the limb boundaries") {
    import org.apache.spark.sql.functions._
    val limb = BigDecimal("10000000000000000") // 10^16
    val cases = Seq(
      BigDecimal("-70000000000000000001"), BigDecimal("70000000000000000001"),
      BigDecimal("-9999999999999999"), BigDecimal("9999999999999999"),
      BigDecimal("-10000000000000000"), BigDecimal("10000000000000000"),
      BigDecimal("-330000000000000000000000000000001"), // q160-scale moment
      BigDecimal(0), BigDecimal(-1), BigDecimal(1))
    // explicit DECIMAL(38,0) schema: the implicit BigDecimal encoder is
    // (38,18), which can't hold a 33-digit moment
    val d38Schema = StructType(Seq(StructField("m", DecimalType(38, 0))))
    def asDf(ms: Seq[BigDecimal]) = spark.createDataFrame(
      java.util.Arrays.asList(ms.map(m =>
        org.apache.spark.sql.Row(m.bigDecimal.setScale(0))): _*), d38Schema)
    val rows = asDf(cases)
      .select(col("m"),
        call_function("div", col("m"),
          lit(limb.bigDecimal).cast("decimal(19,0)")).as("hi"),
        (col("m") % lit(limb.bigDecimal).cast("decimal(19,0)"))
          .cast("long").as("lo"))
      .collect()
    rows.zip(cases).foreach { case (r, m) =>
      // div yields BIGINT (hi < 10^17 here; the hugeAsDouble domain bound
      // |M| < 9.2e34 is exactly where this long would overflow)
      val hi = BigDecimal(r.getLong(1))
      val lo = BigDecimal(r.getLong(2))
      assert(hi * limb + lo == m, s"limb identity broke for $m: hi=$hi lo=$lo")
      assert(lo.signum * m.signum >= 0, s"remainder sign for $m: $lo")
      // truncation toward zero: |hi| = floor(|m| / limb)
      assert(hi.abs == (m.abs / limb).setScale(0, BigDecimal.RoundingMode.DOWN),
        s"div not truncating for $m: hi=$hi")
    }
    // and the rendered double is the fixed 3-op IEEE chain on int64s:
    // exact when |m| < 2^53, within 2 ulp above it — spot-pin exactness
    val exact = BigDecimal(9007199254740991L) // 2^53 - 1
    val rendered = asDf(Seq(exact, -exact))
      .select((call_function("div", col("m"),
        lit(limb.bigDecimal).cast("decimal(19,0)")).cast("double") *
        lit(1.0e16) +
        (col("m") % lit(limb.bigDecimal).cast("decimal(19,0)"))
          .cast("long").cast("double")).as("d"))
      .collect().map(_.getDouble(0))
    assert(rendered.toSeq == Seq(9007199254740991.0, -9007199254740991.0))
  }
}
