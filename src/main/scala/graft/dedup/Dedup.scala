package graft.dedup

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact content-hash
  * dedup, MinHash+LSH and SimHash near-dup candidate generation, and
  * blocked n-gram Jaccard verification.
  *
  * Scale design: every stage is a hash-partitioned groupBy/join on either a
  * content hash or an LSH bucket key — candidate generation never compares
  * all pairs. The O(n²) work is confined to within-bucket/within-block
  * pairs, which is the standard way these survive 100 TB (bucket sizes are
  * bounded by band width, not corpus size). Signature computation is pure
  * Column expressions over token arrays — per-row, no shuffle, codegen'd.
  */
object Dedup {

  /** Exact dedup groups by SHA-256 content hash: one row per distinct
    * content with its duplicate count and the kept (minimum) id. */
  def exactDupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(sha2(col(textCol), 256).as("text_hash"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keep_id"))

  /** MinHash signature: for seed i, min over shingles of xxhash64(i, s).
    * Deterministic (xxhash64 is seeded by the literal). NULL-free as long
    * as the shingle array is non-empty. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    array((0 until numHashes).map(i =>
      array_min(transform(shingles, s => xxhash64(lit(i), s)))): _*)

  /** MinHash LSH candidate pairs: split the signature into `bands` bands of
    * `numHashes/bands` rows, bucket-join docs sharing any band hash, and
    * estimate similarity as the matching fraction of signature components.
    * Returns (id_a, id_b, est_jaccard) with id_a < id_b, distinct pairs. */
  def minhashCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
                            numHashes: Int = 64, bands: Int = 16,
                            minEstSim: Double = 0.0): DataFrame = {
    val rows = numHashes / bands
    val sigs = docs.select(col(idCol).as("id"),
      minhashSignature(TextAnalysis.bigramShingles(
        TextAnalysis.tokens(col(textCol))), numHashes).as("sig"))
      .where(size(col("sig")) === numHashes)
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(lit(b), slice(col("sig"), b * rows + 1, rows))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    val a = banded.select(col("band"), col("band_hash"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("band_hash"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "band_hash"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), _ === _),
          x => x)).cast("double") / lit(numHashes.toDouble)).as("est_jaccard"))
      .distinct()
      .where(col("est_jaccard") >= minEstSim)
  }

  /** 64-bit SimHash over token hashes: bit j of the fingerprint is set when
    * the +1/-1 vote of all token-hash bits j sums positive. */
  def simhash64(tk: Column): Column = {
    val th = transform(tk, t => xxhash64(t))
    val bits = (0 until 64).map { j =>
      val vote = aggregate(th, lit(0L), (a, h) =>
        a + when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(vote > 0L, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming, using
    * 4×16-bit band pigeonholing for candidates (any pair within Hamming 3
    * must agree on at least one 16-bit band). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val fp = docs.select(col(idCol).as("id"),
      simhash64(TextAnalysis.tokens(col(textCol))).as("fp"))
    val banded = fp.select(col("id"), col("fp"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("fp"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
    val a = banded.select(col("band"), col("chunk"),
      col("id").as("id_a"), col("fp").as("fp_a"))
    val b = banded.select(col("band"), col("chunk"),
      col("id").as("id_b"), col("fp").as("fp_b"))
    a.join(b, Seq("band", "chunk"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Blocked n-gram Jaccard: exact bigram-shingle Jaccard for all pairs
    * within a blocking key (e.g. lang+source) — the verification stage that
    * follows LSH candidate generation, here runnable standalone because
    * blocks are small. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   blockCols: Seq[String], minJaccard: Double): DataFrame = {
    val sh = docs.select((blockCols.map(col) :+ col(idCol).as("id") :+
      TextAnalysis.bigramShingles(TextAnalysis.tokens(col(textCol))).as("sg")): _*)
    val a = sh.select(blockCols.map(col) :+ col("id").as("id_a") :+ col("sg").as("sg_a"): _*)
    val b = sh.select(blockCols.map(col) :+ col("id").as("id_b") :+ col("sg").as("sg_b"): _*)
    a.join(b, blockCols)
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sg_a"), col("sg_b"))).cast("double") /
          (size(col("sg_a")) + size(col("sg_b")) -
            size(array_intersect(col("sg_a"), col("sg_b")))).cast("double"))
          .as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }
}
