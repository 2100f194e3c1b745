package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen kernels for the per-document signature math of the dedup
  * family — MinHash, SimHash, and the oracle-expressible polynomial MinHash.
  *
  * Why native expressions (SURVEY.md §7.4 escalation rule, the same case as
  * [[IntDotProduct]]): the HOF spellings (`aggregate` carrying a
  * 64-slot accumulator, `zip_with` per element) are ALWAYS interpreted —
  * per shingle they allocate lambda variables, box every long, and build a
  * fresh GenericArrayData accumulator. At corpus scale that interpreted
  * per-row loop IS the dominant cost of every full-corpus signature pass
  * (q16/q17/q26 were ~20% of the round-5 bench). These expressions run the
  * identical arithmetic as a tight primitive loop inside whole-stage
  * codegen, value-identical to the HOF forms (pinned by
  * SignatureKernelsSpec parity properties).
  *
  * The per-row kernels live in [[SignatureKernels]] as plain static methods
  * invoked from both `nullSafeEval` and the generated code — one body, no
  * eval/codegen divergence, directly unit-testable.
  */
object SignatureKernels {

  /** xxhash64's seed for all Spark hash expressions. */
  private val SparkHashSeed = 42L

  val PolyMod = 1000000007L

  /** MinHash row kernel: component j = min over non-null elements s of
    * xxhash64(j, s) = hashUTF8String(s, hashInt(j, 42)); a null element
    * contributes its seed unchanged (exactly Spark's null-skipping hash
    * semantics). `seeds` carries the precomputed per-component
    * hashInt(j, 42) values. */
  def minhash(arr: ArrayData, seeds: Array[Long]): ArrayData = {
    val n = seeds.length
    val sig = new Array[Long](n)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val m = arr.numElements()
    var i = 0
    while (i < m) {
      if (arr.isNullAt(i)) {
        var j = 0
        while (j < n) {
          if (seeds(j) < sig(j)) sig(j) = seeds(j)
          j += 1
        }
      } else {
        val s = arr.getUTF8String(i)
        var j = 0
        while (j < n) {
          val h = XXH64.hashUTF8String(s, seeds(j))
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** SimHash row kernel: per non-null token t, h = xxhash64(t) (a null
    * token hashes to the bare seed 42); bit j of the fingerprint is set
    * when the +1/-1 votes of all token-hash bits j sum positive. */
  def simhash(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val m = arr.numElements()
    var i = 0
    while (i < m) {
      val h =
        if (arr.isNullAt(i)) SparkHashSeed
        else XXH64.hashUTF8String(arr.getUTF8String(i), SparkHashSeed)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }

  /** Codepoint-level polynomial rolling hash, value-identical to
    * [[graft.text.TextAnalysis.charPolyHash]] (h = (h*31 + codepoint) mod
    * 1e9+7; the HOF form's `ascii` returns the leading CODEPOINT of each
    * `split(s, "")` cell, and Java's zero-width regex split never splits a
    * surrogate pair, so codepoints — not UTF-16 units — are the grain). */
  def polyHash(s: UTF8String): Long = polyHashM(s, 31L, PolyMod)

  /** The generalized family: h = (h*mult + codepoint) mod `mod`. Both
    * parameters must keep h*mult + cp < 2^63 (mod ≲ 2^31 with mult ≲
    * 2^30 is safe). */
  def polyHashM(s: UTF8String, mult: Long, mod: Long): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * mult + cp) % mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Second independent poly modulus/multiplier pair for the 60-bit
    * combined token hash of [[polySimhash]]. */
  val PolyMod2 = 998244353L
  val PolyMult2 = 131L

  /** Oracle-expressible SimHash row kernel: each non-null token hashes to
    * the 60-bit combination h = poly31(t) | (poly131(t) << 30) of two
    * independent ~30-bit polynomial hashes (every ingredient has an
    * exact SQL mirror — the whole point, vs xxhash64's engine-defined
    * bits); bit j of the fingerprint is set when the +1/-1 votes of all
    * token-hash bits j sum positive, over bits 0..59. Null tokens are
    * skipped. An empty/all-null array yields fingerprint 0. */
  def polySimhash(arr: ArrayData): Long = {
    val votes = new Array[Int](60)
    val m = arr.numElements()
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        val h = polyHashM(t, 31L, PolyMod) |
          (polyHashM(t, PolyMult2, PolyMod2) << 30)
        var j = 0
        while (j < 60) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }

  /** Polynomial-family MinHash row kernel: the shingle is reduced ONCE to
    * its charPolyHash ph, then component j = min over shingles of
    * (a(j)*ph + b(j)) mod 1e9+7 — an affine universal family over a hash
    * every SQL engine can mirror (the whole point: DuckDB checks these
    * signatures end-to-end, unlike xxhash64's). One char-level pass plus
    * numHashes multiply-adds per shingle; products stay < 2^63 (both
    * factors < 1e9+7). Null elements are skipped entirely (the HOF
    * mirror's transform produces NULL, which `least` ignores). */
  def polyMinhash(arr: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val n = as.length
    val sig = new Array[Long](n)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val m = arr.numElements()
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i)) {
        val ph = polyHash(arr.getUTF8String(i))
        var j = 0
        while (j < n) {
          val v = (as(j) * ph + bs(j)) % PolyMod
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** Deterministic affine coefficients for [[PolyMinHash]] component j:
    * a = Knuth-multiplier stream (never 0 — a zero slope would collapse
    * the component), b = a second LCG stream. Public because the DuckDB
    * oracle embeds the SAME values as SQL literals (the q57/q58 pattern:
    * operator constants are part of the definition, so the oracle may
    * carry them verbatim). */
  def polyCoeffs(numHashes: Int): (Array[Long], Array[Long]) = {
    val as = Array.tabulate(numHashes) { j =>
      val a = (2654435761L * (j + 1)) % PolyMod
      if (a == 0L) 1L else a
    }
    val bs = Array.tabulate(numHashes)(j => (40503L * j + 7919L) % PolyMod)
    (as, bs)
  }

  // ------------------------------------------------------- Column surface --

  /** xxhash64 MinHash signature of an array<string> column. */
  def minhashSig(shingles: Column, numHashes: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(shingles), numHashes))

  /** 64-bit SimHash fingerprint of an array<string> column. */
  def simhashFp(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))

  /** 60-bit oracle-expressible poly-SimHash fingerprint. */
  def polySimhashFp(tokens: Column): Column =
    Bridge.column(PolySimHash(Bridge.expression(tokens)))

  /** Polynomial-family MinHash signature of an array<string> column. */
  def polyMinhashSig(shingles: Column, numHashes: Int): Column =
    Bridge.column(PolyMinHash(Bridge.expression(shingles), numHashes))
}

/** Base for the array<string> → fixed signature kernels: shared type
  * checking and null-propagating unary plumbing. */
trait SignatureExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> input, got ${other.simpleString}")
  }
}

/** MinHash signature: component j = min over shingles of xxhash64(j, s).
  * Value-identical to the interpreted
  * `aggregate(sh, [MaxValue]*n, zip_with(acc, seeds, least(_, xxhash64)))`
  * spelling it replaces (Dedup.minhashSignatureHof), but one codegen'd
  * primitive loop per row. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends SignatureExpression {
  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  // per-component seeds: xxhash64's int-child chaining hashInt(j, 42),
  // precomputed once at plan time instead of per (shingle, component)
  private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(j => XXH64.hashInt(j, 42L))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(a: Any): Any =
    SignatureKernels.minhash(a.asInstanceOf[ArrayData], seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.SignatureKernels.minhash($a, $seedsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** 64-bit SimHash over token hashes — the codegen'd twin of the
  * interpreted 64-slot vote aggregate (Dedup.simhash64Hof). */
case class SimHash64(child: Expression) extends SignatureExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(a: Any): Any =
    SignatureKernels.simhash(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.SignatureKernels.simhash($a);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** 60-bit poly-SimHash — [[SimHash64]]'s oracle-expressible sibling: the
  * token hash is two mirrorable polynomial hashes packed side by side
  * instead of xxhash64, so fingerprints AND the pigeonhole banding built
  * on them hash-check against an external SQL engine. */
case class PolySimHash(child: Expression) extends SignatureExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_simhash"

  override def nullSafeEval(a: Any): Any =
    SignatureKernels.polySimhash(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.SignatureKernels.polySimhash($a);")

  override protected def withNewChildInternal(newChild: Expression): PolySimHash =
    copy(child = newChild)
}

/** Polynomial-family MinHash signature: component j = min over shingles of
  * (a_j * charPolyHash(s) + b_j) mod 1e9+7 — every ingredient has an exact
  * DuckDB mirror, so (unlike xxhash64 MinHash) the signatures, the banding,
  * and the candidate pairs built from them are END-TO-END hash-checkable
  * against the oracle. */
case class PolyMinHash(child: Expression, numHashes: Int)
    extends SignatureExpression {
  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  private lazy val (as, bs) = SignatureKernels.polyCoeffs(numHashes)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_poly_minhash"

  override def nullSafeEval(a: Any): Any =
    SignatureKernels.polyMinhash(a.asInstanceOf[ArrayData], as, bs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("polyA", as, "long[]")
    val bRef = ctx.addReferenceObj("polyB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.SignatureKernels.polyMinhash($a, $aRef, $bRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): PolyMinHash =
    copy(child = newChild)
}
