package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * The span-dedup gram identity: per k-code-point gram position, a PAIR of
 * independent weighted code-point sums `h_f(gram) = Σ_p cp(p) · w_f(p)`
 * over two fixed PSEUDORANDOM per-position weight tables (38-bit splitmix64
 * values — see the companion's weight scaladoc).
 *
 * Why this exact shape:
 *  - hash-basis history, both failures observed on this corpus: tHash's
 *    8-CYCLE weights collide on equal-length swaps 8 positions apart, and
 *    STRUCTURED full-length weights (affine `a + p·b`) collide on any
 *    code-point delta with Σδ = Σδ·p = 0 (adjacent-pair swaps). Mixed
 *    table weights leave only generic per-family 2⁻³⁸ collisions — 2⁻⁷⁶
 *    joint, a handful of false grams even at 10¹² grams, which span
 *    semantics need (a collision marks deletable false "duplicate" text).
 *  - vs md5 / raw-substring grams: no per-gram string materialization or
 *    digest — a tight primitive loop (benchmarked ~3× faster end-to-end on
 *    the span queries), and the (h1, h2) key shuffles 16 bytes vs 20+ for
 *    raw k-grams or 32 for hex digests.
 *  - every operation is small-integer exact (cp ≤ 0x10FFFF, w < 2³⁸,
 *    k ≤ 28 ⇒ |h| < 2⁶³), so DuckDB mirrors it verbatim with `list_sum`
 *    over `ascii(substring(...)) · w[j]` where w is the SAME table embedded
 *    as a list literal (mirror by value, not by formula).
 *
 * Output: `array<struct<h1: long, h2: long>>`, element i = gram starting at
 * code point i+1; shorter-than-k input → empty array.
 */
case class KGramHashPairsExpr(child: Expression, k: Int) extends UnaryExpression {
  // 0x10FFFF · 2³⁸ · 28 < 2⁶³: the largest k where full-Unicode sums stay
  // exact on both engines (word grams go longer — their [a-z] content keeps
  // the bound, see WordGramHashPairsExpr)
  require(k > 0 && k <= 28, s"need 0 < k <= 28, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kgram_hash_pairs requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h1", LongType, nullable = false),
      StructField("h2", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "kgram_hash_pairs"

  protected override def nullSafeEval(input: Any): Any =
    KGramHashPairsExpr.compute(input.asInstanceOf[UTF8String].toString, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.KGramHashPairsExpr.compute($c.toString(), $k);""")

  override protected def withNewChildInternal(newChild: Expression): KGramHashPairsExpr =
    copy(child = newChild)
}

/** [[KGramHashPairsExpr]] over an `array<string>` of words: element i =
  * (h1, h2) of the n-word gram starting at word i+1, valued exactly as the
  * char expression over the words joined by single spaces (see
  * [[KGramHashPairsExpr.computeWords]]). [a-z] word content keeps the sums
  * exact for grams up to ~10⁵ chars. */
case class WordGramHashPairsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"need positive n, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"wordgram_hash_pairs requires array<string>, got ${dt.catalogString}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h1", LongType, nullable = false),
      StructField("h2", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "wordgram_hash_pairs"

  protected override def nullSafeEval(input: Any): Any =
    KGramHashPairsExpr.computeWordsData(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.KGramHashPairsExpr.computeWordsData($c, $n);""")

  override protected def withNewChildInternal(newChild: Expression): WordGramHashPairsExpr =
    copy(child = newChild)
}

object KGramHashPairsExpr {
  /** Max supported gram length in chars (weight-table size). */
  val MaxGramChars = 512

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Per-position weights: 38-bit odd pseudorandom Longs from splitmix64 —
    * NO algebraic structure (an affine w(p) = a + p·b family collides on any
    * code-point delta with Σδ = Σδ·p = 0, e.g. swapping two adjacent pairs —
    * observed; mixed weights leave only generic 2⁻³⁸-per-family collisions,
    * 2⁻⁷⁶ joint). 38 bits keeps `cp ≤ 0x10FFFF × w × 64 grams < 2⁶³` exact
    * on both engines; the tables are embedded as SQL list LITERALS in the
    * oracle (Oracles builders call [[weight1]]/[[weight2]]), so the mirror
    * is by-value, not by-formula. */
  private val WMask = (1L << 38) - 1
  def weight1(p: Int): Long = (splitmix64(0x1000000000L + p) & WMask) | 1L
  def weight2(p: Int): Long = (splitmix64(0x2000000000L + p) & WMask) | 1L

  private val W1: Array[Long] = Array.tabulate(MaxGramChars)(weight1)
  private val W2: Array[Long] = Array.tabulate(MaxGramChars)(weight2)

  /** Static entry for generated code: all gram (h1, h2) pairs of `s`. */
  def compute(s: String, k: Int): GenericArrayData = {
    val cps = s.codePoints().toArray
    if (cps.length < k) return new GenericArrayData(Array.empty[Any])
    val w1 = W1
    val w2 = W2
    val out = new Array[Any](cps.length - k + 1)
    var start = 0
    while (start <= cps.length - k) {
      var h1 = 0L; var h2 = 0L
      var p = 0
      while (p < k) {
        val cp = cps(start + p).toLong
        h1 += cp * w1(p); h2 += cp * w2(p)
        p += 1
      }
      out(start) = new GenericInternalRow(Array[Any](h1, h2)): InternalRow
      start += 1
    }
    new GenericArrayData(out)
  }

  /** ArrayData adapter for generated code (null words hash as empty). */
  def computeWordsData(
      words: org.apache.spark.sql.catalyst.util.ArrayData, n: Int): GenericArrayData = {
    val arr = new Array[String](words.numElements())
    var i = 0
    while (i < arr.length) {
      val u = words.getUTF8String(i)
      arr(i) = if (u == null) "" else u.toString
      i += 1
    }
    computeWords(arr, n)
  }

  /** Word-gram form: (h1, h2) of each n-word gram of `words`, where the gram
    * string is the words joined by single spaces — char positions (and so
    * weights) advance across the join exactly as in the joined string, so
    * the value equals [[compute]] of `words.slice(i, i+n).mkString(" ")`
    * without materializing it. */
  def computeWords(words: Array[String], n: Int): GenericArrayData = {
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](words.length - n + 1)
    var i = 0
    while (i <= words.length - n) {
      var h1 = 0L; var h2 = 0L
      var p = 0 // char position within the joined gram
      var wi = 0
      while (wi < n) {
        if (wi > 0) { // the joining space
          h1 += 32L * W1(p); h2 += 32L * W2(p); p += 1
        }
        val w = words(i + wi)
        var ci = 0
        while (ci < w.length) {
          val cp = w.codePointAt(ci)
          if (p >= MaxGramChars) throw new IllegalArgumentException(
            s"word gram exceeds $MaxGramChars chars (weight-table bound) — " +
              "reduce n or split the words")
          h1 += cp.toLong * W1(p); h2 += cp.toLong * W2(p)
          ci += Character.charCount(cp); p += 1
        }
        wi += 1
      }
      out(i) = new GenericInternalRow(Array[Any](h1, h2)): InternalRow
      i += 1
    }
    new GenericArrayData(out)
  }
}
