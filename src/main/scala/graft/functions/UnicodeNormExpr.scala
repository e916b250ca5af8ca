package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row kernel for [[UnicodeNormExpr]] — static so generated code can call it.
  * ASCII fast path: a pure-ASCII string is already in every normalization
  * form, and all-ASCII is one branch-free byte scan over the UTF8String's
  * bytes — no String decode, no Normalizer call. At 100 TB the corpus is
  * overwhelmingly ASCII, so the normalize pass costs ~a memchr, and only the
  * rows that can actually change pay the JDK normalizer. */
object UnicodeNorm {
  private def allAscii(s: UTF8String): Boolean = {
    // getByte over numBytes, NOT getBytes: getBytes copies whenever the string
    // is a slice of a larger buffer (the normal case for parquet-backed rows),
    // which would put a per-row allocation on the fast path.
    val n = s.numBytes()
    var i = 0
    while (i < n) { if (s.getByte(i) < 0) return false; i += 1 }
    true
  }
  private def norm(s: UTF8String, f: java.text.Normalizer.Form): UTF8String =
    if (allAscii(s)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(s.toString, f))
  def nfc(s: UTF8String): UTF8String = norm(s, java.text.Normalizer.Form.NFC)
  def nfkc(s: UTF8String): UTF8String = norm(s, java.text.Normalizer.Form.NFKC)
}

/**
 * Codegen'd Unicode canonicalization — `string -> string` via the JDK's
 * `java.text.Normalizer` (public, in-container). The CCNet-style
 * normalize-before-hash stage for Unicode equivalence classes: composed vs
 * decomposed accents (`é` vs `e`+U+0301) hash identically after NFC, and
 * NFKC additionally folds compatibility forms (ligature `ﬁ` → `fi`,
 * full-width `Ａ` → `A`, `①` → `1`) so visually-equivalent spam variants
 * dedup together. Complements [[TextFunctions.normalizeTextCol]] (control
 * chars + whitespace), which knows nothing of equivalence classes.
 *
 * `form` must be `"NFC"` or `"NFKC"` (the two forms with a dedup use-case;
 * checked at plan time). Pure per-row scalar inside whole-stage codegen —
 * zero shuffles, and the ASCII fast path in [[UnicodeNorm]] makes the
 * common row a byte scan.
 *
 * Oracle strategy: DuckDB ships `nfc_normalize` → the NFC face is
 * hash-gated end-to-end (`text_normalize_nfc`). DuckDB has no NFKC — that
 * face is pinned by a fixture map in the unit suite (ﬁ/Ａ/①/ﬀ cases) plus
 * the NFC gate sharing the same kernel and fast path.
 */
case class UnicodeNormExpr(child: Expression, form: String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"unicode_norm requires a string input, got ${child.dataType.catalogString}")
    else if (form != "NFC" && form != "NFKC")
      TypeCheckResult.TypeCheckFailure(s"unicode_norm form must be NFC or NFKC, got $form")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = StringType
  override def prettyName: String = s"unicode_norm_${form.toLowerCase(java.util.Locale.ROOT)}"

  protected override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (form == "NFC") UnicodeNorm.nfc(s) else UnicodeNorm.nfkc(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (form == "NFC") "nfc" else "nfkc"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.UnicodeNorm.$m($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormExpr =
    copy(child = newChild)
}
