package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Duplicate-element statistics of an array<string> in one pass — the
  * line/paragraph repetition signals of Gopher-style quality filtering
  * (Rae et al. 2021 §A1.1: duplicate line fraction, duplicate line character
  * fraction), native. Elements are trimmed first; null and trim-empty
  * elements are skipped (blank lines are layout, not content). Identity and
  * character counts are over the TRIMMED element.
  *
  * Returns `[total, dup_total, total_chars, dup_chars]` where a "dup" element
  * belongs to a group of ≥2 equal elements and dup groups are counted FULLY
  * (a line appearing 3× contributes 3 to dup_total) — fractions are then
  * `dup_total/total` and `dup_chars/total_chars` on the caller side. One
  * hash-map of distinct elements per document; O(total chars) per doc, zero
  * shuffle at any corpus size.
  */
case class DupArrayStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"dup_array_stats expects array<string>, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dup_array_stats"

  override protected def nullSafeEval(input: Any): Any =
    DupArrayStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DupArrayStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): DupArrayStats =
    copy(child = newChild)
}

object DupArrayStats {
  /** Called from generated code. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    // distinct trimmed element -> [count, numChars]
    val m = new java.util.HashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i).trim()
        if (t.numBytes() > 0) {
          val slot = m.get(t)
          if (slot == null) m.put(t.copy(), Array(1L, t.numChars().toLong))
          else slot(0) += 1L
        }
      }
      i += 1
    }
    var total = 0L; var dup = 0L; var tChars = 0L; var dChars = 0L
    val it = m.values().iterator()
    while (it.hasNext) {
      val s = it.next()
      val c = s(0); val chars = c * s(1)
      total += c; tChars += chars
      if (c >= 2) { dup += c; dChars += chars }
    }
    UnsafeArrayData.fromPrimitiveArray(Array(total, dup, tChars, dChars))
  }
}

/** Repeated word-n-gram statistics of an array<string> token column in one
  * pass — the top-n-gram / duplicated-n-gram character fractions of
  * Gopher-style repetition filtering, native. Windows are `n` consecutive
  * tokens; a gram's character length is `sum(numChars(token)) + (n-1)`
  * (single-space joins, i.e. its length in the whitespace-normalized text).
  *
  * Returns `[top_chars, dup_chars]`:
  *  - `top_chars` = character mass (`count × gramChars`) of the MOST
  *    FREQUENTLY OCCURRING n-gram — Gopher's §A1.1 definition (argmax by
  *    count), NOT the max product over all grams: a long gram repeated
  *    twice must not outrank a short gram repeated five times. Count ties
  *    break by larger mass, so the result is deterministic (and on
  *    all-unique docs it degrades to the longest gram's length, the same
  *    short-doc caveat FilterConfig documents);
  *  - `dup_chars` = sum over grams with `count ≥ 2` of `count × gramChars`.
  * Callers divide by the normalized text length; overlapping occurrences are
  * counted per-occurrence, so pathological single-token floods can exceed 1 —
  * a documented property of the signal, not an error. A null token nulls the
  * whole result (tokenizers here never produce one). One hash-map of distinct
  * grams per document; O(total gram chars) per doc, zero shuffle.
  */
case class NgramRepeatStats(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ngram_repeat_stats needs n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"ngram_repeat_stats expects array<string>, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ngram_repeat_stats"

  private def compute(arr: ArrayData): ArrayData = {
    val nTok = arr.numElements()
    val toks = new Array[UTF8String](nTok)
    var i = 0
    while (i < nTok) {
      if (arr.isNullAt(i)) return null
      toks(i) = arr.getUTF8String(i)
      i += 1
    }
    if (nTok < n)
      return UnsafeArrayData.fromPrimitiveArray(Array(0L, 0L))
    // distinct gram -> [count, numChars]; the key is the space-joined window
    val m = new java.util.HashMap[UTF8String, Array[Long]]()
    val sep = UTF8String.fromString(" ")
    val window = new Array[UTF8String](2 * n - 1)
    var w = 0
    while (w + n <= nTok) {
      var chars = (n - 1).toLong
      var j = 0
      while (j < n) {
        window(2 * j) = toks(w + j)
        if (j < n - 1) window(2 * j + 1) = sep
        chars += toks(w + j).numChars()
        j += 1
      }
      val gram = UTF8String.concat(window: _*)
      val slot = m.get(gram)
      if (slot == null) m.put(gram, Array(1L, chars))
      else slot(0) += 1L
      w += 1
    }
    var topCount = 0L; var top = 0L; var dup = 0L
    val it = m.values().iterator()
    while (it.hasNext) {
      val s = it.next()
      val mass = s(0) * s(1)
      // argmax by count, count ties broken by larger mass
      if (s(0) > topCount || (s(0) == topCount && mass > top)) {
        topCount = s(0); top = mass
      }
      if (s(0) >= 2) dup += mass
    }
    UnsafeArrayData.fromPrimitiveArray(Array(top, dup))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val selfRef = ctx.addReferenceObj("ngramRepeat", this,
      "graft.functions.NgramRepeatStats")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $selfRef.evalStats($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  /** Codegen entry point. */
  def evalStats(arr: ArrayData): ArrayData = compute(arr)

  override protected def withNewChildInternal(newChild: Expression): NgramRepeatStats =
    copy(child = newChild)
}

/** Unicode NFC normalization of a string column — the canonical-composition
  * step of corpus cleaning (decomposed e + U+0301 → é), via the JDK's
  * `java.text.Normalizer`. Not allocation-free (Normalizer works on
  * java.lang.String), but a narrow map with zero shuffle; the fast path
  * skips the round-trip entirely for text that is already NFC (ASCII and
  * most web text — `Normalizer.isNormalized` is a cheap scan).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${dt.catalogString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Called from generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
