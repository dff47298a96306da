package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact "edit distance ≤ 1" as a straight two-pointer scan.
  *
  * The record-linkage comparator only ever asks one question of a name
  * pair — within one edit? — and a generic Levenshtein DP (even Spark's
  * thresholded, banded form) answers it with a per-call working array and
  * band bookkeeping. For threshold 1 the DP is overkill: two strings are
  * within one edit iff they are equal, or equal-length with exactly one
  * differing position, or length-±1 with the longer equal to the shorter
  * after deleting one position — all decidable in a single left-to-right
  * scan with O(1) state. Measured on the linkage block join (9M pairs at
  * sf0.1) the DP comparator cost ~10 s; this scan is allocation-free on
  * ASCII and runs inside whole-stage codegen.
  *
  * Parity contract: agrees with `levenshtein(a, b) <= 1` (both engines
  * count codepoint edits) — the ASCII fast path walks UTF-8 bytes (byte
  * edits ≡ codepoint edits when every byte is ASCII), anything else falls
  * back to a codepoint-array scan. NULL in, NULL out.
  */
object StringEditOps {

  def within1(a: UTF8String, b: UTF8String): Boolean = {
    if (a.equals(b)) return true
    val na = a.numBytes()
    val nb = b.numBytes()
    // ASCII ⇔ byte count == codepoint count; then byte positions are
    // codepoint positions and the scan below is exact codepoint editing
    if (na == a.numChars() && nb == b.numChars()) withinOneAscii(a, b, na, nb)
    else withinOneCp(a.toString.codePoints().toArray,
      b.toString.codePoints().toArray)
  }

  private def withinOneAscii(a: UTF8String, b: UTF8String, na: Int, nb: Int): Boolean = {
    if (na == nb) {
      var diff = 0
      var i = 0
      while (i < na) {
        if (a.getByte(i) != b.getByte(i)) { diff += 1; if (diff > 1) return false }
        i += 1
      }
      true // diff == 1 here (equality handled by caller)
    } else if (na - nb == 1 || nb - na == 1) {
      val (l, s, ns) = if (na > nb) (a, b, nb) else (b, a, na)
      var i = 0
      while (i < ns && l.getByte(i) == s.getByte(i)) i += 1
      // one deletion at i: the longer's remainder must match shifted by one
      while (i < ns) {
        if (l.getByte(i + 1) != s.getByte(i)) return false
        i += 1
      }
      true
    } else false
  }

  private def withinOneCp(x: Array[Int], y: Array[Int]): Boolean = {
    val nx = x.length
    val ny = y.length
    if (nx == ny) {
      var diff = 0
      var i = 0
      while (i < nx) {
        if (x(i) != y(i)) { diff += 1; if (diff > 1) return false }
        i += 1
      }
      diff <= 1
    } else if (nx - ny == 1 || ny - nx == 1) {
      val (l, s) = if (nx > ny) (x, y) else (y, x)
      var i = 0
      while (i < s.length && l(i) == s(i)) i += 1
      while (i < s.length) {
        if (l(i + 1) != s(i)) return false
        i += 1
      }
      true
    } else false
  }
}

/** Boolean column: levenshtein(left, right) ≤ 1, via [[StringEditOps]]. */
case class EditWithinOne(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "edit_within1"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"edit_within1 needs two string args, got ${left.dataType} / ${right.dataType}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringEditOps.within1(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringEditOps.within1($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StringFunctions {

  /** `levenshtein(a, b) <= 1` as a codegen'd O(len) two-pointer column. */
  def editWithin1(a: Column, b: Column): Column =
    GraftSql.column(EditWithinOne(GraftSql.expression(a), GraftSql.expression(b)))

  /** Arity-checked SQL builder (same contract as `vec_dot`). */
  def editWithin1Builder(children: Seq[Expression]): Expression = {
    if (children.length != 2)
      GraftSql.analysisError(
        s"edit_within1 requires exactly 2 arguments, got ${children.length}")
    EditWithinOne(children.head, children(1))
  }
}

/** NFD-decompose, drop combining marks (Unicode category M), recompose
  * nothing — the classic accent strip (DuckDB's `strip_accents`, ICU's
  * Latin-ASCII fold for precomposed Latin input). Text pipelines run this
  * before hashing/matching so "café" and "cafe" collide; the kernel is
  * static and allocation-free on the ASCII fast path, so the expression
  * stays inside whole-stage codegen like [[StringEditOps]]. */
object UnicodeOps {

  def stripAccents(s: UTF8String): UTF8String = {
    // ASCII fast path: nothing to decompose (byte count == char count)
    if (s.numBytes() == s.numChars()) return s
    val nfd = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK && t != Character.COMBINING_SPACING_MARK
          && t != Character.ENCLOSING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}

/** String column: accents stripped via [[UnicodeOps]]. NULL in, NULL out. */
case class StripAccents(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "strip_accents"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"strip_accents needs a string arg, got $other")
  }

  override protected def nullSafeEval(v: Any): Any =
    UnicodeOps.stripAccents(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.UnicodeOps.stripAccents($v)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeFunctions {

  /** Accent-stripped column (codegen'd; DuckDB `strip_accents` parity). */
  def stripAccents(c: Column): Column =
    GraftSql.column(StripAccents(GraftSql.expression(c)))
}
