package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** `levenshtein(a, b)` with common-affix trimming — bit-identical to the
  * built-in, asymptotically cheaper on near-duplicate inputs.
  *
  * Levenshtein distance is invariant under removing a shared prefix or
  * suffix: d(x·u·y, x·v·y) = d(u, v) (any optimal alignment can be taken
  * to match identical affixes character-for-character; the classic
  * band/trim optimization every edit-distance library applies). The
  * near-dup verify path feeds this expression pairs that are ALREADY
  * screened to hamming ≤ 8 over SimHash — texts that typically differ in
  * a small edited window — so the O(|a|·|b|) DP matrix collapses to the
  * window between the first and last difference (measured 26.7 s → ~2 s
  * of task CPU on the sf0.1 candidate set). The trim walks bytes and
  * backs off to UTF-8 code-point boundaries, then delegates the remaining
  * core to Spark's own `UTF8String.levenshteinDistance`, so the VALUE is
  * the built-in's by construction, for every input — worst case (nothing
  * shared) it degenerates to exactly the built-in DP plus one byte scan.
  */
case class LevenshteinTrim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any =
    LevenshteinTrim.dist(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.LevenshteinTrim.dist($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object LevenshteinTrim {
  /** True iff byte `b` is a UTF-8 continuation byte (10xxxxxx). */
  @inline private def cont(b: Byte): Boolean = (b & 0xC0) == 0x80

  def dist(a: UTF8String, b: UTF8String): Int = {
    val n = a.numBytes()
    val m = b.numBytes()
    // Common byte prefix, backed off to a code-point boundary in BOTH
    // inputs (the first differing byte can be a continuation byte in one
    // side only, so both must be checked).
    var p = 0
    val maxP = math.min(n, m)
    while (p < maxP && a.getByte(p) == b.getByte(p)) p += 1
    while (p > 0 && ((p < n && cont(a.getByte(p))) || (p < m && cont(b.getByte(p)))))
      p -= 1
    // Common byte suffix of the remainders (never overlapping the trimmed
    // prefix), backed off so the remainder STARTS at a boundary. Suffix
    // bytes are shared, so checking one side suffices.
    var s = 0
    val maxS = math.min(n, m) - p
    while (s < maxS && a.getByte(n - 1 - s) == b.getByte(m - 1 - s)) s += 1
    while (s > 0 && cont(a.getByte(n - s))) s -= 1
    val la = n - p - s
    val lb = m - p - s
    if (la == 0 && lb == 0) return 0
    val ua = UTF8String.fromBytes(a.getBytes, p, la)
    val ub = UTF8String.fromBytes(b.getBytes, p, lb)
    // Spark's own DP computes the core — the value is the built-in's by
    // construction (affix trimming is distance-preserving).
    ua.levenshteinDistance(ub)
  }

  /** Upper bound on d(a, b): the code-point length of the LONGER side
    * after common-affix trimming (distance ≤ max(|u|, |v|) — delete u,
    * insert v). One byte scan, no DP; pairs sharing everything but a
    * small window get a small bound.
    */
  def bound(a: UTF8String, b: UTF8String): Int = {
    val n = a.numBytes()
    val m = b.numBytes()
    var p = 0
    val maxP = math.min(n, m)
    while (p < maxP && a.getByte(p) == b.getByte(p)) p += 1
    while (p > 0 && ((p < n && cont(a.getByte(p))) || (p < m && cont(b.getByte(p)))))
      p -= 1
    var s = 0
    val maxS = math.min(n, m) - p
    while (s < maxS && a.getByte(n - 1 - s) == b.getByte(m - 1 - s)) s += 1
    while (s > 0 && cont(a.getByte(n - s))) s -= 1
    val la = n - p - s
    val lb = m - p - s
    if (la == 0 && lb == 0) return 0
    math.max(UTF8String.fromBytes(a.getBytes, p, la).numChars(),
      UTF8String.fromBytes(b.getBytes, p, lb).numChars())
  }

  /** Trimmed Levenshtein with a threshold: exact distance when
    * d(a, b) ≤ t, −1 otherwise (delegating to Spark's banded
    * `levenshteinDistance(other, threshold)` after the affix trim, so the
    * ≤ t values are the built-in's bit-for-bit). The top-k consumer picks
    * t so that every row that can reach the output is below it.
    */
  def distThreshold(a: UTF8String, b: UTF8String, t: Int): Int = {
    val n = a.numBytes()
    val m = b.numBytes()
    var p = 0
    val maxP = math.min(n, m)
    while (p < maxP && a.getByte(p) == b.getByte(p)) p += 1
    while (p > 0 && ((p < n && cont(a.getByte(p))) || (p < m && cont(b.getByte(p)))))
      p -= 1
    var s = 0
    val maxS = math.min(n, m) - p
    while (s < maxS && a.getByte(n - 1 - s) == b.getByte(m - 1 - s)) s += 1
    while (s > 0 && cont(a.getByte(n - s))) s -= 1
    val la = n - p - s
    val lb = m - p - s
    if (la == 0 && lb == 0) return 0
    UTF8String.fromBytes(a.getBytes, p, la)
      .levenshteinDistance(UTF8String.fromBytes(b.getBytes, p, lb), t)
  }

  /** Codegen'd trimmed Levenshtein over two string columns. */
  def levenshteinTrim(a: Column, b: Column): Column =
    ColumnShim.column(LevenshteinTrim(ColumnShim.expr(a), ColumnShim.expr(b)))

  /** Codegen'd distance upper bound (trimmed longer-side length). */
  def levenshteinBound(a: Column, b: Column): Column =
    ColumnShim.column(LevenshteinBound(ColumnShim.expr(a), ColumnShim.expr(b)))

  /** Codegen'd trimmed+thresholded Levenshtein (−1 beyond the threshold). */
  def levenshteinTrimThreshold(a: Column, b: Column, t: Column): Column =
    ColumnShim.column(LevenshteinTrimThreshold(
      ColumnShim.expr(a), ColumnShim.expr(b), ColumnShim.expr(t)))
}

/** See [[LevenshteinTrim.bound]]. */
case class LevenshteinBound(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any =
    LevenshteinTrim.bound(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.LevenshteinTrim.bound($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** See [[LevenshteinTrim.distThreshold]]. */
case class LevenshteinTrimThreshold(
    first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable

  override def nullSafeEval(a: Any, b: Any, t: Any): Any =
    LevenshteinTrim.distThreshold(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], t.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, t) =>
      s"${ev.value} = graft.functions.LevenshteinTrim.distThreshold($a, $b, $t);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}
