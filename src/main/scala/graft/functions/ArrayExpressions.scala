package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, BinaryExpression, Expression, Size}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `intersect_size(a, b)` — the number of distinct elements common to two
  * integral arrays, semantically identical to `size(array_intersect(a,
  * b))` (including the both-sides-null-element case) but without
  * materializing the intersection ARRAY per row. `array_intersect` builds
  * an OpenHashSet plus a result ArrayData for every pair just so `size`
  * can read its length; on the shingle-overlap joins (containment,
  * Jaccard) that allocation is the per-pair hot loop. Here each side
  * collapses to a primitive sorted array and a linear merge counts the
  * distinct matches — zero boxed values, one small primitive scratch
  * allocation per side, whole-stage-codegen friendly (the generated code
  * is a single static call).
  *
  * Queries never write this expression: they declare the built-in
  * composition and [[RewriteIntersectSize]] (injected via
  * `SparkSessionExtensions.injectOptimizerRule` or
  * `experimentalMethods.extraOptimizations`) swaps it in — the Catalyst
  * way to optimize a composed idiom without changing query code.
  */
case class IntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "intersect_size"

  private def isLongElems: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (isLongElems) GraftArrayOps.intersectSizeLong(x, y)
    else GraftArrayOps.intersectSizeInt(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (isLongElems) "intersectSizeLong" else "intersectSizeInt"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GraftArrayOps.$m($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Primitive-array kernels behind [[IntersectSize]]: sort both sides'
  * non-null values, merge-count distinct common values, add one if BOTH
  * sides contain a null element (mirroring `array_intersect`, which
  * emits a single null in that case).
  */
object GraftArrayOps {
  def intersectSizeInt(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    val xs = new Array[Int](na); var nx = 0; var nullA = false
    var i = 0
    while (i < na) {
      if (a.isNullAt(i)) nullA = true else { xs(nx) = a.getInt(i); nx += 1 }
      i += 1
    }
    val ys = new Array[Int](nb); var ny = 0; var nullB = false
    i = 0
    while (i < nb) {
      if (b.isNullAt(i)) nullB = true else { ys(ny) = b.getInt(i); ny += 1 }
      i += 1
    }
    java.util.Arrays.sort(xs, 0, nx); java.util.Arrays.sort(ys, 0, ny)
    var c = if (nullA && nullB) 1 else 0
    var p = 0; var q = 0
    while (p < nx && q < ny) {
      val xv = xs(p); val yv = ys(q)
      if (xv == yv) {
        c += 1
        while (p < nx && xs(p) == xv) p += 1
        while (q < ny && ys(q) == yv) q += 1
      } else if (xv < yv) p += 1 else q += 1
    }
    c
  }

  def intersectSizeLong(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    val xs = new Array[Long](na); var nx = 0; var nullA = false
    var i = 0
    while (i < na) {
      if (a.isNullAt(i)) nullA = true else { xs(nx) = a.getLong(i); nx += 1 }
      i += 1
    }
    val ys = new Array[Long](nb); var ny = 0; var nullB = false
    i = 0
    while (i < nb) {
      if (b.isNullAt(i)) nullB = true else { ys(ny) = b.getLong(i); ny += 1 }
      i += 1
    }
    java.util.Arrays.sort(xs, 0, nx); java.util.Arrays.sort(ys, 0, ny)
    var c = if (nullA && nullB) 1 else 0
    var p = 0; var q = 0
    while (p < nx && q < ny) {
      val xv = xs(p); val yv = ys(q)
      if (xv == yv) {
        c += 1
        while (p < nx && xs(p) == xv) p += 1
        while (q < ny && ys(q) == yv) q += 1
      } else if (xv < yv) p += 1 else q += 1
    }
    c
  }
}

/** Optimizer rule: `size(array_intersect(a, b))` over integral-element
  * arrays → [[IntersectSize]]. Matches only the non-legacy `size`
  * (legacySizeOfNull returns −1 for null input; IntersectSize returns
  * null, like modern `size`) and only int/long elements (float equality
  * has NaN/-0.0 corner semantics the primitive merge must not guess at).
  * Runs post-analysis, so `ArrayIntersect` has already type-coerced both
  * sides to a common element type.
  */
object RewriteIntersectSize extends Rule[LogicalPlan] {
  private def integralElems(e: Expression): Boolean = e.dataType match {
    case ArrayType(IntegerType, _) | ArrayType(LongType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(ai @ ArrayIntersect(l, r), false) if integralElems(l) && integralElems(r) =>
      val _ = ai
      IntersectSize(l, r)
  }
}
