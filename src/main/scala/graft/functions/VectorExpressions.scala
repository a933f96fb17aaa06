package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the vector hot loops.
  *
  * Spark's higher-order functions (`transform`/`zip_with`/`aggregate`) are
  * CodegenFallback — every row pays interpreted lambda dispatch plus an
  * intermediate products array. On the similarity queries that loop is THE
  * workload (|pairs| × dim multiplies), so these expressions fuse it into
  * whole-stage codegen: one pass, three scalar accumulators, no
  * allocation. Semantics (and float→double widening + sequential
  * accumulation order) exactly match the HOF formulation they replace, so
  * the DuckDB oracle is unchanged.
  */
abstract class VectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  protected def get(arr: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case _ => arr.getDouble(i)
  }

  /** Java accessor snippet for element i of an array variable. */
  protected def getJava(v: String, t: DataType, i: String): String = t match {
    case FloatType => s"(double) $v.getFloat($i)"
    case _ => s"$v.getDouble($i)"
  }
}

/** dot(a, b) = Σ a_i · b_i. Null on null input, length mismatch, or null
  * element (mirrors zip_with's null propagation).
  */
case class DotProd(left: Expression, right: Expression) extends VectorFold {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    val (lt, rt) = (elemType(left), elemType(right))
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += get(x, lt, i) * get(y, rt, i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (lt, rt) = (elemType(left), elemType(right))
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            $s += (${getJava(a, lt, i)}) * (${getJava(b, rt, i)});
          }
          if (!${ev.isNull}) ${ev.value} = $s;
        }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot / (‖a‖·‖b‖), fused into a single pass with three
  * accumulators — identical result to dot/l2norm/l2norm computed
  * separately (independent sequential sums), at a third of the reads.
  */
case class CosineSim(left: Expression, right: Expression) extends VectorFold {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    val (lt, rt) = (elemType(left), elemType(right))
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = get(x, lt, i); val yv = get(y, rt, i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (lt, rt) = (elemType(left), elemType(right))
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
          double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            double $xv = ${getJava(a, lt, i)};
            double $yv = ${getJava(b, rt, i)};
            $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
          }
          if (!${ev.isNull})
            ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorExpressions {
  /** Codegen'd cosine similarity over float/double array columns. */
  def cosineSim(a: Column, b: Column): Column =
    ColumnShim.column(CosineSim(ColumnShim.expr(a), ColumnShim.expr(b)))

  /** Codegen'd dot product over float/double array columns. */
  def dotProd(a: Column, b: Column): Column =
    ColumnShim.column(DotProd(ColumnShim.expr(a), ColumnShim.expr(b)))
}
