package graft

import graft.functions.{CosineSim, DotProd, ShingleHash32}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.FunctionShim

/** SQL-surface registration of graft's native expressions, so
  * `spark.sql("SELECT cosine_sim(a.embedding, b.embedding) ...")` works
  * the same as the Column API.
  *
  * Two entry points, one builder table:
  *   - config: `spark.sql.extensions=graft.GraftExtensions` (applied at
  *     session build — the deployment path)
  *   - runtime: `GraftFunctions.register(spark)` on a live session (the
  *     notebook path; tests use this)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // size(array_intersect(..)) → fused IntersectSize kernel
    ext.injectOptimizerRule(_ => graft.functions.RewriteIntersectSize)
  }
}

object GraftFunctions {
  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim",
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two numeric arrays"),
      (es: Seq[Expression]) => CosineSim(es(0), es(1))),
    ("dot_prod",
      info("dot_prod", "dot_prod(a, b) - dot product of two numeric arrays"),
      (es: Seq[Expression]) => DotProd(es(0), es(1))),
    ("shingle_hash32",
      info("shingle_hash32",
        "shingle_hash32(text, k) - 32-bit md5 hashes of the distinct word k-shingles of text (k a literal)"),
      (es: Seq[Expression]) => {
        // k parameterizes the builder itself, so it must fold at plan
        // build; accept any integral literal and fail with analysis-time
        // context otherwise (not a deep runtime eval error).
        if (!es(1).foldable)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "NON_FOLDABLE_ARGUMENT",
            messageParameters = Map(
              "funcName" -> "`shingle_hash32`",
              "paramName" -> "`k`",
              "paramType" -> "\"INT\""))
        // One range check for every integral width: k must be >= 1 (a
        // 0/negative shingle size is meaningless — the kernel would
        // degenerate to hashing the empty string) and fit an Int.
        val k = es(1).eval() match {
          case i: Int if i >= 1 => i
          case l: Long if l >= 1 && l <= Int.MaxValue => l.toInt
          case s: Short if s >= 1 => s.toInt
          case b: Byte if b >= 1 => b.toInt
          case other => throw new org.apache.spark.sql.AnalysisException(
            errorClass = "INVALID_PARAMETER_VALUE.INTEGER",
            messageParameters = Map(
              "parameter" -> "`k`",
              "functionName" -> "`shingle_hash32`",
              "invalidValue" -> String.valueOf(other)))
        }
        ShingleHash32(es(0), k)
      }))

  /** Register on an existing session: SQL functions AND the optimizer
    * rewrites (`experimentalMethods.extraOptimizations` is the live-
    * session twin of `injectOptimizerRule`; appending twice would run the
    * rule twice per plan — harmless but sloppy — so guard on presence).
    */
  def register(spark: SparkSession): Unit = {
    all.foreach { case (name, i, builder) =>
      FunctionShim.register(spark, FunctionIdentifier(name), i, builder)
    }
    val em = spark.sessionState.experimentalMethods
    if (!em.extraOptimizations.contains(graft.functions.RewriteIntersectSize))
      em.extraOptimizations =
        em.extraOptimizations :+ graft.functions.RewriteIntersectSize
  }
}
