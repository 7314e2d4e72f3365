package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, DotProduct}

/** Session-extension entry point: users enable the engine's Catalyst
  * extensions for every session with
  * `--conf spark.sql.extensions=graft.GraftExtensions`, making
  * `cosine_sim` / `dot_product` first-class SQL functions (SURVEY.md
  * §7.1(iii)). Per-session registration without extensions is
  * [[graft.functions.VectorFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) =>
        graft.functions.VectorFunctions.build2(
          "cosine_sim", CosineSimilarity.apply)(exprs)))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) =>
        graft.functions.VectorFunctions.build2(
          "dot_product", DotProduct.apply)(exprs)))
  }
}
