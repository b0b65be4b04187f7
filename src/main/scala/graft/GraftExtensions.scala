package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark-native deployment seam: `--conf
  * spark.sql.extensions=graft.GraftExtensions` registers the engine's custom
  * Catalyst expressions in EVERY session built over that config — the
  * zero-code-change route for `spark-submit` / Thrift / notebook users.
  * [[graft.functions.register]] is the imperative equivalent for sessions
  * the caller already holds; both routes register the same builders, so the
  * SQL surface (`jaro_winkler`, `token_jaccard`) is identical.
  *
  * (The third custom expression family, [[graft.functions.SparseWeightSum]] /
  * [[graft.functions.SparseWeightSumConj]], carries a collected model object
  * in its constructor and is therefore deliberately NOT SQL-registrable — it
  * is constructed by [[graft.pipeline.SparseFeatures.weightSum]] around a
  * specific model instance.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[graft.functions.JaroWinkler].getName,
        "jaro_winkler"),
      (exprs: Seq[Expression]) =>
        graft.functions.JaroWinkler(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("token_jaccard"),
      new ExpressionInfo(classOf[graft.functions.TokenJaccard].getName,
        "token_jaccard"),
      (exprs: Seq[Expression]) =>
        graft.functions.TokenJaccard(exprs(0), exprs(1))))
  }
}
