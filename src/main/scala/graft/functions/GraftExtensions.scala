package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql` users get them too:
  *
  *   spark.sql("SELECT graft_cosine(embedding, other) FROM t")
  *
  * Activated via `.withExtensions(new GraftExtensions)` (see
  * [[graft.Sessions]]) or `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(
      classOf[CosineSimilarity].getName, null, name, usage,
      /* arguments */ "", /* examples */ "", /* note */ "",
      /* group */ "misc_funcs", /* since */ "", /* deprecated */ "",
      /* source */ "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      info("graft_cosine",
        "graft_cosine(a, b) - cosine similarity of two float/double arrays"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot",
        "graft_dot(a, b) - dot product of two float/double arrays"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
  }
}
