package graft.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the engine's native expressions.
  *
  * Two registration paths:
  *  - `SparkSession.builder().withExtensions(new GraftExtensions)` (or
  *    `spark.sql.extensions=graft.expressions.GraftExtensions`) injects the
  *    functions at session build time;
  *  - `GraftExtensions.register(spark)` adds them to a live session.
  *
  * After either, `spark.sql("SELECT graft_cosine(a, b) ...")` plans the
  * codegen CosineSimilarityExpr directly — no UDF indirection.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {

  private def f(name: String, usage: String, builder: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft.expressions", name, usage),
      builder)

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    f("graft_cosine", "graft_cosine(a, b) - cosine similarity of two float arrays",
      exprs => CosineSimilarityExpr(exprs(0), exprs(1))),
    f("graft_chunk",
      "graft_chunk(doc_id, text[, chunk_size, overlap]) - LATERAL VIEW table " +
        "generator emitting (chunk_id, content, chunk_index, word_count, " +
        "start_char, end_char) chunk rows; defaults 1000/200",
      exprs => ChunkGenerator(exprs)))

  /** Register on an existing session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
