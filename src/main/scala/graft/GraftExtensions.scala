package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: registers the graft_* native
  * expressions at session build time, so any session created with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) can use them from SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import graft.expressions.GraftExpressions._

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_simhash64"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[SimHash64].getName, "graft_simhash64"),
        (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          SimHash64(es.head)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_minhash"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[MinHashSignature].getName, "graft_minhash"),
        (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          MinHashSignature(es.head, 64)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_cosine"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[CosineSimilarity].getName, "graft_cosine"),
        (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          CosineSimilarity(es(0), es(1))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_jaccard"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[JaccardSimilarity].getName, "graft_jaccard"),
        (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          JaccardSimilarity(es(0), es(1))))
  }
}
