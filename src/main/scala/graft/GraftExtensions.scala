package graft

import graft.functions.{DotProduct, MinhashSignature, SortedIntersectSize, WinnowFingerprint}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Session extensions installing graft's native expressions
  * (`SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`).
  *
  * Only expressions whose composed-function form measurably loses
  * codegen live here (SURVEY §4.2: custom code confined to the
  * expression/aggregator layer; no custom Rule or Strategy is
  * needed anywhere in this engine). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_isect"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName, "graft_isect"),
      (children: Seq[Expression]) =>
        SortedIntersectSize(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowFingerprint].getName, "graft_winnow"),
      (children: Seq[Expression]) => (children(1), children(2)) match {
        case (Literal(k: Int, _), Literal(w: Int, _)) =>
          WinnowFingerprint(children.head, k, w)
        case other => throw new IllegalArgumentException(
          s"graft_winnow(text, k, w): k and w must be integer literals, got $other")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinhashSignature].getName, "graft_minhash"),
      (children: Seq[Expression]) => children(1) match {
        case Literal(n: Int, _) => MinhashSignature(children.head, n)
        case other => throw new IllegalArgumentException(
          s"graft_minhash(hashes, n): n must be an integer literal, got $other")
      }))
  }
}
