package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-group top-k as a bounded-heap typed aggregation.
  *
  * The window form (`row_number().over(partitionBy(key).orderBy(...))
  * <= k`) must sort every group in full; this aggregator keeps only k
  * (id, score) entries per state, so the map-side combine ships k rows
  * per key per partition and no sort ever sees more than the buffer —
  * the right top-k-per-group shape at 100 TB fact-table scale.
  *
  * Ordering is total — (score DESC, id ASC) — so reduce/merge are
  * associative-with-commutative-merge over a deterministic result set:
  * identical output under any partitioning (the driver-oracle
  * determinism contract). Entries are kept sorted (k is small); insert
  * is O(k), merge O(k).
  */
class TopKByScore(k: Int)
  extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {

  require(k > 0, s"top-k needs k > 0, got $k")

  private def lt(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  private def trim(s: Seq[(Long, Double)]): Seq[(Long, Double)] =
    s.sortWith(lt).take(k)

  override def zero: Seq[(Long, Double)] = Vector.empty

  override def reduce(buf: Seq[(Long, Double)],
                      in: (Long, Double)): Seq[(Long, Double)] =
    // only insert when the candidate can place (buffer stays sorted)
    if (buf.length >= k && !lt(in, buf.last)) buf
    else trim(buf :+ in)

  override def merge(a: Seq[(Long, Double)],
                     b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Long, Double)]): Seq[(Long, Double)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}
