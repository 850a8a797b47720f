package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: the k smallest distinct-ish inputs per group as a
  * sorted comma-joined string — the SKEW-SAFE form of "first k members
  * per key". A window (`row_number over partitionBy(key)`) would carry
  * every row of a hot key into one task; this aggregator's state is
  * BOUNDED at k longs no matter how hot the key, it reduces map-side
  * (each input task contributes at most k values per key to the
  * shuffle), and merge is associative/commutative so the result is
  * independent of shuffle arrival order. Built for the inverted-index
  * posting-prefix operator (`q_text_postings`), reusable anywhere a
  * capped min-k per key is needed.
  */
final case class BoundedMinK(k: Int) extends Aggregator[Long, Array[Long], String] {
  require(k >= 1, s"k must be >= 1, got $k")
  override def zero: Array[Long] = Array.empty
  override def reduce(b: Array[Long], a: Long): Array[Long] = insert(b, a)
  override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    y.foldLeft(x)(insert)
  override def finish(r: Array[Long]): String = r.mkString(",")
  private def insert(b: Array[Long], a: Long): Array[Long] =
    if (b.length < k) (b :+ a).sorted
    else if (a >= b(k - 1)) b
    else { val out = b.updated(k - 1, a).sorted; out }
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
