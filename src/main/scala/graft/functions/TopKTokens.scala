package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import scala.collection.mutable

/** SpaceSaving heavy-hitters sketch as a typed `Aggregator` (the UDAF
  * surface of SURVEY §2.C): tracks at most `capacity` keys per group;
  * when full, an arriving unseen key replaces the current minimum and
  * inherits its count + 1 (the classic Metwally et al. overestimate bound:
  * err ≤ N/capacity). With `capacity` ≥ distinct keys the counts are exact.
  *
  * Scale shape: the buffer is bounded at `capacity` entries regardless of
  * input size, partial aggregation runs map-side, and merge is a capped
  * count-sum — so a vocabulary count over 100 TB of text shuffles only
  * `groups × capacity` rows, never the token stream.
  */
class TopKTokensAgg(k: Int, capacity: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Seq[(String, Long)]] {

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(b: mutable.HashMap[String, Long], tok: String): mutable.HashMap[String, Long] = {
    b.get(tok) match {
      case Some(c) => b.update(tok, c + 1)
      case None =>
        if (b.size < capacity) b.update(tok, 1L)
        else {
          // O(capacity) min scan per eviction — fine while overflow is rare
          // (size capacity for the expected vocabulary); a count-ordered
          // bucket structure is the upgrade if eviction becomes hot
          val (mk, mv) = b.minBy(_._2)
          b.remove(mk)
          b.update(tok, mv + 1)
        }
    }
    b
  }

  /** Metwally-style sketch merge: a key absent from a FULL side may have
    * been evicted there with a count up to that side's minimum, so it
    * inherits that minimum (keeping every count an overestimate within the
    * documented bound). The combined map is then truncated to the
    * `capacity` largest; dropped keys had counts ≤ both sides' minima.
    */
  override def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    val minA = if (a.size >= capacity) a.values.min else 0L
    val minB = if (b.size >= capacity) b.values.min else 0L
    val out = mutable.HashMap.empty[String, Long]
    a.foreach { case (tok, c) => out.update(tok, c + b.getOrElse(tok, minB)) }
    b.foreach { case (tok, c) => if (!a.contains(tok)) out.update(tok, c + minA) }
    if (out.size <= capacity) out
    else {
      val keep = out.toSeq.sortBy { case (t, c) => (-c, t) }.take(capacity)
      val trimmed = mutable.HashMap.empty[String, Long]
      keep.foreach { case (t, c) => trimmed.update(t, c) }
      trimmed
    }
  }

  override def finish(b: mutable.HashMap[String, Long]): Seq[(String, Long)] =
    b.toSeq.sortBy { case (t, c) => (-c, t) }.take(k)

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}

object TopKTokens {
  /** Column function: heavy-hitter (token, count) list per group. */
  def topK(tokens: Column, k: Int, capacity: Int = 1 << 16): Column =
    udaf(new TopKTokensAgg(k, capacity), Encoders.STRING)(tokens)
}
