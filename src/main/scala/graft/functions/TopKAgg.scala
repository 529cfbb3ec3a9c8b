package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k aggregator: keeps only k (score, id) pairs per group
  * in a min-heap, so a global or per-group top-k costs O(n log k) memory-
  * bounded work with map-side partial aggregation — at 100 TB this replaces
  * a full global sort (`ORDER BY … LIMIT k` plans a range-partitioned sort;
  * Catalyst's TakeOrderedAndProject covers the global case, but per-group
  * top-k inside an aggregation needs this shape).
  *
  * Deterministic: ordering by (score desc, id asc); merge order cannot
  * change the resulting set.
  */
class TopKAgg(k: Int) extends Aggregator[(Double, Long), TopKAgg.Buf, Seq[(Double, Long)]] {
  import TopKAgg._

  override def zero: Buf = new Buf(new java.util.PriorityQueue[(Double, Long)](ord))

  override def reduce(b: Buf, a: (Double, Long)): Buf = { b.offer(a, k); b }

  override def merge(b1: Buf, b2: Buf): Buf = {
    b2.q.forEach(e => b1.offer(e, k))
    b1
  }

  override def finish(b: Buf): Seq[(Double, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    b.q.forEach(e => out += e)
    out.sortBy { case (s, id) => (-s, id) }.toSeq
  }

  override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object TopKAgg {
  /** Min-heap order on (score asc, id desc) so the heap head is the element
    * to evict — the WORST of the kept set under (score desc, id asc).
    * A named serializable class: the buffer (PriorityQueue + comparator)
    * ships through Kryo between partial and final aggregation. */
  private final class PairOrd extends java.util.Comparator[(Double, Long)] with Serializable {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    }
  }
  private val ord: java.util.Comparator[(Double, Long)] = new PairOrd

  final class Buf(val q: java.util.PriorityQueue[(Double, Long)]) extends Serializable {
    def offer(e: (Double, Long), k: Int): Unit = {
      if (q.size < k) q.offer(e)
      else if (ord.compare(e, q.peek()) > 0) { q.poll(); q.offer(e) }
    }
  }
}
