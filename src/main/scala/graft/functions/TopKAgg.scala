package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregate: keeps the k best (key DESC, tie ASC) payload
  * rows in a k-sized heap and returns them best-first as
  * `array<payload-struct>`.
  *
  * This is the SCALE-correct form of grouped top-k. The window form
  * (`row_number() OVER (PARTITION BY g ORDER BY …) <= k`) must shuffle and
  * sort EVERY row of every group before discarding all but k; this
  * aggregate is an ObjectHashAggregate with map-side partial aggregation —
  * each input partition reduces a group to ≤ k entries BEFORE the
  * exchange, so the shuffle carries O(k · partitions) rows per group
  * instead of the group's full row count, and nothing global ever sorts
  * (heap maintenance is O(log k) per row). The same boundedness makes it
  * streaming-legal under complete-mode aggregation: the state-store row
  * per group is the serialized k-heap, bounded by k however long the
  * stream runs — a window over a stream has no such bound.
  *
  * Determinism contract: ties on `key` break by `tie` ASC (callers pass a
  * unique id), so the kept set and its order are value-deterministic under
  * any partitioning and any merge order — the property every oracle-gated
  * consumer needs. The heap's worst element is replaced only on a STRICT
  * improvement, which together with the total (key, tie) order makes
  * update/merge order irrelevant.
  *
  * Sibling: [[TopKAgg]] is the typed Dataset-API form of the same heap
  * (Aggregator over (Double, Long) pairs, Kryo buffer); this Catalyst form
  * carries an arbitrary struct payload, serializes its buffer as raw
  * UnsafeRow bytes (no Kryo), and is usable from the DataFrame surface and
  * from streaming complete-mode aggregation.
  */
case class TopKByDesc(
    key: Expression, tie: Expression, payload: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByDesc.Buffer]
  with TernaryLike[Expression] {

  require(k > 0, s"topk_by_desc: k must be positive, got $k")

  // type validation must wait for analysis: at construction the Column
  // round-trip hands us UNRESOLVED children whose dataType is meaningless
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (key.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(s"topk_by_desc: key must be double, got ${key.dataType}")
    else if (tie.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"topk_by_desc: tie must be bigint, got ${tie.dataType}")
    else if (!payload.dataType.isInstanceOf[StructType])
      TypeCheckResult.TypeCheckFailure(s"topk_by_desc: payload must be a struct, got ${payload.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def first: Expression = key
  override def second: Expression = tie
  override def third: Expression = payload
  override def prettyName: String = "topk_by_desc"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(payload.dataType, containsNull = false)

  private def payloadType = payload.dataType.asInstanceOf[StructType]
  @transient private lazy val toUnsafe = UnsafeProjection.create(payloadType)

  override def createAggregationBuffer(): TopKByDesc.Buffer =
    new TopKByDesc.Buffer(k)

  override def update(b: TopKByDesc.Buffer, input: InternalRow): TopKByDesc.Buffer = {
    val kv = key.eval(input)
    if (kv != null) {
      val tv = tie.eval(input)
      val pv = payload.eval(input).asInstanceOf[InternalRow]
      // a nullable struct payload (e.g. the outer side of a join) can
      // evaluate to null even when the key is present — skip like a null key
      if (pv != null)
        b.insert(kv.asInstanceOf[Double],
          if (tv == null) 0L else tv.asInstanceOf[Long],
          toUnsafe(pv).copy())
    }
    b
  }

  override def merge(b: TopKByDesc.Buffer, o: TopKByDesc.Buffer): TopKByDesc.Buffer = {
    o.entries.foreach(e => b.insert(e.key, e.tie, e.payload))
    b
  }

  override def eval(b: TopKByDesc.Buffer): Any =
    new GenericArrayData(
      b.entries.toArray.sorted(TopKByDesc.worstFirst).map(_.payload: Any))

  override def serialize(b: TopKByDesc.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.entries.size)
    b.entries.foreach { e =>
      out.writeDouble(e.key)
      out.writeLong(e.tie)
      val bytes = e.payload.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKByDesc.Buffer = {
    val in = ByteBuffer.wrap(bytes)
    val b = new TopKByDesc.Buffer(k)
    val n = in.getInt
    var i = 0
    while (i < n) {
      val kv = in.getDouble
      val tv = in.getLong
      val len = in.getInt
      val pb = new Array[Byte](len)
      in.get(pb)
      val row = new UnsafeRow(payloadType.size)
      row.pointTo(pb, len)
      b.insert(kv, tv, row)
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByDesc =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByDesc =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): TopKByDesc =
    copy(key = newFirst, tie = newSecond, payload = newThird)
}

object TopKByDesc {
  final case class Entry(key: Double, tie: Long, payload: UnsafeRow)

  /** Heap order: the head is the WORST kept entry — smaller key ranks
    * "larger" (dequeued first), equal keys rank the LARGER tie worse. A
    * list `sorted(worstFirst)` is therefore best-first (compare < 0 means
    * "better", and sorting ascends). */
  private[functions] val worstFirst: Ordering[Entry] = new Ordering[Entry] {
    def compare(a: Entry, b: Entry): Int = {
      val c = java.lang.Double.compare(b.key, a.key)
      if (c != 0) c else java.lang.Long.compare(a.tie, b.tie)
    }
  }

  final class Buffer(k: Int) {
    private val heap = mutable.PriorityQueue.empty[Entry](worstFirst)
    def entries: Iterator[Entry] = heap.iterator
    def insert(key: Double, tie: Long, payload: UnsafeRow): Unit = {
      if (heap.size < k) heap.enqueue(Entry(key, tie, payload))
      else {
        val e = Entry(key, tie, payload)
        if (worstFirst.compare(e, heap.head) < 0) { heap.dequeue(); heap.enqueue(e) }
      }
    }
  }
}

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
