package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k-per-group as a TypedImperativeAggregate — the
  * map-side-combinable alternative to the
  * `row_number() OVER (PARTITION BY g ORDER BY s DESC) <= k` window.
  *
  * Why it exists: the window formulation shuffles and per-key sorts
  * EVERY row of every group before discarding all but k — at 100 TB
  * the discarded traffic IS the query cost. This aggregate keeps a
  * k-element heap per group in the hash-aggregate's partial state, so
  * each map task ships at most k (key, payload) pairs per group and
  * the merge is heap-union-trim — the per-group analog of Spark's
  * global `TakeOrderedAndProject`. The reference hand-rolls the same
  * bounded structure for its ORDER BY + LIMIT delivery
  * (`dbcon/joblist/limitedorderby.cpp`).
  *
  * Contract: `key` is a BIGINT ranking key, DESCENDING, and must be
  * UNIQUE within the group (pack a tie-break into the low bits — the
  * composite-key pattern `q_top_per_group` shows); payload is any
  * string. Uniqueness makes the result set — and hence the oracle
  * hash — deterministic under any partitioning or merge order.
  * Output: ARRAY<STRUCT<key, payload>> sorted key-descending;
  * `inline` it for row consumers.
  */
case class TopKPerGroup(
    key: Expression, payload: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, UTF8String)]] {
  require(k >= 1, "top_k_per_group capacity must be >= 1")

  override def children: Seq[Expression] = Seq(key, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType),
    StructField("payload", StringType))), containsNull = false)
  override def prettyName: String = "top_k_per_group"

  // min-heap on key: the root is the smallest of the kept top-k and
  // the first evicted when a larger key arrives
  private val minFirst: Ordering[(Long, UTF8String)] =
    Ordering.by[(Long, UTF8String), Long](_._1).reverse

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, UTF8String)] =
    mutable.PriorityQueue.empty(minFirst)

  override def update(
      buf: mutable.PriorityQueue[(Long, UTF8String)],
      input: InternalRow): mutable.PriorityQueue[(Long, UTF8String)] = {
    val kv = key.eval(input)
    if (kv == null) return buf
    val kk = kv.asInstanceOf[Long]
    if (buf.size < k) {
      val p = payload.eval(input)
      buf.enqueue((kk, if (p == null) null else p.asInstanceOf[UTF8String].clone()))
    } else if (buf.head._1 < kk) {
      buf.dequeue()
      val p = payload.eval(input)
      buf.enqueue((kk, if (p == null) null else p.asInstanceOf[UTF8String].clone()))
    }
    buf
  }

  override def merge(
      a: mutable.PriorityQueue[(Long, UTF8String)],
      b: mutable.PriorityQueue[(Long, UTF8String)]): mutable.PriorityQueue[(Long, UTF8String)] = {
    b.foreach { kv =>
      if (a.size < k) a.enqueue(kv)
      else if (a.head._1 < kv._1) { a.dequeue(); a.enqueue(kv) }
    }
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Long, UTF8String)]): Any = {
    val rows = buf.toSeq.sortBy(-_._1)
      .map { case (kk, p) => InternalRow(kk, p) }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, UTF8String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (kk, p) =>
      out.writeLong(kk)
      if (p == null) out.writeInt(-1)
      else { val pb = p.getBytes; out.writeInt(pb.length); out.write(pb) }
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, UTF8String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val kk = in.readLong()
      val len = in.readInt()
      val p = if (len < 0) null else {
        val pb = new Array[Byte](len); in.readFully(pb); UTF8String.fromBytes(pb)
      }
      buf.enqueue((kk, p))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKPerGroup =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPerGroup =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(key = cs(0), payload = cs(1))
}
