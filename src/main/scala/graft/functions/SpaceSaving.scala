package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch (Metwally et al. 2005) as a
  * TypedImperativeAggregate — the bounded-state answer to "top
  * tokens / domains / shingles of a 100 TB corpus" where the exact
  * groupBy's key set IS the problem (10⁸⁺ distinct keys shuffle
  * gigabytes for a report wanting 100 rows; `q_heavy_shingles`'
  * exact rollup is the audit-scale sibling).
  *
  * State is EXACTLY k counters (item, count, err) per group,
  * independent of input size: update evicts the min-count entry and
  * charges its count as the newcomer's error bound (true count ∈
  * [count − err, count]); merge is the Agarwal et al. 2012
  * (mergeable-summaries) union — absent items are valued at the
  * other side's full-summary floor, then the union is trimmed back
  * to k. Every item with true frequency > N/k is guaranteed
  * captured. Partials flow through Spark's ObjectHashAggregate like
  * any typed aggregate: the shuffle carries k triples per partition
  * per group, never the key universe.
  *
  * Determinism contract: with k ≥ |distinct items| NO eviction ever
  * fires, the sketch degenerates to exact counts, and the output is
  * hash-comparable against the oracle's GROUP BY (how
  * `q_heavy_hitters` pins the plumbing); under eviction the content
  * depends on arrival order — the approximation regime is spec'd
  * single-partition (SketchSpec) where order is fixed.
  *
  * Output: ARRAY<STRUCT<item, est, err>> ordered by est DESC then
  * item — `inline`/`explode` it for row consumers.
  */
case class SpaceSavingTopK(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, (Long, Long)]] {
  require(k >= 1, "heavy_hitters capacity must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("est", LongType),
    StructField("err", LongType))), containsNull = false)
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, (Long, Long)] =
    mutable.HashMap.empty

  /** deterministic eviction victim: min count, then lexicographically
    * greatest item (so ties evict the "latest" alphabetical key). */
  private def victim(buf: mutable.HashMap[UTF8String, (Long, Long)]): (UTF8String, (Long, Long)) = {
    var best: (UTF8String, (Long, Long)) = null
    buf.foreach { kv =>
      if (best == null) best = kv
      else {
        val c = kv._2._1; val bc = best._2._1
        if (c < bc || (c == bc && kv._1.compareTo(best._1) > 0)) best = kv
      }
    }
    best
  }

  override def update(
      buf: mutable.HashMap[UTF8String, (Long, Long)],
      input: InternalRow): mutable.HashMap[UTF8String, (Long, Long)] = {
    val v = child.eval(input)
    if (v == null) return buf
    val item = v.asInstanceOf[UTF8String]
    buf.get(item) match {
      case Some((c, e)) => buf.update(item, (c + 1, e))
      case None if buf.size < k => buf.update(item.clone(), (1L, 0L))
      case None =>
        val (evItem, (evCount, _)) = victim(buf)
        buf.remove(evItem)
        buf.update(item.clone(), (evCount + 1, evCount))
    }
    buf
  }

  override def merge(
      a: mutable.HashMap[UTF8String, (Long, Long)],
      b: mutable.HashMap[UTF8String, (Long, Long)]): mutable.HashMap[UTF8String, (Long, Long)] = {
    // full-summary floor: an item absent from a FULL sketch may still
    // have occurred up to min-count times on that side
    def floor(m: mutable.HashMap[UTF8String, (Long, Long)]): Long =
      if (m.size < k) 0L else m.valuesIterator.map(_._1).min
    val fa = floor(a); val fb = floor(b)
    val out = mutable.HashMap.empty[UTF8String, (Long, Long)]
    (a.keySet ++ b.keySet).foreach { item =>
      val (ca, ea) = a.getOrElse(item, (fa, fa))
      val (cb, eb) = b.getOrElse(item, (fb, fb))
      out.update(item, (ca + cb, ea + eb))
    }
    if (out.size > k) {
      // trim back to k: keep largest counts (ties keep smaller item)
      val keep = out.toSeq.sortWith { case ((i1, (c1, _)), (i2, (c2, _))) =>
        c1 > c2 || (c1 == c2 && i1.compareTo(i2) < 0) }.take(k)
      out.clear(); keep.foreach { case (i, ce) => out.update(i, ce) }
    }
    out
  }

  override def eval(buf: mutable.HashMap[UTF8String, (Long, Long)]): Any = {
    val rows = buf.toSeq.sortWith { case ((i1, (c1, _)), (i2, (c2, _))) =>
        c1 > c2 || (c1 == c2 && i1.compareTo(i2) < 0) }
      .map { case (item, (c, e)) => InternalRow(item, c, e) }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, (c, e)) =>
      val b = item.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, (Long, Long)]
    var i = 0
    while (i < n) {
      val len = in.readInt(); val b = new Array[Byte](len); in.readFully(b)
      buf.update(UTF8String.fromBytes(b), (in.readLong(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}
