package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MySQL GROUP_CONCAT / JSON_ARRAYAGG as distributed
  * TypedImperativeAggregates — the one aggregate family the reference
  * implements with dedicated coordinator-side machinery
  * (`dbcon/joblist/groupconcat.cpp:101-162` `GroupConcator` /
  * `GroupConcatOrderBy`, `jsonarrayagg.cpp`), because unlike SUM/AVG
  * it must carry ORDER BY / SEPARATOR / DISTINCT / max-length
  * semantics through the partial→merge tree.
  *
  * Distribution: partials accumulate (sortKey, value) pairs per
  * partition, merge concatenates buffers, and the final eval sorts,
  * dedups, truncates, and joins — exactly the reference's
  * PM-partial → UM-final shape. Output is truncated at `maxLen`
  * chars (the analog of group_concat_max_len, enforced by the
  * reference in `GroupConcator::outputBuf`). Because ORDER BY means
  * any element may sort first, the pre-sort state is O(group size),
  * same as the reference's GroupConcatOrderBy — at 100 TB a query
  * concatenating a hot group should aggregate per sub-key first or
  * rely on the maxLen contract; the partial buffers themselves spill
  * with Spark's ObjectHashAggregate fallback machinery.
  */
abstract class ConcatLikeAgg extends TypedImperativeAggregate[ArrayBuffer[(Any, UTF8String)]] {

  def value: Expression
  def sortKey: Expression
  def ascending: Boolean
  def distinct: Boolean
  def maxLen: Int

  override def children: Seq[Expression] = Seq(value, sortKey)
  override def nullable: Boolean = true
  override def dataType: DataType = StringType

  private lazy val keyOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(sortKey.dataType).asInstanceOf[Ordering[Any]]

  protected def hasExplicitOrder: Boolean = true

  override def createAggregationBuffer(): ArrayBuffer[(Any, UTF8String)] = ArrayBuffer.empty

  override def update(
      buf: ArrayBuffer[(Any, UTF8String)], input: InternalRow): ArrayBuffer[(Any, UTF8String)] = {
    val v = value.eval(input)
    if (v != null) {
      // Copy: eval may return views into reused row buffers.
      val sv = v.asInstanceOf[UTF8String].clone()
      val k = sortKey.eval(input) match {
        case u: UTF8String => u.clone()
        case other => other
      }
      buf += ((k, sv))
    }
    buf
  }

  override def merge(
      a: ArrayBuffer[(Any, UTF8String)],
      b: ArrayBuffer[(Any, UTF8String)]): ArrayBuffer[(Any, UTF8String)] = a ++= b

  /** Render the sorted, dedup'd, truncated element list. */
  protected def renderElements(elems: Seq[UTF8String]): UTF8String

  override def eval(buf: ArrayBuffer[(Any, UTF8String)]): Any = {
    if (buf.isEmpty) return null
    val sorted =
      if (ascending) buf.sortBy(_._1)(keyOrdering) else buf.sortBy(_._1)(keyOrdering.reverse)
    var elems: Seq[UTF8String] = sorted.map(_._2).toSeq
    if (distinct) {
      val seen = scala.collection.mutable.LinkedHashSet.empty[UTF8String]
      elems.foreach(seen.add)
      elems = seen.toSeq
    }
    renderElements(elems)
  }

  override def serialize(buf: ArrayBuffer[(Any, UTF8String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, v) =>
      writeKey(out, k)
      val vb = v.getBytes
      out.writeInt(vb.length); out.write(vb)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Any, UTF8String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[(Any, UTF8String)](n)
    var i = 0
    while (i < n) {
      val k = readKey(in)
      val len = in.readInt(); val vb = new Array[Byte](len); in.readFully(vb)
      buf += ((k, UTF8String.fromBytes(vb)))
      i += 1
    }
    buf
  }

  private def writeKey(out: DataOutputStream, k: Any): Unit = k match {
    case null => out.writeByte(0)
    case u: UTF8String =>
      out.writeByte(1); val b = u.getBytes; out.writeInt(b.length); out.write(b)
    case l: Long => out.writeByte(2); out.writeLong(l)
    case i: Int => out.writeByte(3); out.writeInt(i)
    case d: Double => out.writeByte(4); out.writeDouble(d)
    case s: Short => out.writeByte(5); out.writeShort(s.toInt)
    case b: Byte => out.writeByte(6); out.writeByte(b.toInt)
    case f: Float => out.writeByte(7); out.writeFloat(f)
    case b: Boolean => out.writeByte(8); out.writeBoolean(b)
    case d: org.apache.spark.sql.types.Decimal =>
      out.writeByte(9); val s = d.toJavaBigDecimal.toString
      val b = s.getBytes("UTF-8"); out.writeInt(b.length); out.write(b)
    case other => throw new UnsupportedOperationException(
      s"group_concat sort key type not supported: ${other.getClass}")
  }

  private def readKey(in: DataInputStream): Any = in.readByte() match {
    case 0 => null
    case 1 => val l = in.readInt(); val b = new Array[Byte](l); in.readFully(b)
      UTF8String.fromBytes(b)
    case 2 => in.readLong()
    case 3 => in.readInt()
    case 4 => in.readDouble()
    case 5 => in.readShort()
    case 6 => in.readByte()
    case 7 => in.readFloat()
    case 8 => in.readBoolean()
    case 9 => val l = in.readInt(); val b = new Array[Byte](l); in.readFully(b)
      Decimal(new java.math.BigDecimal(new String(b, "UTF-8")))
  }
}

/** GROUP_CONCAT(value ORDER BY sortKey [ASC|DESC] SEPARATOR sep),
  * truncated at maxLen output chars like group_concat_max_len. */
case class GroupConcat(
    value: Expression,
    sortKey: Expression,
    separator: String,
    ascending: Boolean = true,
    distinct: Boolean = false,
    maxLen: Int = 1024 * 1024,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends ConcatLikeAgg {

  override def prettyName: String = "group_concat"
  override def withNewMutableAggBufferOffset(o: Int): GroupConcat = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GroupConcat = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(value = c(0), sortKey = c(1))

  override protected def renderElements(elems: Seq[UTF8String]): UTF8String = {
    val sb = new java.lang.StringBuilder
    var first = true
    val it = elems.iterator
    while (it.hasNext && sb.length < maxLen) {
      if (!first) sb.append(separator)
      sb.append(it.next().toString)
      first = false
    }
    val s = if (sb.length > maxLen) sb.substring(0, maxLen) else sb.toString
    UTF8String.fromString(s)
  }
}

/** JSON_ARRAYAGG(value ORDER BY sortKey) — compact JSON array text.
  * `valueIsJson` controls whether elements embed as JSON documents or
  * as JSON strings (ref jsonarrayagg.cpp distinguishes the same). */
case class JsonArrayAgg(
    value: Expression,
    sortKey: Expression,
    valueIsJson: Boolean = false,
    ascending: Boolean = true,
    distinct: Boolean = false,
    maxLen: Int = Int.MaxValue,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends ConcatLikeAgg {

  override def prettyName: String = "json_arrayagg"
  override def withNewMutableAggBufferOffset(o: Int): JsonArrayAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): JsonArrayAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(value = c(0), sortKey = c(1))

  private val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  override protected def renderElements(elems: Seq[UTF8String]): UTF8String = {
    val sb = new java.lang.StringBuilder("[")
    var first = true
    elems.foreach { e =>
      if (!first) sb.append(",")
      if (valueIsJson) sb.append(e.toString)
      else sb.append(jsonMapper.writeValueAsString(e.toString))
      first = false
    }
    sb.append("]")
    UTF8String.fromString(sb.toString)
  }
}

object ConcatAggs {
  /** SQL-surface registration (idempotent per session):
    *  group_concat(value, sortKey, separator)
    *  group_concat_distinct(value, sortKey, separator)
    *  group_concat_desc(value, sortKey, separator)
    *  json_arrayagg(value, sortKey)
    * Fixed arities: Spark's parser has no WITHIN-GROUP syntax to hang
    * the modifiers on, so they're encoded in the function name — the
    * same trick the reference's plugin uses for its UDAF surface. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def sep(e: Expression): String =
      e.eval(null).asInstanceOf[UTF8String].toString
    reg.createOrReplaceTempFunction("group_concat",
      es => GroupConcat(es(0), es(1), sep(es(2))), "built-in")
    reg.createOrReplaceTempFunction("group_concat_distinct",
      es => GroupConcat(es(0), es(1), sep(es(2)), distinct = true), "built-in")
    reg.createOrReplaceTempFunction("group_concat_desc",
      es => GroupConcat(es(0), es(1), sep(es(2)), ascending = false), "built-in")
    reg.createOrReplaceTempFunction("json_arrayagg",
      es => JsonArrayAgg(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("group_concat_maxlen",
      es => GroupConcat(es(0), es(1), sep(es(2)),
        maxLen = es(3).eval(null).asInstanceOf[Int]), "built-in")
  }
}
