package graft.sketch

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch counter matrix (Cormode & Muthukrishnan 2005): depth
  * rows × width counters; row r increments cell hash_r(key) mod width.
  * Point estimate = min over rows of the addressed cell — always ≥ the
  * true count, within n·e/width with probability 1 − e^-depth.
  *
  * Unlike Misra-Gries, the STATE ITSELF is merge-order invariant (counter
  * matrices add elementwise — commutative and associative), so the full
  * sketch is deterministic under any partitioning, and because row
  * hashing goes through the engine-public md5/hash60 recipe
  * (TextAnalysis.hash60Spark: first 15 md5 hex digits) with a row-tag
  * prefix — hash_r(key) = hash60(r || ':' || key) mod width — a SQL
  * oracle can rebuild the identical matrix and estimates from a plain
  * GROUP BY: the estimates are hash-checkable, not just bounded.
  *
  * State: depth×width longs, fixed at plan time — the bounded-memory
  * frequency table for cardinalities where per-key groupBy state is the
  * scale hazard. Map-side partials merge through ObjectHashAggregate.
  */
case class CmsCounters(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16, s"cms_counters depth out of range: $depth")
  require(width >= 2, s"cms_counters width must be >= 2, got $width")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_counters"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      var r = 0
      while (r < depth) {
        buf(r * width + CountMin.rowIndex(r, key, width)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(java.lang.Long.valueOf).toArray[Any])

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsCounters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsCounters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsCounters =
    copy(child = newChild)
}

object CountMin {

  private val localMd = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** hash60 (first 15 md5 hex digits as a long — TextAnalysis's SQL
    * recipe, bit-identical on the JVM) of "r:key", mod width. Runs
    * depth× per input row inside CmsCounters.update, so the digest is
    * thread-local (reset per call) and the 60-bit value comes straight
    * from the digest bytes — the first 15 hex digits are bytes 0..6 plus
    * the high nibble of byte 7, no intermediate hex string. */
  def rowIndex(r: Int, key: String, width: Int): Int = {
    val md = localMd.get()
    md.reset()
    val b = md.digest(s"$r:$key".getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v = (v << 4) | ((b(7) & 0xf0L) >> 4)
    (v % width).toInt
  }

  /** JVM point estimate over an eval'd counter array. */
  def estimate(counters: Array[Long], depth: Int, width: Int, key: String): Long = {
    var m = Long.MaxValue
    var r = 0
    while (r < depth) {
      m = math.min(m, counters(r * width + rowIndex(r, key, width)))
      r += 1
    }
    m
  }
}
