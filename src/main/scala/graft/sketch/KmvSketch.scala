package graft.sketch

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** K-minimum-values distinct-count sketch as a native Catalyst aggregate.
  *
  * WHY a custom aggregate: Spark's `approx_count_distinct` (HLL++) is the
  * usual answer, but its estimate is engine-private — no external oracle
  * can reproduce it. KMV over an md5-derived hash is exactly as mergeable
  * and bounded (state = the k smallest distinct hash values) while being
  * reproducible in ANSI SQL (`row_number() <= k` + the estimator), so the
  * sketch itself can sit behind the DuckDB correctness gate
  * (`sketch_kmv_groups`). It is the engine's template for sketch-shaped
  * aggregation: bounded state, associative merge, map-side partial
  * aggregation through the standard hash-aggregate path.
  *
  * Input is a 60-bit non-negative hash column (`TextAnalysis.hash60Spark`
  * — first 15 hex digits of md5), uniform on [0, 2^60). Estimator: with
  * fewer than k distinct hashes seen the count is exact (the state holds
  * every distinct hash); otherwise est = (k-1) * 2^60 / h_k where h_k is
  * the k-th smallest hash (Bar-Yossef et al. 2002). All arithmetic is
  * IEEE-double in a fixed order, so the value is bit-identical to the
  * oracle's formulation.
  *
  * State is a TreeSet capped at k entries: update is O(log k), merge is
  * O(k log k), serialization is 4 + 8k bytes — executor memory per group
  * is bounded no matter how many rows a group holds at 100 TB.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(k >= 2, s"kmv_distinct needs k >= 2, got $k")

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // Only admit hashes that would be among the k smallest — avoids
      // add+evict churn once the sketch is saturated.
      if (buf.size < k) buf.add(h)
      else if (h < buf.last) { buf.add(h); if (buf.size > k) buf.pollLast() }
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (buf.size < k) buf.add(h)
      else if (h < buf.last) { buf.add(h); if (buf.size > k) buf.pollLast() }
      else return buf // other is sorted ascending: the rest can't qualify
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble * 1.152921504606846976e18 / buf.last.toDouble

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}
