package graft.sketch

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Grouped top-k as a bounded-state aggregate: `topk_by(score, id, k)`
  * keeps the k largest (score, id) pairs per group.
  *
  * WHY: the idiomatic `row_number() OVER (PARTITION BY g ORDER BY s DESC)
  * <= k` does get Spark 4's WindowGroupLimit treatment (a Partial limit
  * before the shuffle trims what crosses it) — but each task still fully
  * SORTS its partition on (g, s) first, O(n log n) per partition, before
  * either limit applies. This aggregate keeps the k-bounded shuffle
  * footprint while replacing the sort with O(n log k) per-group heap
  * updates through the standard hash-aggregate path — no Sort operator
  * anywhere in the plan. At 100 TB with wide partitions that sort is the
  * dominant cost the heap removes.
  *
  * Ties are total-ordered by (score, id) — on equal scores the larger id
  * wins — so the result is deterministic and equals the window
  * formulation `ORDER BY score DESC, id DESC` exactly over DISTINCT
  * (score, id) pairs (GroupedTopKSpec). Duplicate input pairs collapse
  * (set semantics — the id is a row key); a caller whose ids are not
  * unique per group should disambiguate them first.
  * Output: array<struct<score double, id bigint>> sorted descending.
  */
case class TopKBy(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long)]]
  with ExpectsInputTypes with BinaryLike[Expression] {

  require(k >= 1, s"topk_by needs k >= 1, got $k")

  override def left: Expression = score
  override def right: Expression = id
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_by"

  private type Buf = java.util.TreeSet[(Double, Long)]

  // (score, id) ascending; the set's first element is the eviction
  // victim. Explicitly Serializable: the expression ships to executors,
  // and a bare SAM lambda Comparator is not.
  private val ord: java.util.Comparator[(Double, Long)] =
    new java.util.Comparator[(Double, Long)] with Serializable {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  override def createAggregationBuffer(): Buf = new java.util.TreeSet(ord)

  // A duplicate (score, id) pair is a no-op (set semantics — id is a row
  // key): crucially, eviction happens ONLY when the add actually grew
  // the set. The earlier spelling polled unconditionally after a
  // duplicate add, silently shrinking the result below k
  // (GroupedTopKSpec pins the duplicate case).
  private def admit(buf: Buf, p: (Double, Long)): Unit =
    if (buf.size < k) { buf.add(p); () }
    else if (ord.compare(p, buf.first) > 0 && buf.add(p)) { buf.pollFirst(); () }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      admit(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    val it = other.descendingIterator()
    var live = true
    while (live && it.hasNext) {
      val p = it.next()
      // other is descending: once one fails to qualify, the rest can't.
      if (buf.size < k || ord.compare(p, buf.first) > 0) admit(buf, p)
      else live = false
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.descendingIterator()
    var i = 0
    while (it.hasNext) {
      val p = it.next()
      out(i) = new GenericInternalRow(Array[Any](p._1, p._2))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val p = it.next(); bb.putDouble(p._1); bb.putLong(p._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKBy =
    copy(score = newLeft, id = newRight)
}

/** STRING-keyed grouped top-k: `topk_by_str(score, key, k)` keeps the
  * k best (score, key) pairs per group, "best" = highest score, ties
  * broken by LEXICOGRAPHICALLY SMALLEST key — i.e. exactly the window
  * formulation `row_number() OVER (... ORDER BY score DESC, key ASC)
  * <= k`, as a bounded-state hash aggregate with no Sort anywhere in
  * the plan (see [[TopKBy]] for why that matters at scale: a window
  * partitioned by a constant-cardinality key sorts N/|domain| rows in
  * one task). The key doubles as a payload channel: callers may append
  * ``-delimited payload to the key — for any delimiter below the
  * key alphabet, `k1 < k2  ⇒  k1+D+p1 < k2+D+p2`, so the tie order is
  * still pure key order (GroupedTopKSpec pins this).
  *
  * Output: array<struct<score double, id string>> best-first. */
case class TopKByStr(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Double, UTF8String)]]
  with ExpectsInputTypes with BinaryLike[Expression] {

  require(k >= 1, s"topk_by_str needs k >= 1, got $k")

  override def left: Expression = score
  override def right: Expression = id
  override def inputTypes: Seq[DataType] = Seq(DoubleType, StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", StringType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_by_str"

  private type Buf = java.util.TreeSet[(Double, UTF8String)]

  // Ascending by GOODNESS: the set's first element is the eviction
  // victim (lowest score; on equal scores the LARGEST key — smaller
  // keys win ties). Keys are UTF8String: its compareTo is UTF-8 BYTE
  // order = Unicode code-point order, the collation both engines'
  // ORDER BY key ASC uses (Java String.compareTo is UTF-16-unit order,
  // which disagrees past the BMP). Serializable as in TopKBy.
  private val ord: java.util.Comparator[(Double, UTF8String)] =
    new java.util.Comparator[(Double, UTF8String)] with Serializable {
      override def compare(a: (Double, UTF8String), b: (Double, UTF8String)): Int = {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else b._2.compareTo(a._2)
      }
    }

  override def createAggregationBuffer(): Buf = new java.util.TreeSet(ord)

  // Same duplicate discipline as TopKBy.admit: evict only when the add
  // grew the set (duplicate (score, key) rows are set no-ops).
  private def admit(buf: Buf, p: (Double, UTF8String)): Unit =
    if (buf.size < k) { buf.add(p); () }
    else if (ord.compare(p, buf.first) > 0 && buf.add(p)) { buf.pollFirst(); () }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      // clone(): the evaluated UTF8String may view a reused unsafe-row
      // buffer — storing the reference would corrupt the heap.
      admit(buf, (s.asInstanceOf[Double], i.asInstanceOf[UTF8String].clone()))
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    val it = other.descendingIterator()
    var live = true
    while (live && it.hasNext) {
      val p = it.next()
      if (buf.size < k || ord.compare(p, buf.first) > 0) admit(buf, p)
      else live = false
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.descendingIterator()
    var i = 0
    while (it.hasNext) {
      val p = it.next()
      out(i) = new GenericInternalRow(Array[Any](p._1, p._2))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val entries = {
      val it = buf.iterator()
      val b = Seq.newBuilder[(Double, Array[Byte])]
      while (it.hasNext) {
        val p = it.next()
        b += ((p._1, p._2.getBytes))
      }
      b.result()
    }
    val bb = ByteBuffer.allocate(4 + entries.map(12 + _._2.length).sum)
    bb.putInt(entries.size)
    entries.foreach { case (s, kb) =>
      bb.putDouble(s); bb.putInt(kb.length); bb.put(kb)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val s = bb.getDouble
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      buf.add((s, UTF8String.fromBytes(kb)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByStr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByStr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByStr =
    copy(score = newLeft, id = newRight)
}
