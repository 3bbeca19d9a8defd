package graft.sketch

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter CANDIDATE sketch: at most k counters, any
  * value occurring more than n/(k+1) times is guaranteed to survive
  * (Misra & Gries 1982; mergeable form per Agarwal et al. 2012).
  *
  * The summary content depends on merge order, so this aggregate is NOT
  * directly oracle-gatable — it is the candidate half of the same
  * candidates → exact-verify pattern the dedup operators use (LSH bands →
  * exact Jaccard): `Sketches.heavyHitters` re-counts only the ≤ k
  * candidate values exactly and filters on the true threshold, making the
  * composed result deterministic, partition-invariant, and replayable by
  * a plain GROUP BY/HAVING oracle. At 100 TB the win is the same as LSH's:
  * the full-cardinality groupBy shuffle is replaced by one bounded-state
  * pass plus a count over ≤ k surviving keys.
  *
  * State: ≤ k (key, count) pairs. Overflow decrements all counters
  * (evicting zeros); merge sums summaries then subtracts the (k+1)-th
  * largest count. Both keep the MG guarantee. Eval returns the candidate
  * keys sorted, for a deterministic array given a fixed input partition.
  */
case class MgCandidates(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(k >= 1, s"mg_candidates needs k >= 1, got $k")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mg_candidates"

  private type Buf = java.util.HashMap[String, java.lang.Long]

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(key)
      if (cur != null) buf.put(key, cur + 1L)
      else if (buf.size < k) buf.put(key, 1L)
      else {
        // Decrement-all step: drop one occurrence of every tracked key
        // and of the incoming key (which stays untracked).
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.forEach { (key, c) =>
      val cur = buf.get(key)
      buf.put(key, if (cur == null) c else cur + c)
    }
    if (buf.size > k) {
      // Subtract the (k+1)-th largest count from everything, evict <= 0.
      val counts = new Array[Long](buf.size)
      var i = 0
      buf.forEach { (_, c) => counts(i) = c; i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(buf.size - k - 1)
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= cut) it.remove() else e.setValue(e.getValue - cut)
      }
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    val keys = new Array[String](buf.size)
    var i = 0
    buf.forEach { (key, _) => keys(i) = key; i += 1 }
    java.util.Arrays.sort(keys.asInstanceOf[Array[AnyRef]])
    new GenericArrayData(keys.map(UTF8String.fromString(_)).toArray[Any])
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach { (key, c) =>
      val b = key.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Buf()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.put(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgCandidates =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgCandidates =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MgCandidates =
    copy(child = newChild)
}
