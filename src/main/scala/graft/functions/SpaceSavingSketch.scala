package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch (Metwally et al., ICDT'05) as a
  * single-buffer typed imperative aggregate with MERGEABLE partials
  * (Agarwal et al., PODS'12) — the bounded-memory approximate top-k over a
  * string column that a 100 TB token/boilerplate census needs: memory is
  * `capacity` counters per group regardless of input size, updates are
  * map-side partials, and the shuffle carries one summary per group, never
  * the terms.
  *
  * Guarantees: every reported count is an OVERestimate with its error bound
  * carried alongside (`true ≤ cnt ≤ true + err`); any term whose true
  * frequency exceeds N/capacity is guaranteed present. When no counter was
  * ever evicted anywhere (capacity ≥ distinct terms per partition), every
  * `err` is 0 and the counts are EXACT — the property the DuckDB oracle
  * pins; under pressure the bounds degrade gracefully (spec-tested).
  *
  * Output: `array<struct<term:string, cnt:long, err:long>>` sorted by
  * (cnt DESC, term ASC) — deterministic regardless of hash-map iteration or
  * merge order (OpsSpec pins union-vs-single-partition equality).
  */
case class SpaceSavingSketch(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingSketch.Buffer]
  with UnaryLike[Expression] {
  import SpaceSavingSketch.Buffer

  require(capacity > 0, s"space_saving capacity must be positive, got $capacity")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"space_saving expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Buffer = new Buffer()

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, capacity)
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer =
    buf.mergeWith(other, capacity)

  override def eval(buf: Buffer): Any = {
    val rows = buf.sortedEntries.map { case (t, c, e) =>
      InternalRow(UTF8String.fromString(t), c, e)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val entries = buf.sortedEntries
    val blobs = entries.map { case (t, _, _) => t.getBytes(StandardCharsets.UTF_8) }
    val size = 8 + 4 + blobs.map(_.length + 4 + 16).sum
    val bb = ByteBuffer.allocate(size)
    bb.putLong(buf.floor)
    bb.putInt(entries.length)
    entries.zip(blobs).foreach { case ((_, c, e), b) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c); bb.putLong(e)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Buffer()
    buf.floor = bb.getLong
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len); bb.get(b)
      buf.counts.put(new String(b, StandardCharsets.UTF_8), (bb.getLong, bb.getLong))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SpaceSavingSketch =
    copy(child = newChild)
}

object SpaceSavingSketch {

  /** Mutable summary: term → (count, error) plus `floor`, the largest count
    * ever evicted from this summary — the overestimate assigned to terms the
    * summary no longer (or never) tracks. floor = 0 ⟺ nothing was ever
    * evicted ⟺ all counts exact. */
  final class Buffer {
    val counts = new java.util.HashMap[String, (Long, Long)]()
    var floor: Long = 0L

    def add(term: String, capacity: Int): Unit = {
      val cur = counts.get(term)
      if (cur != null) counts.put(term, (cur._1 + 1, cur._2))
      else if (counts.size < capacity) counts.put(term, (floor + 1, floor))
      else {
        // evict the deterministic minimum: (count ASC, term ASC)
        var minT: String = null; var minC = Long.MaxValue; var minE = 0L
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val en = it.next()
          val c = en.getValue._1
          if (c < minC || (c == minC && (minT == null || en.getKey.compareTo(minT) < 0))) {
            minT = en.getKey; minC = c; minE = en.getValue._2
          }
        }
        counts.remove(minT)
        if (minC > floor) floor = minC
        counts.put(term, (minC + 1, minC))
      }
    }

    /** Mergeable-summaries combine: each side contributes its tracked count,
      * or its `floor` (with matching error) for terms it does not track;
      * then trim back to `capacity` by evicting deterministic minima. */
    def mergeWith(other: Buffer, capacity: Int): Buffer = {
      val out = new Buffer()
      out.floor = this.floor + other.floor
      val keys = new java.util.TreeSet[String]()
      keys.addAll(this.counts.keySet()); keys.addAll(other.counts.keySet())
      val it = keys.iterator()
      while (it.hasNext) {
        val t = it.next()
        val a = this.counts.get(t); val b = other.counts.get(t)
        val (ca, ea) = if (a != null) a else (this.floor, this.floor)
        val (cb, eb) = if (b != null) b else (other.floor, other.floor)
        out.counts.put(t, (ca + cb, ea + eb))
      }
      while (out.counts.size > capacity) {
        var minT: String = null; var minC = Long.MaxValue
        val it2 = out.counts.entrySet().iterator()
        while (it2.hasNext) {
          val en = it2.next()
          val c = en.getValue._1
          if (c < minC || (c == minC && (minT == null || en.getKey.compareTo(minT) < 0))) {
            minT = en.getKey; minC = c
          }
        }
        out.counts.remove(minT)
        if (minC > out.floor) out.floor = minC
      }
      out
    }

    /** Entries sorted (cnt DESC, term ASC) — the deterministic output and
      * serialization order. */
    def sortedEntries: Seq[(String, Long, Long)] = {
      val b = Seq.newBuilder[(String, Long, Long)]
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val en = it.next()
        b += ((en.getKey, en.getValue._1, en.getValue._2))
      }
      b.result().sortBy { case (t, c, _) => (-c, t) }
    }
  }
}
