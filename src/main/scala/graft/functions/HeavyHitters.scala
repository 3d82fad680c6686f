package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Misra-Gries heavy-hitters summary: at most `k` (item, weight) counters.
 *
 * Chosen over SpaceSaving because Misra-Gries is FULLY MERGEABLE (Agarwal,
 * Cormode, Huang, Phillips, Wei, Yi — "Mergeable Summaries", PODS 2012):
 * merging two MG summaries (add counts for the union, subtract the
 * (k+1)-th largest, keep positives) yields an MG summary of the combined
 * stream with NO error degradation beyond the additive n/(k+1) bound —
 * the guarantee survives Spark's arbitrary partial/final merge tree and
 * merge ORDER, which is what makes the error contract assertable in a
 * distributed query regardless of partitioning. SpaceSaving's per-item
 * error tracking degrades under repeated pairwise merges.
 *
 * Invariants (n = total stream weight, k = counter capacity):
 *  - UNDERESTIMATE: est(x) <= true(x) for every tracked item — decrements
 *    only ever remove weight that was genuinely added.
 *  - ERROR BOUND:   true(x) - est(x) <= floor(n / (k + 1)) for EVERY item
 *    (tracked or not; untracked means est = 0).
 *  - COVERAGE:      every x with true(x) > floor(n / (k + 1)) has
 *    est(x) > 0 and is therefore in the summary.
 *
 * The driver query (`tx_heavy_hitters`) asserts all three against exact
 * counts computed in the same query, q16-style: the emitted booleans are
 * deterministic (the THEOREM holds for every merge order) even though the
 * individual estimates are not, so the estimates are deliberately not
 * emitted.
 */
final class MGSummary(val k: Int) {
  val counts = new java.util.HashMap[String, Long]()

  def add(item: String, w: Long): Unit = {
    if (w > 0) {
      counts.put(item, counts.getOrDefault(item, 0L) + w)
      if (counts.size > k) shrink()
    }
  }

  /** Merge per the mergeable-summaries construction: union-add, then one
    * shrink pass if over capacity. */
  def mergeFrom(other: MGSummary): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      counts.put(e.getKey, counts.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    if (counts.size > k) shrink()
  }

  /** Subtract the (k+1)-th largest weight from every counter and drop the
    * non-positive ones — at most k survive (everything at or below the
    * pivot is eliminated). One O(size) quickselect-free pass: `size` is at
    * most 2k after a merge, so a sort is fine. */
  private def shrink(): Unit = {
    val ws = new Array[Long](counts.size)
    var i = 0
    val vit = counts.values().iterator()
    while (vit.hasNext) { ws(i) = vit.next(); i += 1 }
    java.util.Arrays.sort(ws)
    val pivot = ws(ws.length - (k + 1)) // (k+1)-th largest
    val eit = counts.entrySet().iterator()
    while (eit.hasNext) {
      val e = eit.next()
      val nw = e.getValue - pivot
      if (nw <= 0) eit.remove() else e.setValue(nw)
    }
  }

  /** (est desc, item asc) snapshot — deterministic output order. */
  def sorted: Array[(String, Long)] = {
    val arr = new Array[(String, Long)](counts.size)
    var i = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey, e.getValue); i += 1 }
    arr.sortBy { case (item, est) => (-est, item) }
  }
}

/**
 * `heavy_hitters(item, k)` — Misra-Gries summary as a Catalyst aggregate:
 * returns `array<struct<item: string, est: long>>` with at most k entries,
 * ordered (est DESC, item ASC). A [[TypedImperativeAggregate]], so each map
 * task reduces its partition to k counters BEFORE the exchange and the
 * shuffle carries O(groups x k) state — the frequent-token / frequent-domain
 * census shape for a 100 TB corpus where the exact per-token groupBy's
 * vocabulary-sized shuffle is the thing being avoided.
 */
case class HeavyHittersAgg(itemChild: Expression, kChild: Expression,
                           mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGSummary] with ExpectsInputTypes {

  private lazy val k: Int = {
    require(kChild.foldable, "heavy_hitters: k must be a literal")
    val v = kChild.eval().asInstanceOf[Number].intValue()
    require(v > 0, s"heavy_hitters: k must be positive, got $v")
    v
  }

  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType)
  override def children: Seq[Expression] = Seq(itemChild, kChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType), StructField("est", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): MGSummary = new MGSummary(k)

  override def update(buffer: MGSummary, input: InternalRow): MGSummary = {
    val v = itemChild.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString, 1L)
    buffer
  }

  override def merge(buffer: MGSummary, other: MGSummary): MGSummary = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: MGSummary): Any =
    new GenericArrayData(buffer.sorted.map { case (item, est) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), est))
    })

  override def serialize(buffer: MGSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeInt(buffer.counts.size)
    val it = buffer.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new MGSummary(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      s.counts.put(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(itemChild = newChildren(0), kChild = newChildren(1))
  override def prettyName: String = "heavy_hitters"
}
