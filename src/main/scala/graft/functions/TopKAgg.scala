package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group top-k state: at most k (ord, id) pairs, evicting the
  * worst (smallest ord; ties broken toward larger id so the kept set matches
  * `ORDER BY ord DESC, id ASC LIMIT k`). */
final class TopKHeap(val k: Int) {
  // "worst first" priority: dequeue order = ascending ord, descending id
  private val worstFirst = Ordering.fromLessThan[(Double, Long)] { (a, b) =>
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
  }
  val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  def add(ord: Double, id: Long): Unit = {
    if (heap.size < k) heap.enqueue((ord, id))
    else if (worstFirst.lt((ord, id), heap.head)) { heap.dequeue(); heap.enqueue((ord, id)) }
  }

  /** Best-first (ord desc, id asc) snapshot. */
  def sorted: Array[(Double, Long)] =
    heap.toArray.sortBy { case (ord, id) => (-ord, id) }
}

/**
 * Bounded-heap top-k as a custom Catalyst aggregate (SURVEY.md §2.10 U3):
 * `topk_by(ord, id, k)` keeps the k best (ord, id) pairs per group ordered by
 * (ord DESC, id ASC) and returns them as `array<struct<ord, id>>`.
 *
 * Being a [[TypedImperativeAggregate]], it participates in PARTIAL
 * aggregation: each map task reduces its slice to a k-element heap before
 * the exchange, so the shuffle carries O(groups x k) rows per partition —
 * the same pre-shuffle bound WindowGroupLimit gives the rank-limit window
 * form, but as a single aggregation with no sort. The q20 driver query
 * hash-matches the window form's oracle, proving the two equivalent.
 */
case class TopKByOrd(ordChild: Expression, idChild: Expression, kChild: Expression,
                     mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] with ExpectsInputTypes {

  private lazy val k: Int = {
    require(kChild.foldable, "topk_by: k must be a literal")
    val v = kChild.eval().asInstanceOf[Number].intValue()
    require(v > 0, s"topk_by: k must be positive, got $v")
    v
  }

  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType, IntegerType)
  override def children: Seq[Expression] = Seq(ordChild, idChild, kChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", DoubleType), StructField("id", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val ordV = ordChild.eval(input)
    val idV = idChild.eval(input)
    if (ordV != null && idV != null) {
      buffer.add(ordV.asInstanceOf[Double], idV.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    other.heap.foreach { case (ord, id) => buffer.add(ord, id) }
    buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sorted.map { case (ord, id) =>
      new GenericInternalRow(Array[Any](ord, id))
    })

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val items = buffer.heap.toArray
    out.writeInt(buffer.k)
    out.writeInt(items.length)
    items.foreach { case (ord, id) => out.writeDouble(ord); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val heap = new TopKHeap(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { heap.add(in.readDouble(), in.readLong()); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByOrd =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByOrd =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(ordChild = newChildren(0), idChild = newChildren(1), kChild = newChildren(2))
  override def prettyName: String = "topk_by"
}
