package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Bounded distinct-min-k buffer: the k SMALLEST distinct longs seen so
  * far, kept sorted ascending in a fixed array. State is O(k) regardless
  * of group size — the property that makes a capped posting list safe to
  * build over a stopword whose group holds billions of (word, doc_id)
  * pairs at corpus scale: every map-side partial carries at most k ids
  * into the exchange, so shuffle volume per word is O(partitions × k),
  * never O(postings). `collect_set`-then-`slice` has unbounded state and
  * OOMs on exactly the groups an inverted index cares about most.
  *
  * Merge takes the k smallest of the union (associative, commutative,
  * duplicate-eliminating), so partition-local partials combine to the
  * exact global answer: the k smallest distinct values. */
final class MinKBuffer(val k: Int) extends Serializable {
  val vals: Array[Long] = new Array[Long](k)
  var size: Int = 0

  /** Insert keeping ascending order and distinctness; drop the largest
    * when full. Binary search + memmove — k is index-cap sized (≤ a few
    * hundred), so the copy is L1-resident. */
  def add(v: Long): Unit = {
    if (size == k && v >= vals(size - 1)) return
    val idx = {
      val i = java.util.Arrays.binarySearch(vals, 0, size, v)
      if (i >= 0) return // already present: distinct semantics
      -(i + 1)
    }
    val lastKept = if (size == k) size - 1 else size
    System.arraycopy(vals, idx, vals, idx + 1, lastKept - idx)
    vals(idx) = v
    if (size < k) size += 1
  }

  def merge(other: MinKBuffer): Unit = {
    var i = 0
    while (i < other.size) { add(other.vals(i)); i += 1 }
  }

  def toArray: Array[Long] = java.util.Arrays.copyOfRange(vals, 0, size)
}

/** Custom Catalyst aggregate `graft_min_k(col, k)`: the k smallest
  * DISTINCT values of a long column, returned sorted ascending.
  *
  * Built for [[graft.operators.TextAnalysis.invertedIndex]]'s capped
  * posting lists, but generally useful wherever "first k members of a
  * group by key order" must not materialize the group (per-key sample
  * ids, representative doc pickers). Runs inside ObjectHashAggregateExec
  * with map-side partial aggregation, same as [[HistogramAgg]]. */
case class CollectMinK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinKBuffer] {

  require(k > 0, "graft_min_k: k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): MinKBuffer = new MinKBuffer(k)

  override def update(buf: MinKBuffer, input: InternalRow): MinKBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val l = v match {
        case l: Long  => l
        case i: Int   => i.toLong
        case s: Short => s.toLong
        case b: Byte  => b.toLong
        case x        => x.toString.toLong
      }
      buf.add(l)
    }
    buf
  }

  override def merge(buf: MinKBuffer, other: MinKBuffer): MinKBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: MinKBuffer): Any = ArrayData.toArrayData(buf.toArray)

  override def serialize(buf: MinKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) { out.writeLong(buf.vals(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MinKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MinKBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.vals(i) = in.readLong(); i += 1 }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectMinK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectMinK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CollectMinK =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_min_k"
}

object CollectMinK {
  val FnName = "graft_min_k"

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (registry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(FnName))) return
    val info = new ExpressionInfo(classOf[CollectMinK].getName, FnName)
    registry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(FnName),
      info,
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"$FnName(col, k)")
        CollectMinK(exprs.head,
          exprs(1).eval(InternalRow.empty).toString.toInt)
      })
  }

  /** Column-API entry: `minK($"doc_id", 10)` → sorted array of the 10
    * smallest distinct ids in the group. */
  def minK(c: Column, k: Int): Column = {
    try register(SparkSession.active) catch { case _: IllegalStateException => () }
    call_function(FnName, c, lit(k))
  }
}
