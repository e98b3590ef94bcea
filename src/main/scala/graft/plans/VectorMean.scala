package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise mean of a float-vector column — the centroid-update
  * aggregate of IVF k-means (Lloyd pass).
  *
  * The aggregation SHAPE is the point: as a TypedImperativeAggregate it
  * participates in partial aggregation, so each map task ships ONE
  * (count, Σ) buffer of `dim` doubles per cell to the exchange. The
  * posexplode formulation it replaces exploded every corpus vector into
  * `dim` (cell, dim, x) rows and shuffled corpus×dim rows per Lloyd
  * iteration — at 100 TB that exchange IS the k-means cost; this one is
  * O(cells × dim × tasks) regardless of corpus size.
  *
  * Accumulates in double (float summation loses associativity tolerance
  * fast at corpus scale), emits array<float> to match the embedding
  * column type.
  */
final case class VectorMean(
    vec: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorMean.Buf] {

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    vec.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_mean expects array<float|double>, got $other")
    }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  // lazy: children are unresolved at construction (copy() during analysis)
  private lazy val elemIsFloat = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): VectorMean.Buf = new VectorMean.Buf(0L, null)

  override def update(buf: VectorMean.Buf, input: InternalRow): VectorMean.Buf = {
    val v = vec.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // A vector with ANY null element is skipped whole (like a null vector):
    // registered as SQL graft_vector_mean, the input may be
    // array<float> containsNull=true, and getFloat on a null slot would
    // silently contribute garbage to the centroid.
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return buf
      i += 1
    }
    if (buf.sums == null) buf.sums = new Array[Double](n)
    require(buf.sums.length == n,
      s"vector_mean: ragged vectors (${buf.sums.length} vs $n)")
    i = 0
    while (i < n) {
      buf.sums(i) += (if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
      i += 1
    }
    buf.count += 1
    buf
  }

  override def merge(buf: VectorMean.Buf, other: VectorMean.Buf): VectorMean.Buf = {
    if (other.sums == null) return buf
    if (buf.sums == null) { buf.sums = other.sums.clone(); buf.count = other.count; return buf }
    require(buf.sums.length == other.sums.length,
      s"vector_mean: ragged vectors (${buf.sums.length} vs ${other.sums.length})")
    var i = 0
    while (i < buf.sums.length) { buf.sums(i) += other.sums(i); i += 1 }
    buf.count += other.count
    buf
  }

  override def eval(buf: VectorMean.Buf): Any =
    if (buf.sums == null || buf.count == 0L) null
    else {
      val out = new Array[Any](buf.sums.length)
      var i = 0
      while (i < buf.sums.length) { out(i) = (buf.sums(i) / buf.count).toFloat; i += 1 }
      new GenericArrayData(out)
    }

  override def serialize(buf: VectorMean.Buf): Array[Byte] = {
    val dim = if (buf.sums == null) 0 else buf.sums.length
    val bb = ByteBuffer.allocate(12 + dim * 8)
    bb.putLong(buf.count)
    bb.putInt(dim)
    var i = 0
    while (i < dim) { bb.putDouble(buf.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorMean.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val count = bb.getLong
    val dim = bb.getInt
    if (dim == 0) new VectorMean.Buf(count, null)
    else {
      val sums = new Array[Double](dim)
      var i = 0
      while (i < dim) { sums(i) = bb.getDouble; i += 1 }
      new VectorMean.Buf(count, sums)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMean =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMean =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VectorMean =
    copy(vec = newChildren(0))

  override def prettyName: String = "vector_mean"
}

object VectorMean {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.CatalystBridge

  /** Mutable (count, Σ) accumulator; sums is allocated on first row. */
  final class Buf(var count: Long, var sums: Array[Double])

  def mean(vec: Column): Column =
    CatalystBridge.column(
      VectorMean(CatalystBridge.expression(vec)).toAggregateExpression())
}
