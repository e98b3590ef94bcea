package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k best (score desc, id asc) pairs.
  *
  * The point is the AGGREGATION SHAPE, not the heap: as a
  * TypedImperativeAggregate it participates in partial aggregation, so
  * each map task emits at most k pairs per group BEFORE the exchange. The
  * window-function formulation (`row_number over partitionBy(group)`)
  * shuffles every scored row — O(corpus × queries) — which is exactly the
  * plan that dies at 100 TB. Here the shuffle is O(groups × k × tasks).
  *
  * Output: array<struct<id long, score double>> sorted best-first; explode
  * with posexplode for (rank-1, pair) rows.
  */
final case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false

  /** Analysis-time type gate: update() reads the score as Double and the
    * id as Long, so anything else must fail BEFORE execution (an int or
    * string id column would otherwise throw ClassCastException executor-
    * side, or emit a wrong schema). Callers with integral ids cast — the
    * Column wrapper below does it automatically.
    */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (score.dataType != DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k_by_score score must be double, got ${score.dataType}")
    else if (id.dataType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k_by_score id must be bigint (cast integral ids; non-integral " +
          s"ids are unsupported), got ${id.dataType}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType), StructField("score", DoubleType))),
    containsNull = false)

  /** Worst-first ordering so the heap head is the eviction candidate:
    * a is "less" (= worse) than b if its score is lower, or scores tie and
    * its id is larger.
    */
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.fromLessThan((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)], p: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(p)
    // head = current worst; replace it when p ranks strictly better
    // (in worstFirst, "less" = better, so p must be lt head)
    else if (worstFirst.lt(p, buf.head)) { buf.dequeue(); buf.enqueue(p) }
  }

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      offer(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortBy(p => (-p._1, p._2)) // best first, id tiebreak
    new GenericArrayData(sorted.map(p => InternalRow(p._2, p._1)))
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((bb.getDouble, bb.getLong)))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "top_k_by_score"
}

object TopKByScore {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.CatalystBridge

  /** Column-API wrapper: `df.groupBy(g).agg(TopKByScore.topK(score, id, k))`.
    * Inputs must be (double, bigint) — checkInputDataTypes rejects
    * anything else at analysis. No implicit casts here: a silent
    * string→long cast would turn unparsable ids into nulls and drop rows;
    * callers with integral ids cast explicitly (see Vectors.rankTopK).
    */
  def topK(score: Column, id: Column, k: Int): Column =
    CatalystBridge.column(
      TopKByScore(
        CatalystBridge.expression(score),
        CatalystBridge.expression(id),
        k).toAggregateExpression())

  /** Shared caller-side gate for operators that widen an id column to
    * long for this aggregate: only integral types may cast (a silent
    * string→long cast nulls unparsable ids and DROPS their rows).
    */
  def requireIntegralId(t: DataType, what: String): Unit = t match {
    case ByteType | ShortType | IntegerType | LongType => ()
    case other => throw new IllegalArgumentException(
      s"$what id column must be integral (got $other); hash or index " +
        "non-integral ids to a long before ranking")
  }
}
