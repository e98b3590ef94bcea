package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k aggregate over (LONG score desc, STRING term asc) — the
  * string-tie-break sibling of [[TopKByScore]], built for per-document
  * keyword ranking (Retrieval.topKeywords), whose scores are already
  * quantized to integer 1e-9 units and whose tie-break is the term
  * itself.
  *
  * Same point as TopKByScore: the AGGREGATION SHAPE. The window
  * formulation (`row_number over partitionBy(doc) orderBy(score desc,
  * term)` + rank<=k) does get its exchange k-bounded by Spark 4's
  * WindowGroupLimit pushdown, but the partial AND final limits each
  * sit on a FULL per-task sort of every (doc, term, score) posting —
  * two O(n log n) passes over the corpus vocabulary incidence. As a
  * TypedImperativeAggregate this keeps a k-entry heap per doc instead:
  * no sort below the exchange, none above it. The long score keeps
  * rank decisions exact-integer (no double rounding at any magnitude);
  * term comparison is UTF8String's binary order — Spark's own string
  * ordering, so ties break exactly as the window's `orderBy(term asc)`
  * did.
  *
  * Output: array<struct<term string, score long>> best-first; explode
  * with posexplode for (rank-1, pair) rows.
  */
final case class TopKTerms(
    score: Expression,
    term: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, UTF8String)]] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, term)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (score.dataType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k_terms score must be bigint (quantize doubles first — the " +
          s"exact-integer rank contract), got ${score.dataType}")
    else if (term.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k_terms term must be string, got ${term.dataType}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("term", StringType), StructField("score", LongType))),
    containsNull = false)

  /** Worst-first ordering so the heap head is the eviction candidate:
    * a is "less" (= worse) than b if its score is lower, or scores tie
    * and its term sorts LATER (binary UTF8String order).
    */
  private val worstFirst: Ordering[(Long, UTF8String)] =
    Ordering.fromLessThan((a, b) =>
      a._1 > b._1 || (a._1 == b._1 && a._2.compareTo(b._2) < 0))

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, UTF8String)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def offer(
      buf: mutable.PriorityQueue[(Long, UTF8String)],
      p: (Long, UTF8String)): Unit = {
    if (buf.size < k) buf.enqueue(p)
    else if (worstFirst.lt(p, buf.head)) { buf.dequeue(); buf.enqueue(p) }
  }

  override def update(
      buf: mutable.PriorityQueue[(Long, UTF8String)],
      input: InternalRow): mutable.PriorityQueue[(Long, UTF8String)] = {
    val s = score.eval(input)
    val t = term.eval(input)
    // clone() the UTF8String: eval may return a slice into a reused row
    // buffer — enqueueing the reference would silently corrupt retained
    // entries when the underlying bytes are overwritten by the next row
    if (s != null && t != null)
      offer(buf, (s.asInstanceOf[Long], t.asInstanceOf[UTF8String].clone()))
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Long, UTF8String)],
      other: mutable.PriorityQueue[(Long, UTF8String)]): mutable.PriorityQueue[(Long, UTF8String)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, UTF8String)]): Any = {
    val sorted = buf.toArray.sortWith((a, b) =>
      a._1 > b._1 || (a._1 == b._1 && a._2.compareTo(b._2) < 0)) // best first
    new GenericArrayData(sorted.map(p => InternalRow(p._2, p._1)))
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, UTF8String)]): Array[Byte] = {
    val entries = buf.toArray
    val bytes = entries.map(_._2.getBytes)
    val bb = ByteBuffer.allocate(4 + entries.length * 12 + bytes.map(_.length).sum)
    bb.putInt(entries.length)
    entries.zip(bytes).foreach { case ((s, _), tb) =>
      bb.putLong(s); bb.putInt(tb.length); bb.put(tb)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, UTF8String)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val s = bb.getLong
      val len = bb.getInt
      val tb = new Array[Byte](len)
      bb.get(tb)
      buf.enqueue((s, UTF8String.fromBytes(tb)))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKTerms =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKTerms =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKTerms =
    copy(score = newChildren(0), term = newChildren(1))

  override def prettyName: String = "top_k_terms"
}

object TopKTerms {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.CatalystBridge

  /** Column-API wrapper:
    * `df.groupBy(g).agg(TopKTerms.topK(scoreLong, term, k))`. Inputs must
    * be (bigint, string) — checkInputDataTypes rejects anything else at
    * analysis (no implicit casts: the long score IS the exact-rank
    * contract).
    */
  def topK(score: Column, term: Column, k: Int): Column =
    CatalystBridge.column(
      TopKTerms(
        CatalystBridge.expression(score),
        CatalystBridge.expression(term),
        k).toAggregateExpression())
}
