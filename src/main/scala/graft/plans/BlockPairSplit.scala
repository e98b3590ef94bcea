package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Generator for the blocked all-pairs Jaccard join
  * (Dedup.ngramJaccardPairs dense path): splits one shingle bucket's
  * postings by doc block and emits one row per ordered block pair
  * (i ≤ j) present in the bucket — (bp = i*numBlocks + j, a, b) where
  * `a`/`b` are the bucket's entries in blocks i/j, each packed as
  * `localIndex << 40 | sz` (sz = the doc's distinct-shingle count,
  * < 2^40 — a single document cannot hold 2^40 distinct shingles since
  * Spark caps one string at 2 GB). Diagonal rows (i == j, needs ≥ 2
  * entries) carry an EMPTY `b`, halving their shuffle bytes; the tile
  * kernel treats an empty `b` as "self-join upper triangle".
  *
  * Every bucket containing docs (x, y) emits their two blocks' split to
  * the SAME bp, so the downstream per-tile accumulation sees the pair's
  * full intersection count — exactness is preserved by construction.
  */
final case class BlockPairSplit(child: Expression, numBlocks: Int)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.Generator
  with CodegenFallback {

  require(numBlocks >= 1, s"numBlocks must be >= 1, got $numBlocks")

  override def elementSchema: StructType = StructType(Seq(
    StructField("bp", IntegerType, nullable = false),
    StructField("a", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("b", ArrayType(LongType, containsNull = false), nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(b, l, s)), _)
      if b.dataType == IntegerType && l.dataType == IntegerType &&
        s.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"block_pair_split expects array<struct<int,int,long>>, got $other")
  }

  private val emptyArr: ArrayData =
    UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val arr = v.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < 2) return Nil
    // decode once, count per block
    val blk = new Array[Int](m)
    val packed = new Array[Long](m)
    val cnt = new Array[Int](numBlocks)
    var i = 0
    while (i < m) {
      val row = arr.getStruct(i, 3)
      val b = row.getInt(0)
      blk(i) = b
      packed(i) = (row.getInt(1).toLong << 40) | row.getLong(2)
      cnt(b) += 1
      i += 1
    }
    // fill per-block slices
    val slices = new Array[Array[Long]](numBlocks)
    val pos = new Array[Int](numBlocks)
    i = 0
    while (i < m) {
      val b = blk(i)
      if (slices(b) == null) slices(b) = new Array[Long](cnt(b))
      slices(b)(pos(b)) = packed(i)
      pos(b) += 1
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](8)
    var bi = 0
    while (bi < numBlocks) {
      if (cnt(bi) > 0) {
        if (cnt(bi) >= 2)
          out += InternalRow(bi * numBlocks + bi,
            UnsafeArrayData.fromPrimitiveArray(slices(bi)), emptyArr)
        var bj = bi + 1
        while (bj < numBlocks) {
          if (cnt(bj) > 0)
            out += InternalRow(bi * numBlocks + bj,
              UnsafeArrayData.fromPrimitiveArray(slices(bi)),
              UnsafeArrayData.fromPrimitiveArray(slices(bj)))
          bj += 1
        }
      }
      bi += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): BlockPairSplit =
    copy(child = newChild)

  override def prettyName: String = "block_pair_split"
}

object BlockPairSplit {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.CatalystBridge

  def apply(docs: Column, numBlocks: Int): Column =
    CatalystBridge.column(BlockPairSplit(CatalystBridge.expression(docs), numBlocks))
}
