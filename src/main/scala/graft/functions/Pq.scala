package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze, Schmid 2011, "Product
  * Quantization for Nearest Neighbor Search") — the compression layer a
  * 100 TB embedding store actually deploys: split each vector into `m`
  * subvectors, k-means each subspace independently (`ksub` centroids),
  * and store one small code per subspace — m bytes per vector at
  * ksub ≤ 256 vs 4·dim for floats (64× at dim 64 / m 2 … 256× at
  * dim 1024 / m 16). Search runs ASYMMETRICALLY (ADC): the full-precision
  * query builds one (m × ksub) distance table, and each corpus vector's
  * approximate distance is the sum of m table lookups — no decompression,
  * no per-pair float math.
  *
  * Scale shape: training is m independent [[Vectors.kmeansAssign]]
  * passes over SLICED vectors (fast mode rides the codegen'd
  * NearestCentroid kernel — one narrow map per pass, no joins); encoding
  * IS the final assignment (no second scan); search joins the per-sub
  * code column against the BROADCAST per-query distance tables and
  * partial-aggregates the m-term sum per (query, corpus) — the only
  * exchange carries (query, corpus, partial-sum) longs, never vectors.
  *
  * Determinism contract (portable mode, the q155 gate): subspace k-means
  * is [[Vectors.kmeansPortableFull]] (md5 seeds, exact integer
  * centroids, multiplied-out decimal distances — the q114 machinery per
  * subspace), per-(query, sub, centroid) distances FLOOR-quantize to
  * µ-int longs (floor is pure binary — no decimal-string rounding
  * hazard), and the ADC score is an order-free long sum, so ranking
  * compares exact integers and an independent engine replays the whole
  * pipeline bit-for-bit.
  */
object Pq {

  /** PQ codes: (idCol, codes array<int> of length m). Encoding is the
    * subspace assignment itself — m sliced kmeans passes joined back
    * id-keyed (fast mode: each pass is one codegen'd narrow map).
    */
  def pqCodes(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      ksub: Int,
      iters: Int = 2,
      portable: Boolean = false): DataFrame = {
    val subs = subAssignments(df, idCol, vecCol, m, ksub, iters, portable)
    subs.zipWithIndex
      .map { case (a, s) =>
        a._1.select(col(idCol), col("cluster").as(s"__pq$s"))
      }
      .reduce(_.join(_, Seq(idCol)))
      .select(col(idCol),
        array((0 until m).map(s => col(s"__pq$s")): _*).as("codes"))
  }

  /** Asymmetric-distance top-k: for each query, the `k` corpus vectors
    * with the smallest summed subspace distance (squared L2, µ-int
    * longs), ties to the smaller id; query rows never match themselves.
    * Output: (query_id, corpus_id, adc, rank) with adc = score / 1e6.
    *
    * Exact arithmetic end to end in portable mode; fast mode uses the
    * same plan with double centroid tables (production path). Queries
    * must be broadcast-sized (they build per-query distance tables).
    */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      m: Int,
      ksub: Int,
      iters: Int = 2,
      portable: Boolean = false): DataFrame = {
    require(k >= 1, s"bad k $k")
    val subs = subAssignments(corpus, idCol, vecCol, m, ksub, iters, portable)
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    val sublen = dim / m
    // per-sub scored fragments: corpus codes (id-keyed narrow) joined
    // against the BROADCAST per-query µ-dist table on the code value
    val frags = subs.zipWithIndex.map { case ((assign, cent), s) =>
      val qslice = queries.select(col(idCol).as("query_id"),
        slice(col(vecCol), s * sublen + 1, sublen).as("__qv"))
      val table = distTable(qslice, cent, portable) // (query_id, __c, __qd)
      assign
        .select(col(idCol).as("corpus_id"), col("cluster").cast("long").as("__c"))
        .join(broadcast(table), Seq("__c"))
        .select(col("query_id"), col("corpus_id"), col("__qd"))
    }
    val scored = frags.reduce(_.unionByName(_))
      .filter(col("query_id") =!= col("corpus_id"))
      .groupBy("query_id", "corpus_id")
      .agg(sum(col("__qd")).as("__adc"))
    // partial top-k on the NEGATED exact long: smallest distance first,
    // ties to the smaller corpus_id — never a corpus-wide window
    val ranked = Vectors.rankTopK(
      scored.select(col("query_id"), col("corpus_id"),
        (-col("__adc")).cast("double").as("sim")), k)
    ranked.select(col("query_id"), col("corpus_id"),
      ((-col("sim")).cast("long").cast("double") / 1e6).as("adc"), col("rank"))
  }

  /** The m (assignment, centroid-model) pairs over sliced subvectors.
    * Portable: (assign df, cent df (__c, __s Σ-µ array, __n)); fast:
    * cent re-expressed as the same schema from the driver arrays so one
    * distance-table builder serves both modes.
    */
  private def subAssignments(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      ksub: Int,
      iters: Int,
      portable: Boolean): Seq[(DataFrame, DataFrame)] = {
    require(m >= 1 && ksub >= 1, s"bad pq params m=$m ksub=$ksub")
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sublen = dim / m
    graft.plans.TopKByScore.requireIntegralId(df.schema(idCol).dataType, "pq")
    (0 until m).map { s =>
      val sliced = df.select(col(idCol),
        slice(col(vecCol), s * sublen + 1, sublen).as("__sv"))
      val xs = transform(col("__sv"), v => v.cast("double"))
      if (portable) {
        Vectors.kmeansPortableFull(sliced, idCol, xs, ksub, iters)
      } else {
        val (assign, cents) =
          Vectors.kmeansFastFull(sliced, idCol, xs, ksub, iters)
        // re-express driver arrays in the portable cent schema with
        // n = 1 (sums ARE the centroid in µ-units): one distance-table
        // builder serves both modes
        val spark = df.sparkSession
        import scala.jdk.CollectionConverters._
        val rows = cents.zipWithIndex.map { case (cv, c) =>
          org.apache.spark.sql.Row(c.toLong, cv.map(x => math.round(x * 1e6)).toSeq, 1L)
        }.toSeq
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("__c",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("__s",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.LongType)),
          org.apache.spark.sql.types.StructField("__n",
            org.apache.spark.sql.types.LongType)))
        (assign, spark.createDataFrame(rows.asJava, schema))
      }
    }
  }

  /** Per-(query, centroid) µ-int distance table for one subspace:
    * Σ_d (q_d·n − S_d)² over the exact integer centroid (S Σ-µ, n) in
    * DECIMAL(38,0), divided out to a double exactly as the kmeans
    * assignment does, then FLOOR-quantized to µ-longs (floor is pure
    * binary). ksub × queries rows — broadcast-sized by construction.
    */
  private def distTable(
      qslice: DataFrame, cent: DataFrame, portable: Boolean): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val q = qslice.select(col("query_id"),
      transform(col("__qv"), v => round(v.cast("double") * 1e6).cast("long"))
        .as("__q"))
    val num = aggregate(
      zip_with(col("__q"), col("__s"), (p, sd) => {
        val d = p * col("__n") - sd
        d.cast(dec) * d.cast(dec)
      }),
      lit(java.math.BigDecimal.ZERO).cast(dec), _ + _)
    val dist = num.cast("double") /
      ((col("__n") * col("__n")).cast("double") * 1e12)
    q.crossJoin(cent)
      .select(col("query_id"), col("__c"),
        floor(dist * 1e6).cast("long").as("__qd"))
  }
}
