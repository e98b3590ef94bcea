package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics over crawl-extracted edges
  * ([[Clean.extractLinks]] / [[Clean.linkHost]] emit them) — the
  * authority signals a pretraining pipeline folds into document
  * quality scores (a page linked from high-rank hosts is worth more
  * than its text statistics alone say).
  */
object Graph {

  /** Distributed PageRank in EXACT integer micro-units.
    *
    * The recurrence is the constant-injection form with damping
    * `d = dampNum/dampDen` (default 17/20 = 0.85):
    *
    *   rank₀(v)   = 1.0
    *   rankₜ₊₁(v) = (1 − d) + d · Σ_{u→v} rankₜ(u) / outdeg(u)
    *
    * computed entirely in long micro-units: each edge contributes
    * `mu div outdeg` (floor), the per-node sum is a sum of longs
    * (order-free, so any engine replays it bit-for-bit), and damping
    * applies ONCE to the summed mass as `(dampNum·Σ) div dampDen`.
    * Doubles appear only in the final display column, derived from the
    * exact integer — the same micro-unit discipline as
    * [[Unigram]]'s log-probs, chosen for the same reason: a
    * float-summed PageRank differs between engines (and between
    * partitionings of the SAME engine) in the last ulps, which a
    * hash gate cannot tolerate.
    *
    * Semantics pinned deliberately: parallel edges count with their
    * multiplicity; self-loops are legal; dangling nodes (no outlinks)
    * absorb mass — the constant-injection form keeps every node's rank
    * ≥ (1−d) without a global dangling-mass redistribution term, which
    * would need an extra all-reduce per iteration.
    *
    * Scale shape: per iteration, one shuffle join of edges⋈ranks on
    * the source key and one keyed aggregate on the destination — the
    * canonical relational PageRank; nothing is driver-side and no
    * structure is per-node. Each iteration's rank table is
    * `localCheckpoint`ed: iterative lineage otherwise doubles the
    * analyzed plan per round (the Lloyd/label-propagation GC storm the
    * kmeans work measured). On a real cluster, substitute a reliable
    * checkpoint dir for executor-local blocks; the plan shape is
    * unchanged.
    *
    * Output: (node, out_links long, rank_mu long, rank double) — one
    * row per node appearing as source or destination.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 4,
      dampNum: Long = 17L,
      dampDen: Long = 20L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters=$iters outside [1, 50]")
    require(dampNum > 0 && dampNum < dampDen,
      s"damping $dampNum/$dampDen outside (0, 1)")

    val e = edges
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .filter(col("__src").isNotNull && col("__dst").isNotNull)
      .localCheckpoint()
    val nodes = e.select(col("__src").as("__node"))
      .union(e.select(col("__dst").as("__node")))
      .distinct()
      .localCheckpoint()
    val outdeg = e.groupBy("__src").agg(count(lit(1)).as("__deg"))
      .localCheckpoint()

    val baseMu = (1000000L * (dampDen - dampNum)) / dampDen

    var ranks = nodes.select(col("__node"), lit(1000000L).as("__mu"))
    var i = 0
    while (i < iters) {
      val inMass = e
        .join(ranks.withColumnRenamed("__node", "__src"), Seq("__src"))
        .join(outdeg, Seq("__src"))
        // `div`, not `/`: Column./ is double division; the recurrence
        // needs exact integral floor (== DuckDB's // on non-negatives).
        .select(col("__dst"), expr("__mu div __deg").as("__c"))
        .groupBy("__dst")
        .agg(sum(col("__c")).as("__s"))
      ranks = nodes
        .join(inMass.withColumnRenamed("__dst", "__node"), Seq("__node"), "left")
        .select(col("__node"),
          (lit(baseMu) +
            expr(s"(coalesce(__s, CAST(0 AS BIGINT)) * " +
              s"CAST($dampNum AS BIGINT)) div CAST($dampDen AS BIGINT)"))
            .as("__mu"))
        .localCheckpoint()
      i += 1
    }

    ranks
      .join(outdeg.withColumnRenamed("__src", "__node"), Seq("__node"), "left")
      .select(col("__node").as("node"),
        coalesce(col("__deg"), lit(0L)).as("out_links"),
        col("__mu").as("rank_mu"),
        (col("__mu").cast("double") / 1e6).as("rank"))
  }

  /** HITS hubs-and-authorities (Kleinberg 1999) in EXACT integer
    * micro-units — [[pageRank]]'s companion for bidirectional link
    * signals: a good HUB points at good authorities, a good AUTHORITY
    * is pointed at by good hubs. Per iteration:
    *
    *   auth'(v) = Σ_{u→v} hub(u)     then max-normalized to 1e6
    *   hub'(u)  = Σ_{u→v} auth'(v)   then max-normalized to 1e6
    *
    * Both sums are order-free long sums; normalization is
    * `x·1e6 div max` where the max of exact integers is itself exact —
    * so the whole fixed-point iteration is engine-replayable (the
    * float formulation normalizes by an L2 norm whose sqrt and
    * summation order cannot be hash-gated). Parallel edges count with
    * multiplicity, mirroring [[pageRank]].
    *
    * Scale shape: two keyed join+aggregate passes per iteration (one
    * per direction) and a 1-row max that broadcasts back — scores
    * localCheckpoint each round like pageRank. Output: (node,
    * hub_mu, auth_mu, hub, auth).
    */
  def hits(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters=$iters outside [1, 50]")
    val e = edges
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .filter(col("__src").isNotNull && col("__dst").isNotNull)
      .localCheckpoint()
    val nodes = e.select(col("__src").as("__node"))
      .union(e.select(col("__dst").as("__node")))
      .distinct()
      .localCheckpoint()

    // max-normalize a (node, col) score frame to 1e6 micro-units; the
    // 1-row max crossJoins back (broadcast by AQE). max >= 1 always:
    // scores start at 1e6 and a sum of non-negative longs with at
    // least one positive stays positive on a non-empty edge set.
    // The scale-up multiply runs in DECIMAL(38,0): a pre-normalization
    // score is a sum of up-to-1e6 micro-unit hub values over a node's
    // in-edges, so score*1e6 overflows Long past in-degree ~9.2e6 —
    // real for popular hosts in a web-scale graph. Decimal headroom
    // covers in-degree to ~1e25; `div` on decimals is Spark's integral
    // divide (bigint result), identical to the long path wherever the
    // long path didn't overflow, so gate hashes are unchanged. The
    // remaining bound is the long SUM itself: per-node Σ ≤ 1e6 ×
    // in-degree must stay under 2^63, i.e. in-degree < ~9.2e12 —
    // beyond any real host graph.
    def normalized(scores: DataFrame, c: String): DataFrame = {
      val m = scores.agg(max(col(c)).as("__m"))
      scores.crossJoin(broadcast(m))
        .select(col("__node"),
          expr(s"(CAST($c AS DECIMAL(38,0)) * CAST(1000000 AS DECIMAL(38,0)))" +
            s" div CAST(__m AS DECIMAL(38,0))").as(c))
    }

    var hub = nodes.select(col("__node"), lit(1000000L).as("__h"))
    var auth = nodes.select(col("__node"), lit(1000000L).as("__a"))
    var i = 0
    while (i < iters) {
      val aSum = e.join(hub.withColumnRenamed("__node", "__src"), Seq("__src"))
        .groupBy(col("__dst").as("__node"))
        .agg(sum(col("__h")).as("__a"))
      auth = normalized(
        nodes.join(aSum, Seq("__node"), "left")
          .select(col("__node"), coalesce(col("__a"), lit(0L)).as("__a")),
        "__a").localCheckpoint()
      val hSum = e.join(auth.withColumnRenamed("__node", "__dst"), Seq("__dst"))
        .groupBy(col("__src").as("__node"))
        .agg(sum(col("__a")).as("__h"))
      hub = normalized(
        nodes.join(hSum, Seq("__node"), "left")
          .select(col("__node"), coalesce(col("__h"), lit(0L)).as("__h")),
        "__h").localCheckpoint()
      i += 1
    }

    hub.join(auth, Seq("__node"))
      .select(col("__node").as("node"),
        col("__h").as("hub_mu"), col("__a").as("auth_mu"),
        (col("__h").cast("double") / 1e6).as("hub"),
        (col("__a").cast("double") / 1e6).as("auth"))
  }
}
