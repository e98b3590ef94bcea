package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Library

/** Mergeable HyperLogLog sketches (Flajolet et al. 2007; the ++ small-
  * range correction of Heule et al. 2013) with a PERSISTED register
  * table — incremental distinct counting for corpus health at 100 TB.
  *
  * Spark's own `approx_count_distinct` answers one query over one scan;
  * what an ever-growing corpus needs is a sketch that lives in the
  * store: build registers once, merge each ingest increment's registers
  * (register-wise max — associative, idempotent, order-free), estimate
  * any time — distinct tokens/shingles/urls across the whole history
  * without ever rescanning it. Registers ride the Library layer, so
  * sketch history is versioned and an increment rolls back like any
  * other write.
  *
  * Determinism (the oracle discipline): registers are pure INTEGER
  * functions of a portable hash — bucket = top p bits, rho = leading
  * zeros of the remaining value bits + 1 (via `length(bin(v))`, identical
  * in any engine) — and the estimator's register sum Σ 2^(−M_j) is
  * computed as the exact integer Σ 2^(64−M_j) in 38-digit decimals
  * (DuckDB: HUGEINT), so the harmonic mean sees NO float-order noise;
  * one double division at the end. `portable=true` hashes with the
  * md5-derived 60-bit [[Dedup.h60]] so an independent engine replays
  * every register; production mode uses the full 64 bits of xxhash64.
  */
object Sketch {

  /** The (bucket, rho) register table of a column — ≤ 2^p rows (absent
    * buckets are implicit zeros). Null values are ignored, as in any
    * COUNT(DISTINCT col). The aggregate is a groupBy-max over 2^p keys:
    * partial aggregation bounds the shuffle at 2^p counter rows per map
    * task regardless of input size.
    */
  def hllRegisters(
      df: DataFrame, value: Column, p: Int, portable: Boolean = false): DataFrame = {
    require(p >= 4 && p <= 18, s"p $p outside [4,18] (2^p registers)")
    val bits = if (portable) 60 else 64
    val vbits = bits - p
    val h = if (portable) Dedup.h60(value) else xxhash64(value)
    val in = df.filter(value.isNotNull).select(h.as("__h"))
    val bucket =
      if (portable) shiftright(col("__h"), vbits)
      else shiftrightunsigned(col("__h"), vbits)
    val v = col("__h").bitwiseAND(lit((1L << vbits) - 1))
    in.select(
        bucket.cast("int").as("bucket"),
        when(v === 0, lit(vbits + 1))
          .otherwise(lit(vbits) - length(bin(v)) + 1).cast("int").as("__r"))
      .groupBy("bucket").agg(max(col("__r")).as("rho"))
  }

  /** Register-wise merge: max per bucket. Associative, commutative,
    * idempotent — merging an increment twice (a replayed batch) is
    * harmless, the property that makes the persisted sketch safe under
    * at-least-once ingestion.
    */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("bucket").agg(max(col("rho")).as("rho"))

  /** Grouped registers: one sketch per key of `group` — (group, bucket,
    * rho), ≤ 2^p rows per group. The per-domain variant corpus ledgers
    * need; same partial-aggregation bound, keyed by (group, bucket).
    * Null group keys form their own sketch (pandas-groupby callers
    * should coalesce to a sentinel first, as in sampleTokenBudget).
    */
  def hllRegistersBy(
      df: DataFrame, group: Column, value: Column, p: Int,
      portable: Boolean = false): DataFrame = {
    require(p >= 4 && p <= 18, s"p $p outside [4,18] (2^p registers)")
    val bits = if (portable) 60 else 64
    val vbits = bits - p
    val h = if (portable) Dedup.h60(value) else xxhash64(value)
    val in = df.filter(value.isNotNull)
      .select(group.as("__g"), h.as("__h"))
    val bucket =
      if (portable) shiftright(col("__h"), vbits)
      else shiftrightunsigned(col("__h"), vbits)
    val v = col("__h").bitwiseAND(lit((1L << vbits) - 1))
    in.select(col("__g"),
        bucket.cast("int").as("bucket"),
        when(v === 0, lit(vbits + 1))
          .otherwise(lit(vbits) - length(bin(v)) + 1).cast("int").as("__r"))
      .groupBy("__g", "bucket").agg(max(col("__r")).as("rho"))
      .withColumnRenamed("__g", "group")
  }

  /** Grouped merge and estimate — per-group twins of [[hllMerge]] /
    * [[hllEstimate]]; estimate output (group, nonzero, n_distinct_est).
    */
  def hllMergeBy(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("group", "bucket").agg(max(col("rho")).as("rho"))

  def hllEstimateBy(registers: DataFrame, p: Int): DataFrame = {
    require(p >= 4 && p <= 18, s"p $p outside [4,18]")
    val m = 1 << p
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val two64 = new java.math.BigDecimal("18446744073709551616")
    val num = alphaFor(m) * m.toDouble * m.toDouble * math.pow(2.0, 64)
    registers
      .groupBy("group")
      .agg(count(lit(1)).as("__nz"),
        sum(pow(lit(2.0), lit(64) - col("rho")).cast(dec)).as("__sp"))
      .select(col("group"), col("__nz"),
        (lit(num) / ((lit(m).cast(dec) - col("__nz").cast(dec)) * lit(two64) +
          col("__sp")).cast("double")).as("__raw"),
        (lit(m.toDouble) - col("__nz").cast("double")).as("__v"))
      .select(col("group"), col("__nz").as("nonzero"),
        round(
          when(col("__raw") <= lit(2.5 * m) && col("__v") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("__v")))
            .otherwise(col("__raw")), 4).as("n_distinct_est"))
  }

  private def alphaFor(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1 + 1.079 / m)
  }

  /** One-row estimate from a register table: (m, nonzero, n_distinct_est).
    * Standard HLL with the linear-counting small-range branch
    * (E_raw ≤ 2.5m and empty registers exist ⇒ m·ln(m/V)). The register
    * sum is exact integer math (see object doc); the estimate rounds to
    * 4 places.
    */
  def hllEstimate(registers: DataFrame, p: Int): DataFrame = {
    require(p >= 4 && p <= 18, s"p $p outside [4,18]")
    val m = 1 << p
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val two64 = new java.math.BigDecimal("18446744073709551616") // 2^64
    val num = alphaFor(m) * m.toDouble * m.toDouble * math.pow(2.0, 64)
    registers
      .agg(count(lit(1)).as("__nz"),
        coalesce(sum(pow(lit(2.0), lit(64) - col("rho")).cast(dec)),
          lit(java.math.BigDecimal.ZERO).cast(dec)).as("__sp"))
      .select(col("__nz"),
        ((lit(m).cast(dec) - col("__nz").cast(dec)) * lit(two64) + col("__sp"))
          .as("__s"))
      .select(
        lit(m).as("m"),
        col("__nz").as("nonzero"),
        (lit(num) / col("__s").cast("double")).as("__raw"),
        (lit(m.toDouble) - col("__nz").cast("double")).as("__v"))
      .select(col("m"), col("nonzero"),
        round(
          when(col("__raw") <= lit(2.5 * m) && col("__v") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("__v")))
            .otherwise(col("__raw")), 4).as("n_distinct_est"))
  }

  /** Persist a sketch through the Library layer: `<name>__meta` pins
    * (p, portable) — estimating or merging under different parameters
    * would be silent garbage, so both read them from here — and
    * `<name>__regs` holds the register table indexed by bucket.
    */
  def buildHllSketch(
      lib: Library,
      df: DataFrame,
      column: String,
      name: String,
      p: Int = 12,
      portable: Boolean = false): Unit = {
    import df.sparkSession.implicits._
    lib.write(s"${name}__meta", Seq((p, portable)).toDF("p", "portable"))
    lib.write(s"${name}__regs",
      hllRegisters(df, col(column), p, portable), Some("bucket"))
  }

  private def hllMeta(lib: Library, name: String): (Int, Boolean) = {
    val r = lib.read(s"${name}__meta").head()
    (r.getAs[Int]("p"), r.getAs[Boolean]("portable"))
  }

  /** Fold an increment into a persisted sketch: registers of the new
    * data merge (max) into the stored table and commit a NEW VERSION —
    * the increment is never rescanned later, and the write is ≤ 2^p
    * rows however large the increment was. Idempotent per increment
    * (max-merge), so a replayed fold cannot inflate the estimate.
    */
  def mergeIntoHllSketch(
      lib: Library, df: DataFrame, column: String, name: String): Unit = {
    val (p, portable) = hllMeta(lib, name)
    val merged = hllMerge(
      lib.read(s"${name}__regs").select("bucket", "rho"),
      hllRegisters(df, col(column), p, portable))
    // localCheckpoint before the overwrite: the merged plan READS the
    // symbol version it is about to supersede
    lib.write(s"${name}__regs", merged.localCheckpoint(true), Some("bucket"))
  }

  /** Estimate from a persisted sketch (see [[hllEstimate]]). */
  def estimateHllSketch(lib: Library, name: String): DataFrame = {
    val (p, _) = hllMeta(lib, name)
    hllEstimate(lib.read(s"${name}__regs").select("bucket", "rho"), p)
  }
}
