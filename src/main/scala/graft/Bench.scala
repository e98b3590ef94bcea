package graft

import graft.core.GraftSession

/** Benchmark main: headline queries on SPARK_GRAFT_SF_DIR, one JSON line.
  *
  * Forces full materialization with a noop-format write (count() would let
  * Catalyst prune the aggregates away); one warmup pass primes the JVM/JIT
  * and the OS page cache so per-query numbers measure the engine, not
  * class loading.
  */
object Bench {

  /** Headline subset mirroring the reference's ASV suite
    * (BASELINE.md: groupby q1/q3/q4/adv2, string/isin/numeric/regex
    * filters, projection, resample, read) — these run without temp-dir
    * side effects.
    */
  val headline: Seq[String] = Seq(
    "q01_filter_numeric",
    "q02_filter_string_eq",
    "q03_filter_isin",
    "q04_filter_regex",
    "q06_project_arith",
    "q08_groupby_agg",
    "q09_groupby_single",
    "q10_resample_1h",
    "q11_resample_right_offset",
    "q12_date_range",
    "q20_merge_update",
    "q27_dedup_exact",
    "q30_ngram_jaccard",
    "q31_ann_bruteforce",
    "q35_quality",
    "q39_join_broadcast_agg",
    "q41_asof_join",
    "q42_window_running",
    // round-2 additions (all side-effect-free)
    "q43_distinct",
    "q44_topk_per_group",
    "q47_resample_origin_start_day",
    "q48_resample_origin_end",
    "q51_sql_surface",
    "q53_multimodal_frames",
    // round-4 additions (side-effect-free)
    "q55_hash_sample_stratified",
    "q56_repetition_ratio",
    // round-7 addition (side-effect-free)
    "q68_decontaminate",
    // round-10 additions (side-effect-free): the fused rule-cleanup scan
    // and the DSIR weight pipeline — the two pipeline ops with real
    // compute at sf (the rest of q94–q97 are floor-bound at bench scale)
    "q92_clean_corpus",
    "q93_dsir_weights",
    // round-22 additions (additions-only harness change, VERDICT r21 #8):
    // the three most expensive probed non-headline paths — the TopKTerms
    // rewrite target (q116, r21's headline optimization, previously
    // invisible to the driver bench), native sessionization (q54) and the
    // skew-safe chunked as-of (q107). All side-effect-free with oracle
    // SQL; making them bench-timed puts them under regression guard.
    "q54_session_window",
    "q107_asof_join_chunked",
    "q116_topk_keywords",
    // round-13 candidates measured and EXCLUDED (same reasoning as
    // q94–q97): q124/q126 are model-build-bound at bench scale — their
    // LM/classifier construction runs ~6 driver-synchronized jobs whose
    // fixed scheduling cost dominates sf0.1/sf1 wall (ratios 6.5×/5.6×
    // with Spark totals ~1s) while DuckDB fuses the whole pipeline into
    // one query; at corpus scale the model build amortizes over the
    // scoring scan. q125 (SemDeDup) stays out for the dual reason: its
    // DuckDB replay's within-cluster dot products via a flattened join
    // are quadratic×dim at sf1 (the Spark side scores array columns
    // directly) — a pathological PROXY that would hang the oracle timer.
    )

  /** Locate the sf1 generator script (bench tooling, not library code) and
    * materialize a deterministic 10×-scaled copy of `sfDir` at `dst`.
    * Returns true when the scaled dir is ready. The generator itself is
    * idempotent (version marker + atomic rename), so repeat bench runs pay
    * ~4s of generation exactly once.
    */
  private def ensureSf1(sfDir: String, dst: String, replicas: Int = 10): Boolean = {
    val script = Seq("scripts/gen_sf1.py", "/root/repo/scripts/gen_sf1.py")
      .map(new java.io.File(_)).find(_.isFile)
    script.exists { f =>
      try {
        val p = new ProcessBuilder("python3", f.getAbsolutePath, sfDir, dst,
          replicas.toString)
          .redirectErrorStream(true).start()
        p.getInputStream.readAllBytes() // drain to avoid pipe deadlock
        p.waitFor() == 0 && new java.io.File(dst, "_GRAFT_SF1_OK").isFile
      } catch { case _: Throwable => false }
    }
  }

  /** Time each headline query's oracle SQL in DuckDB (same parquet, warm
    * run) via a python3 subprocess — measurement-only tooling so the 2×
    * proxy gate is machine-checkable from BENCH json alone; the library
    * itself never touches DuckDB. Called with passes=1 from the
    * interleaved runner (one subprocess per engine pass, warm + one
    * timed run inside — the median across subprocesses is taken by the
    * caller). Returns empty on any failure (no python, no duckdb
    * module): bench then emits spark timings only.
    */
  private def oracleTimes(
      sfDir: String, passes: Int,
      exclude: Set[String] = Set.empty): Map[String, Double] = {
    def jq(s: String): String = JsonUtil.quote(s)
    try {
      val sqls = SparkEntry.oracleSql
        .filter(kv => headline.contains(kv._1) && !exclude(kv._1))
      val tmp = java.nio.file.Files.createTempDirectory("graft-bench-")
      val sqlJson = tmp.resolve("oracle_sql.json")
      java.nio.file.Files.writeString(sqlJson,
        sqls.map { case (k, v) => s"${jq(k)}: ${jq(v)}" }.mkString("{", ",", "}"))
      val script = tmp.resolve("time_oracle.py")
      java.nio.file.Files.writeString(script,
        """import json, sys, time
          |import duckdb
          |sf, sqls = sys.argv[1], json.load(open(sys.argv[2]))
          |passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
          |con = duckdb.connect()
          |tables = ("region nation customer supplier part orders lineitem "
          |          "events documents embeddings").split()
          |import os
          |for t in tables:
          |    p = f"{sf}/{t}.parquet"
          |    src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
          |    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
          |out = {}
          |for name, sql in sqls.items():
          |    try:
          |        # TWO warm runs: parity with the engine's two warmup
          |        # passes (ADVICE r19 — a one-warm oracle vs a two-warm
          |        # engine tilts the published ratio toward the engine)
          |        con.execute(sql).fetchall()  # warm 1
          |        con.execute(sql).fetchall()  # warm 2
          |        # best-of-N warm runs within THIS subprocess (the
          |        # interleaved caller passes N=1 and medians across
          |        # subprocesses); queries over ~5s get a single timed
          |        # run to bound total wall.
          |        best = None
          |        for i in range(passes):
          |            t0 = time.time()
          |            con.execute(sql).fetchall()
          |            dt = time.time() - t0
          |            best = dt if best is None else min(best, dt)
          |            if dt > 5.0:
          |                break
          |        out[name] = round(best, 3)
          |    except Exception:
          |        out[name] = -1.0
          |print(json.dumps(out))
          |""".stripMargin)
      // merge stderr into stdout: reading only stdout to EOF while the
      // child blocks on a full stderr pipe would deadlock the bench
      val p = new ProcessBuilder("python3", script.toString, sfDir, sqlJson.toString,
        passes.toString)
        .redirectErrorStream(true).start()
      val outStr = new String(p.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim
      if (p.waitFor() != 0 || outStr.isEmpty) return Map.empty
      // the json line is the LAST line; anything before it is child chatter
      val jsonLine = outStr.linesIterator.toSeq.reverse
        .find(l => l.startsWith("{") && l.endsWith("}"))
        .getOrElse(return Map.empty)
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      JsonMethods.parse(jsonLine) match {
        case JObject(fields) => fields.collect {
          case (k, JDouble(v)) => k -> v
          case (k, JInt(v)) => k -> v.toDouble
        }.toMap
        case _ => Map.empty
      }
    } catch { case _: Throwable => Map.empty }
  }

  /** Short key for compact stdout blocks ("q30_ngram_jaccard" → "q30").
    * The driver's log capture keeps only the tail of bench output, so the
    * printed line must stay small; BENCH_FULL.json carries full names.
    */
  private def short(name: String): String = name.takeWhile(_ != '_')

  private def jmap(kvs: Seq[(String, String)]): String =
    kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

  /** The ONE driver-contract stdout line. The driver captures only the
    * last ~2000 chars of bench output, and sbt's `[success] Total time…`
    * trailer (~100 chars) follows this line — BENCH_r19/r20/r21 all show
    * `parsed: null` because the old line additionally carried the
    * per-query ratio map plus whole sf1/sf5 blocks (several KB) and its
    * HEAD was always truncated away (VERDICT r21 #1). Everything beyond
    * the fields below now lives only in BENCH_FULL.json (committed,
    * full-fidelity); this line keeps the contract fields verbatim —
    * `queries` keys stay FULL names (the driver compares them round over
    * round; renaming is forbidden) — plus the scalar totals the gate
    * needs. BenchLineSpec pins the worst-case length < 1500 chars.
    */
  private[graft] def compactLine(
      results: Seq[(String, Double)],
      oracleTotal: Option[Double],
      floor: Double, floorQ: Double, sfDir: String,
      sf1Total: Option[Double], sf1OracleTotal: Option[Double]): String = {
    val total = results.map(_._2).filter(_ >= 0).sum
    val q = jmap(results.map { case (k, v) => k -> f"$v%.3f" })
    val ot = oracleTotal.map(v => s""","oracle_total":${f"$v%.3f"}""").getOrElse("")
    val s1 = sf1Total.map(v => s""","sf1_total":${f"$v%.3f"}""").getOrElse("")
    val s1o = sf1OracleTotal
      .map(v => s""","sf1_oracle_total":${f"$v%.3f"}""").getOrElse("")
    s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$q$ot,"floor":${f"$floor%.3f"},"floor_q":${f"$floorQ%.3f"}$s1$s1o,"sf":"$sfDir"}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // Warmup + INTERLEAVED median-of-N engine/oracle passes at one
    // scale (VERDICT r18 #2: the r18 ratio read 1.70×/2.04× across two
    // same-HEAD runs purely on oracle host-variance). The warmup primes
    // JIT-compiled codegen classes, parquet footer caches and the OS
    // page cache; then engine pass i and oracle pass i run back to
    // back, so a transient host-load burst hits BOTH sides of the
    // ratio instead of whichever side happened to own that window —
    // and the per-query MEDIAN (same estimator both sides) discards a
    // single slowed pass without letting it pick the ratio. Observed
    // contention on this host: a co-scheduled burst slowing one whole
    // pass ~5×, DuckDB subprocess included.
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.isEmpty) -1.0
      else if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // interleavedPass returns (median walls, MIN walls, oracle medians):
    // the per-query MIN across the same passes (the r17/r18 estimator)
    // keeps the median↔min methodology change machine-comparable round
    // over round in BENCH_FULL.
    def interleavedPass(dir: String, exclude: Set[String] = Set.empty)
        : (Seq[(String, Double)], Seq[(String, Double)], Map[String, Double]) = {
      // TWO warmup passes: FixedPathProbe measured the first ~5 runs of
      // any query still descending ~10-20% as codegen classes JIT-warm
      // (a variant ordered first reads ~2x a variant ordered last on
      // the same config) — one warmup leaves the median-of-3 reading
      // warmup drift, not the engine
      headline.foreach(run(_, dir))
      headline.foreach(run(_, dir))
      val eP = scala.collection.mutable.ArrayBuffer.empty[Map[String, Double]]
      val oP = scala.collection.mutable.ArrayBuffer.empty[Map[String, Double]]
      for (_ <- 1 to passes) {
        eP += headline.map(n => n -> run(n, dir)).toMap
        // one subprocess per pass (warm + best-of-2 timed runs inside):
        // the oracle's timed window sits INSIDE the same load regime as
        // the engine pass it rides with. Best-of-2 (was 1 timed run,
        // VERDICT r20 #7): the ratio swung 1.01↔1.68× across same-HEAD
        // runs almost entirely on DuckDB's q92 (0.74↔2.35 s) — a single
        // timed run lets one contended window own a query's oracle
        // median; the second in-subprocess run discards it for ~3 s of
        // extra bench wall per pass. The cross-pass estimator is
        // unchanged (median across subprocesses, same as the engine).
        oP += oracleTimes(dir, 2, exclude)
      }
      val eng = headline.map { n =>
        n -> median(eP.map(_.getOrElse(n, -1.0)).filter(_ >= 0).toSeq)
      }
      val engMin = headline.map { n =>
        val ts = eP.map(_.getOrElse(n, -1.0)).filter(_ >= 0)
        n -> (if (ts.isEmpty) -1.0 else ts.min)
      }
      val orc = headline.filterNot(exclude).flatMap { n =>
        val ts = oP.flatMap(_.get(n)).filter(_ >= 0).toSeq
        if (ts.isEmpty) None else Some(n -> median(ts))
      }.toMap
      (eng, engMin, orc)
    }

    val (results, resultsMin, oracle) = interleavedPass(sfDir)
    // Fixed per-query harness cost (plan + schedule + noop write of a
    // 1-row frame): the floor under every sub-second timing above. On a
    // real cluster this amortizes — a 100 TB scan pays it once, not per
    // 60k rows — which is why the sf1 pass below exists: at 10× the data
    // the floor stops dominating and ratio-vs-oracle measures the plans.
    val floor = (1 to math.max(passes, 3)).map { _ =>
      val t0 = System.nanoTime()
      spark.range(1).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min
    // Representative per-query fixed cost: a 1-row parquet groupBy pays
    // what every headline query pays regardless of data volume — fresh
    // analysis/optimization of a non-trivial plan, parquet reader init,
    // one shuffle materialization + AQE re-plan, final stage, noop
    // commit. `floor` above (trivial 1-task plan) bounds scheduling
    // alone; `floor_q` bounds the whole per-query harness path, so
    // wall−floor_q isolates data-proportional plan cost.
    val floorQ = {
      val d = java.nio.file.Files.createTempDirectory("graft-floor-").toString
      spark.range(1).selectExpr("id as k", "cast(id as double) as v")
        .coalesce(1).write.mode("overwrite").parquet(d)
      val rel = spark.read.parquet(d) // cached-relation parity with t()
      def one(): Double = {
        val t0 = System.nanoTime()
        rel.groupBy("k").agg(org.apache.spark.sql.functions.sum("v").as("s"))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      one()
      (1 to math.max(passes, 3)).map(_ => one()).min
    }

    // sf1 pass: deterministic 10× scale-up of sfDir (SPARK_GRAFT_SF1=0
    // skips; SPARK_GRAFT_SF1_DIR overrides the location).
    val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR",
      new java.io.File("target/graft-sf1").getAbsolutePath)
    val sf1 = sys.env.getOrElse("SPARK_GRAFT_SF1", "1") != "0" &&
      ensureSf1(sfDir, sf1Dir)
    val (results1, results1Min, oracle1) =
      if (sf1) interleavedPass(sf1Dir)
      else (Seq.empty[(String, Double)], Seq.empty[(String, Double)],
        Map.empty[String, Double])

    // sf5 pass (50× sfDir) — the third ratio point of the scale story
    // (VERDICT r15 #7). Opt-in (SPARK_GRAFT_SF5=1): ~50× data makes the
    // pass minutes-long, too slow for the driver's per-round budget.
    // q30's oracle is EXCLUDED at this scale: its exact all-pairs DuckDB
    // proxy already costs ~25 s at sf1 and is super-linear (the engine
    // side dispatches to the incidence/prefix strategies; the replay
    // can't) — timing it at 50× would hang the bench for the proxy's
    // pathology, not the engine's.
    val sf5Dir = sys.env.getOrElse("SPARK_GRAFT_SF5_DIR",
      new java.io.File("target/graft-sf5").getAbsolutePath)
    val sf5 = sys.env.getOrElse("SPARK_GRAFT_SF5", "0") == "1" &&
      ensureSf1(sfDir, sf5Dir, replicas = 50)
    val (results5, results5Min, oracle5) =
      if (sf5) interleavedPass(sf5Dir, exclude = Set("q30_ngram_jaccard"))
      else (Seq.empty[(String, Double)], Seq.empty[(String, Double)],
        Map.empty[String, Double])

    def walls(rs: Seq[(String, Double)], key: String => String) =
      jmap(rs.map { case (k, v) => key(k) -> f"$v%.3f" })
    def ratios(rs: Seq[(String, Double)], o: Map[String, Double]) =
      jmap(rs.flatMap { case (k, v) =>
        o.get(k).filter(t => t > 0 && v >= 0).map(t => short(k) -> f"${v / t}%.2f")
      })
    def total(rs: Seq[(String, Double)]) = rs.map(_._2).filter(_ >= 0).sum
    def oTotal(o: Map[String, Double]) = o.values.filter(_ >= 0).sum

    // per-query ratio maps and full sf1/sf5 blocks go ONLY to
    // BENCH_FULL.json now — stdout carries the compact contract line
    // (see compactLine; VERDICT r21 #1: the old several-KB line was
    // head-truncated by the driver's 2000-char tail capture on three
    // consecutive rounds, leaving PERF with no per-query data at all)

    // The sf5 leg is opt-in (minutes-long), so a default driver refresh
    // must NOT zero the committed three-point scale story (VERDICT r16
    // wrong-#3): the leg persists to its OWN artifact (BENCH_SF5.json)
    // when it runs, and a run without the leg splices the prior
    // artifact's fields back into BENCH_FULL.json unchanged.
    val sf5Path = java.nio.file.Paths.get("BENCH_SF5.json")
    val emptySf5 =
      """"sf5_dir":"","sf5_queries":{},"sf5_oracle":{},"sf5_ratio":{},"sf5_total":0.000,"sf5_oracle_total":0.000"""
    // Query-set fingerprint: a stale BENCH_SF5.json from an OLDER
    // headline set (or format) must not be silently republished as
    // current sf5 numbers — the splice only accepts an artifact whose
    // fingerprint matches this build's query list, else it falls back
    // to the empty fields (ADVICE r17).
    val sf5Fp = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(headline.sorted.mkString(",").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    val sf5Fields: String =
      if (sf5) {
        val fields =
          s""""sf5_dir":"$sf5Dir","sf5_fingerprint":"$sf5Fp","sf5_queries":${walls(results5, identity)},
             |"sf5_total_min":${f"${total(results5Min)}%.3f"},"sf5_queries_min":${walls(results5Min, identity)},
             |"sf5_oracle":${jmap(oracle5.toSeq.sortBy(_._1).map { case (k, v) => k -> f"$v%.3f" })},
             |"sf5_ratio":${ratios(results5, oracle5)},
             |"sf5_total":${f"${total(results5)}%.3f"},"sf5_oracle_total":${f"${oTotal(oracle5)}%.3f"}""".stripMargin
        try java.nio.file.Files.writeString(sf5Path, "{" + fields + "}\n")
        catch { case _: Throwable => () }
        fields
      } else {
        // splice the prior leg back ONLY when the artifact parses as
        // JSON and its fingerprint matches this build's headline set —
        // a stale artifact from an older query list must not be
        // republished as current sf5 numbers. (The r18 keysOk regex
        // tolerance is gone: every committed BENCH_SF5.json carries the
        // fingerprint now, and the regex broke on nested values while
        // accepting fingerprint-less artifacts — ADVICE r18.)
        try {
          val s = java.nio.file.Files.readString(sf5Path).trim
          import org.json4s._
          val fpOk = org.json4s.jackson.JsonMethods.parse(s) \
            "sf5_fingerprint" match {
            case JString(fp) => fp == sf5Fp
            case _ => false
          }
          if (fpOk && s.startsWith("{") && s.endsWith("}"))
            s.substring(1, s.length - 1).trim
          else emptySf5
        } catch { case _: Throwable => emptySf5 }
      }

    // Full-fidelity dump (full query names, per-query oracle walls, all
    // scales) — committed with the round so the numbers survive the
    // driver's tail-truncated log capture.
    val full =
      s"""{"metric":"total","value":${f"${total(results)}%.3f"},"unit":"sec","floor":${f"$floor%.3f"},"floor_q":${f"$floorQ%.3f"},
         |"estimator":"median-of-$passes interleaved engine/oracle, 2 warmups both sides, oracle best-of-2 per pass (r21: one contended DuckDB window swung q92 0.74-2.35s run-to-run)",
         |"total_min":${f"${total(resultsMin)}%.3f"},"queries_min":${walls(resultsMin, identity)},
         |"sf":"$sfDir","queries":${walls(results, identity)},
         |"oracle":${jmap(oracle.toSeq.sortBy(_._1).map { case (k, v) => k -> f"$v%.3f" })},
         |"ratio":${ratios(results, oracle)},"oracle_total":${f"${oTotal(oracle)}%.3f"},
         |"sf1_dir":"$sf1Dir","sf1_queries":${walls(results1, identity)},
         |"sf1_total_min":${f"${total(results1Min)}%.3f"},"sf1_queries_min":${walls(results1Min, identity)},
         |"sf1_oracle":${jmap(oracle1.toSeq.sortBy(_._1).map { case (k, v) => k -> f"$v%.3f" })},
         |"sf1_ratio":${ratios(results1, oracle1)},
         |"sf1_total":${f"${total(results1)}%.3f"},"sf1_oracle_total":${f"${oTotal(oracle1)}%.3f"},
         |$sf5Fields}""".stripMargin
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_FULL.json"),
      full + "\n")
    catch { case _: Throwable => () }

    println(compactLine(
      results,
      if (oracle.isEmpty) None else Some(oTotal(oracle)),
      floor, floorQ, sfDir,
      if (sf1) Some(total(results1)) else None,
      if (sf1 && oracle1.nonEmpty) Some(oTotal(oracle1)) else None))
    spark.stop()
  }
}
