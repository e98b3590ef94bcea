package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver contract of the bench's ONE stdout JSON line
  * (VERDICT r21 #1: the driver keeps only a ~2000-char tail of bench
  * output and sbt's `[success]` trailer follows the line, so the line
  * must stay well under that or the driver parses nothing — as happened
  * three rounds running).
  */
class BenchLineSpec extends AnyFunSuite {

  private def line(wall: Double): String = Bench.compactLine(
    Bench.headline.map(_ -> wall),
    oracleTotal = Some(wall * Bench.headline.size),
    floor = wall, floorQ = wall,
    sfDir = "/root/testdata/sf0.1",
    sf1Total = Some(wall * Bench.headline.size),
    sf1OracleTotal = Some(wall * Bench.headline.size))

  test("compact line stays under 1500 chars at worst-case widths") {
    // 9999.999 s per query is far beyond any plausible wall; even then the
    // full-name per-query map plus all scalar fields must leave ~500 chars
    // of headroom for sbt's trailing lines inside a 2000-char tail capture
    val l = line(9999.999)
    assert(l.length < 1500, s"line is ${l.length} chars:\n$l")
  }

  test("compact line is one line of valid JSON with the contract fields") {
    val l = line(0.123)
    assert(!l.contains("\n"))
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val j = JsonMethods.parse(l)
    assert((j \ "metric") == JString("total"))
    assert((j \ "unit") == JString("sec"))
    assert((j \ "sf") == JString("/root/testdata/sf0.1"))
    val queries = (j \ "queries").asInstanceOf[JObject].obj.map(_._1)
    // full query names, never shortened/renamed (driver compares them
    // round over round), and exactly the headline set
    assert(queries.toSet == Bench.headline.toSet)
    assert((j \ "value").isInstanceOf[JDouble] ||
      (j \ "value").isInstanceOf[JDecimal])
    assert((j \ "oracle_total") != JNothing)
    assert((j \ "floor") != JNothing)
    assert((j \ "floor_q") != JNothing)
  }

  test("headline keeps every pre-r22 query (additions-only contract)") {
    val preR22 = Seq(
      "q01_filter_numeric", "q02_filter_string_eq", "q03_filter_isin",
      "q04_filter_regex", "q06_project_arith", "q08_groupby_agg",
      "q09_groupby_single", "q10_resample_1h", "q11_resample_right_offset",
      "q12_date_range", "q20_merge_update", "q27_dedup_exact",
      "q30_ngram_jaccard", "q31_ann_bruteforce", "q35_quality",
      "q39_join_broadcast_agg", "q41_asof_join", "q42_window_running",
      "q43_distinct", "q44_topk_per_group", "q47_resample_origin_start_day",
      "q48_resample_origin_end", "q51_sql_surface", "q53_multimodal_frames",
      "q55_hash_sample_stratified", "q56_repetition_ratio",
      "q68_decontaminate", "q92_clean_corpus", "q93_dsir_weights")
    preR22.foreach(q => assert(Bench.headline.contains(q), s"$q dropped"))
  }
}
