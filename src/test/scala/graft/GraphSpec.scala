package graft

import graft.functions.{Clean, Graph}
import org.apache.spark.sql.functions._

/** Link extraction ground truth and hand-computed integer-µ PageRank
  * (the q140/q141 operators).
  */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  test("extractLinks: order, attributes, case, and non-anchors") {
    val html =
      """<p>x</p><a class="b" href="https://one.example.com/p">1</a>
        |<A HREF="HTTPS://Two.Example.com:8080/q#f">2</A>
        |<a name="no-href">skip</a>
        |<a href="/rel">3</a><a href="mailto:a@b.c">4</a>""".stripMargin
    val got = Seq(Tuple1(html)).toDF("html")
      .select(posexplode(Clean.extractLinks(col("html"))).as(Seq("pos", "url")))
      .select(col("url"), Clean.linkHost(col("url")).as("host"))
      .as[(String, Option[String])].collect().toSeq
    assert(got == Seq(
      ("https://one.example.com/p", Some("one.example.com")),
      ("HTTPS://Two.Example.com:8080/q#f", Some("two.example.com")),
      ("/rel", None),
      ("mailto:a@b.c", None)), got)
  }

  test("extractLinks emits edges map-side (no exchange in the plan)") {
    val plan = Seq((1L, "<a href=\"https://h.x/\">t</a>")).toDF("id", "html")
      .select(col("id"),
        posexplode(Clean.extractLinks(col("html"))).as(Seq("pos", "url")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("pageRank matches the hand-worked two-iteration trace") {
    // a→{b,c}, b→{c,d}, c→a; d dangling.
    // iter1: in-mass a=1e6, b=5e5, c=1e6, d=5e5 →
    //        µ = 1000000 / 575000 / 1000000 / 575000
    // iter2: in-mass a=1e6, b=5e5, c=787500, d=287500 →
    //        µ = 1000000 / 575000 / 819375 / 394375
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"),
      ("c", "a")).toDF("src", "dst")
    val got = Graph.pageRank(edges, "src", "dst", iters = 2)
      .orderBy("node").as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("a", 2L, 1000000L, 1.0),
      ("b", 2L, 575000L, 0.575),
      ("c", 1L, 819375L, 0.819375),
      ("d", 0L, 394375L, 0.394375)), got)
  }

  test("pageRank: parallel edges count with multiplicity, self-loops legal") {
    // a→a, a→b, a→b: outdeg(a)=3, per-edge contribution 1e6 div 3.
    val edges = Seq(("a", "a"), ("a", "b"), ("a", "b")).toDF("src", "dst")
    val got = Graph.pageRank(edges, "src", "dst", iters = 1)
      .orderBy("node").as[(String, Long, Long, Double)].collect().toSeq
    // a: 150000 + (17·333333) div 20 = 433333
    // b: 150000 + (17·666666) div 20 = 716666
    assert(got == Seq(
      ("a", 3L, 433333L, 0.433333),
      ("b", 0L, 716666L, 0.716666)), got)
  }

  test("hits matches the hand-worked one-iteration trace") {
    // a→{b,c}, b→{c,d}, c→a.
    // auth sums: a=1e6(c), b=1e6(a), c=2e6(a+b), d=1e6(b); max 2e6
    //   → auth: a=b=d=500000, c=1000000
    // hub sums: a=1.5e6(b+c), b=1.5e6(c+d), c=5e5(a), d=0; max 1.5e6
    //   → hub: a=b=1000000, c=333333, d=0
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"),
      ("c", "a")).toDF("src", "dst")
    val got = Graph.hits(edges, "src", "dst", iters = 1)
      .orderBy("node").as[(String, Long, Long, Double, Double)]
      .collect().toSeq
    assert(got == Seq(
      ("a", 1000000L, 500000L, 1.0, 0.5),
      ("b", 1000000L, 500000L, 1.0, 0.5),
      ("c", 333333L, 1000000L, 0.333333, 1.0),
      ("d", 0L, 500000L, 0.0, 0.5)), got)
  }

  test("pageRank refuses degenerate parameters") {
    val edges = Seq(("a", "b")).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      Graph.pageRank(edges, "src", "dst", iters = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(edges, "src", "dst", iters = 2, dampNum = 20, dampDen = 20)
    }
  }
}
