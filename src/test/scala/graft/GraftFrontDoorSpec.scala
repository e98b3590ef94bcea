package graft

import org.apache.spark.sql.functions._

import graft.core.{Graft, LibraryOptions}

/** Front door (reference arctic.py Arctic): library lifecycle under one
  * root URI, options persistence, and option-driven write defaults.
  */
class GraftFrontDoorSpec extends SparkSuite {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-front-").toString

  test("create/list/has/get/delete library lifecycle") {
    val g = new Graft(freshRoot(), spark)
    assert(g.listLibraries() == Nil)
    assert(!g.hasLibrary("prices"))
    intercept[NoSuchElementException](g.getLibrary("prices"))

    g.createLibrary("prices")
    g.createLibrary("alt_data", LibraryOptions(dynamicSchema = true, rowsPerSegment = 123))
    assert(g.listLibraries() == Seq("alt_data", "prices"))
    assert(g.hasLibrary("prices"))
    intercept[IllegalArgumentException](g.createLibrary("prices"))

    // options round-trip through _options.json
    val opts = g.libraryOptions("alt_data")
    assert(opts == LibraryOptions(dynamicSchema = true, rowsPerSegment = 123))
    assert(g.getLibrary("alt_data").options == opts)

    g.deleteLibrary("prices")
    assert(g.listLibraries() == Seq("alt_data"))
    // get-or-create
    val again = g.getLibrary("prices", createIfMissing = true)
    assert(again.options == LibraryOptions())
    assert(g.listLibraries() == Seq("alt_data", "prices"))
  }

  test("library options drive write segmentation and dynamic-schema defaults") {
    val g = new Graft(freshRoot(), spark)
    val lib = g.createLibrary("t", LibraryOptions(dynamicSchema = true, rowsPerSegment = 100))
    val df = (0 until 500).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
    lib.write("s", df, Some("k")) // no targetRows passed: 100-row segments
    assert(lib.manifest("s", lib.latestVersion("s").get).files.size >= 5)
    // dynamicSchema default comes from options: widened append succeeds
    val extra = Seq((1000L, 1.5, "tag")).toDF("k", "v", "note")
    lib.append("s", extra) // would throw without dynamic schema
    val got = lib.read("s")
    assert(got.columns.toSet == Set("k", "v", "note"))
    assert(got.count() == 501)
  }

  test("modifyLibraryOptions rewrites stored defaults for future opens") {
    val g = new Graft(freshRoot(), spark)
    g.createLibrary("t", LibraryOptions(rowsPerSegment = 100))
    val updated = g.modifyLibraryOptions("t")(_.copy(dynamicSchema = true))
    assert(updated == LibraryOptions(dynamicSchema = true, rowsPerSegment = 100))
    assert(g.libraryOptions("t") == updated)
    assert(g.getLibrary("t").options == updated)
  }

  test("invalid and reserved library names are rejected") {
    val g = new Graft(freshRoot(), spark)
    intercept[IllegalArgumentException](g.createLibrary(""))
    intercept[IllegalArgumentException](g.createLibrary("a/b"))
    intercept[IllegalArgumentException](g.createLibrary("_internal"))
  }
}
