package graft

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.ArrowStreamReader
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ArrowBridge

/** Arrow output format (reference arctic.py OutputFormat / to-Arrow read
  * path): the serialized stream must be readable by the stock Arrow Java
  * stream reader, and batches must round-trip back to an identical
  * DataFrame.
  */
class ArrowBridgeSpec extends SparkSuite {

  private def sample = {
    import spark.implicits._
    Seq(
      (1L, "alpha", 1.5, true),
      (2L, "beta", -2.25, false),
      (3L, null.asInstanceOf[String], Double.NaN, true),
      (4L, "delta", 0.0, false)
    ).toDF("id", "name", "score", "flag")
  }

  test("collectAsArrowStream is a valid Arrow IPC stream with the full data") {
    val df = sample
    val bytes = ArrowBridge.collectAsArrowStream(df)
    val alloc = new RootAllocator(Long.MaxValue)
    val reader = new ArrowStreamReader(new java.io.ByteArrayInputStream(bytes), alloc)
    try {
      val root = reader.getVectorSchemaRoot
      assert(root.getSchema.getFields.size() === 4)
      assert(root.getSchema.getFields.get(0).getName === "id")
      var rows = 0L
      var idSum = 0L
      while (reader.loadNextBatch()) {
        rows += root.getRowCount
        val idVec = root.getVector("id").asInstanceOf[org.apache.arrow.vector.BigIntVector]
        (0 until root.getRowCount).foreach(i => idSum += idVec.get(i))
      }
      assert(rows === 4)
      assert(idSum === 10)
    } finally { reader.close(); alloc.close() }
  }

  test("arrowBatchRdd batches round-trip to an identical DataFrame") {
    val df = sample
    val batches = ArrowBridge.arrowBatchRdd(df).collect()
    assert(batches.nonEmpty)
    val back = ArrowBridge.fromArrowBatches(batches.iterator, df.schema.json, spark)
    assert(back.schema === df.schema)
    val a = df.orderBy("id").collect().toSeq
    val b = back.orderBy("id").collect().toSeq
    // NaN and null must survive the round trip
    assert(a.map(_.toString) === b.map(_.toString))
  }

  test("Library.readAsArrow hands a symbol off as a valid Arrow stream") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-arrow-").toString
    val lib = new graft.core.Library(root, spark)
    lib.write("t", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), Some("k"))
    val bytes = lib.readAsArrow("t", columns = Seq("k", "v"))
    val alloc = new RootAllocator(Long.MaxValue)
    val reader = new ArrowStreamReader(new java.io.ByteArrayInputStream(bytes), alloc)
    try {
      val root2 = reader.getVectorSchemaRoot
      assert(root2.getSchema.getFields.get(0).getName === "k")
      var rows = 0
      while (reader.loadNextBatch()) rows += root2.getRowCount
      assert(rows === 3)
    } finally { reader.close(); alloc.close() }
  }

  test("round trip preserves ns-long timestamps and binary columns") {
    import spark.implicits._
    val df = Seq(
      (1704067200000000000L, Array[Byte](1, 2, 3)),
      (1704067201500000000L, Array[Byte]())
    ).toDF("ts", "payload")
    val back = ArrowBridge.fromArrowBatches(
      ArrowBridge.arrowBatchRdd(df).collect().iterator, df.schema.json, spark)
    assert(back.schema === df.schema)
    assert(back.agg(sum("ts")).head.getLong(0) ===
      df.agg(sum("ts")).head.getLong(0))
    assert(back.selectExpr("sum(length(payload))").head.getLong(0) === 3L)
  }
}
