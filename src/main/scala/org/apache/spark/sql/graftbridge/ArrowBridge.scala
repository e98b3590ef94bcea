package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.arrow.{ArrowBatchStreamWriter, ArrowConverters}

/** Bridge into Spark's `private[sql]` Arrow serialization — the exact
  * machinery PySpark's `toPandas`/`toArrow` ride (classic
  * Dataset.toArrowBatchRdd + ArrowBatchStreamWriter), exposed for the
  * engine's Arrow output format. Living under `org.apache.spark.sql` is
  * the same access-scope technique as [[CatalystBridge]].
  */
object ArrowBridge {

  private def classic(df: DataFrame): org.apache.spark.sql.classic.Dataset[Row] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]

  /** Distributed form: serialized Arrow IPC record-batch messages, one or
    * more per partition (no schema header — pair with `df.schema`).
    * Batch size follows spark.sql.execution.arrow.maxRecordsPerBatch.
    */
  def arrowBatchRdd(df: DataFrame): RDD[Array[Byte]] =
    classic(df).toArrowBatchRdd

  /** Driver-side complete Arrow IPC stream (schema header + record
    * batches + end-of-stream), directly readable by any Arrow
    * implementation's stream reader.
    */
  def collectAsArrowStream(df: DataFrame): Array[Byte] = {
    val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
    val out = new java.io.ByteArrayOutputStream()
    val writer = new ArrowBatchStreamWriter(df.schema, out, tz,
      true, false)
    writer.writeBatches(classic(df).toArrowBatchRdd.collect().iterator)
    writer.end()
    out.toByteArray
  }

  /** Inverse (used by the round-trip spec): Arrow IPC record-batch
    * payloads + schema JSON back to a DataFrame.
    */
  def fromArrowBatches(
      batches: Iterator[Array[Byte]],
      schemaJson: String,
      spark: org.apache.spark.sql.SparkSession): DataFrame =
    ArrowConverters.toDataFrame(batches, schemaJson,
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
}
