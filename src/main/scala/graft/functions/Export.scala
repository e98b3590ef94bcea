package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-data export sinks — the write side of the crawl-dump JSONL
  * path (ingestion with quarantine is q170). A 100 TB pipeline's last
  * step is usually "hand the curated corpus to the trainer as sharded
  * JSONL": sharding must be DETERMINISTIC (a re-run or a resumed export
  * routes every document to the same shard — no dependence on task
  * scheduling or input split order), and the export must be verifiable
  * without trusting the writer (the manifest is computed from a RE-READ
  * of what actually landed on storage).
  */
object Export {

  /** Export `df` as `shards` JSONL shard directories under `dir`
    * (`dir/shard=N/part-*.txt`, one JSON object per line), with shard =
    * md5-derived 60-bit hash of the id string, mod `shards` — the
    * [[Dedup.h60]] portable hash, so an external engine (including the
    * DuckDB replay oracle) recomputes the exact routing.
    *
    * Returns the per-shard manifest from a RE-READ of the written
    * files: (shard, n_docs, id_sum, text_sum) where text_sum is the
    * per-shard sum of h60(text) mod 1e9+7 (a bounded checksum — no
    * BIGINT overflow at any corpus size that matters). Because the
    * manifest re-parses the JSON that landed, any escaping or encoding
    * infidelity in the round trip (newlines, quotes, non-BMP text)
    * diverges the checksum — the manifest witnesses storage truth, not
    * writer intent.
    *
    * Scale shape: routing is a map-side hash; the repartition on shard
    * colocates each shard in one task so each shard is one file (pass a
    * smaller `shards` per output budget, or compose with
    * maxRecordsPerFile for intra-shard splitting); the manifest is one
    * scan of the written text + a `shards`-row aggregate.
    */
  def jsonlShards(
      df: DataFrame,
      idCol: String,
      textCol: String,
      dir: String,
      shards: Int): DataFrame = {
    require(shards >= 1 && shards <= 65536, s"bad shard count $shards")
    // 'shard' is the routing column and 'value' the serialized line —
    // a same-named input column would be silently REPLACED by the
    // router hash before to_json serializes it (exported data corrupted
    // in a way the re-read manifest cannot see, since it re-parses the
    // same corrupted JSON); refuse loudly instead
    require(!df.columns.contains("shard") && !df.columns.contains("value"),
      "jsonlShards: input must not contain columns named 'shard' or 'value'")
    val spark = df.sparkSession
    val cols = df.columns.toSeq
    df.withColumn("shard",
        pmod(Dedup.h60(col(idCol).cast("string")), lit(shards.toLong)).cast("int"))
      .select(col("shard"), to_json(struct(cols.map(col): _*)).as("value"))
      .repartition(col("shard"))
      .write.partitionBy("shard").mode("overwrite").text(dir)
    val parsed = spark.read.text(dir)
      .select(col("shard").cast("int").as("shard"),
        from_json(col("value"), df.schema).as("j"))
    // id_sum: exact sum for integral ids; for any other id type a plain
    // sum would be silently NULL (an unverifiable manifest with no
    // error), so non-integral ids checksum the same way text does —
    // pmod(h60(id), 1e9+7) — keeping the manifest meaningful for
    // string/uuid ids too.
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val idSum = df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => sum(col(s"j.$idCol"))
      case _ => sum(pmod(Dedup.h60(col(s"j.$idCol").cast("string")),
        lit(1000000007L)))
    }
    parsed.groupBy("shard").agg(
      count(lit(1)).as("n_docs"),
      idSum.as("id_sum"),
      sum(pmod(Dedup.h60(col(s"j.$textCol")), lit(1000000007L))).as("text_sum"))
  }
}
