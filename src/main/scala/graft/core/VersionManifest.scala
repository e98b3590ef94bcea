package graft.core

import org.json4s._
import org.json4s.jackson.Serialization

/** Per-file statistics kept in the version manifest — the Spark-native
  * analog of the reference's TABLE_INDEX segment, which stores one row per
  * data segment with its index [start, end) for row-slice pruning
  * (reference: cpp/arcticdb/pipeline/index_segment_reader.cpp,
  * docs/mkdocs/docs/technical/on_disk_storage.md:41-56).
  *
  * minIdx/maxIdx are in the index column's canonical long unit (ns for
  * long indexes, µs for timestamp indexes); for STRING-keyed indexes
  * (the reference's four index kinds include a string TableIndex,
  * cpp/arcticdb/stream/index.hpp:84) the bounds live in minStr/maxStr
  * instead (lexicographic UTF-8 order — the order Spark's range
  * partitioner and parquet's binary stats both use). rowOffset is the
  * cumulative row count of all preceding files in index order — this is
  * what makes head/tail/row_range a FILE-PRUNING operation instead of a
  * global sort.
  */
final case class FileEntry(
    path: String,
    rows: Long,
    rowOffset: Long,
    minIdx: Option[Long],
    maxIdx: Option[Long],
    minStr: Option[String] = None,
    maxStr: Option[String] = None)

/** One immutable version of a symbol — the analog of the reference's
  * VERSION key pointing at a TABLE_INDEX (cpp/arcticdb/entity/key.hpp:62-123).
  * Versions only ever ADD manifest files; data files are shared across
  * versions (append reuses every prior file — the reference's fast append,
  * library.py:1361).
  */
final case class VersionManifest(
    version: Int,
    indexCol: Option[String],
    sorted: Boolean,
    files: Vector[FileEntry],
    rowCount: Long,
    createdAtMs: Long,
    schemaDdl: String,
    deleted: Boolean = false,
    metadata: Map[String, String] = Map.empty,
    /** Physical schema each data directory was written with — needed under
      * dynamic schema, where files written before an evolution keep their
      * original layout and are aligned at read time. Missing entry ⇒ the
      * dir was written with `schemaDdl` (pre-dynamic manifests).
      */
    dirSchemas: Map[String, String] = Map.empty,
    /** Delta STORAGE encoding (Library.commitManifest) — the scale fix
      * for manifest write amplification: a 100 TB symbol holds ~10⁵ file
      * entries, and storing the full list per version makes every daily
      * append an O(all files) manifest rewrite. When `baseVersion` is
      * set, the stored `files` is EMPTY and the logical list is
      * base.files minus `removedPaths` plus `addedFiles`, re-sorted by
      * rowOffset (each entry carries its own offset, so order is
      * recoverable). Library.manifest() resolves chains transparently —
      * no reader below it ever sees a delta — and full "checkpoint"
      * manifests bound chain length (same shape as Delta Lake's
      * log-plus-checkpoint). `chainDepth` is the stored chain length
      * (0 = full), used only to decide when to checkpoint.
      */
    baseVersion: Option[Int] = None,
    addedFiles: Vector[FileEntry] = Vector.empty,
    removedPaths: Vector[String] = Vector.empty,
    chainDepth: Int = 0)

object VersionManifest {
  implicit val formats: Formats = Serialization.formats(NoTypeHints)
  // compact, not pretty: at 10^5 file entries pretty-printing roughly
  // doubles every manifest and checkpoint on disk and over the wire
  def toJson(m: VersionManifest): String = Serialization.write(m)
  def fromJson(s: String): VersionManifest = Serialization.read[VersionManifest](s)
}

/** Named cross-symbol consistent view (reference: library.py:2626
  * `snapshot`, cpp/arcticdb/version/snapshot.cpp). `versions` may pin
  * non-latest versions; `metadata` is caller-provided annotation.
  */
final case class SnapshotManifest(
    name: String,
    createdAtMs: Long,
    versions: Map[String, Int],
    metadata: Map[String, String] = Map.empty)

object SnapshotManifest {
  implicit val formats: Formats = Serialization.formats(NoTypeHints)
  def toJson(m: SnapshotManifest): String = Serialization.writePretty(m)
  def fromJson(s: String): SnapshotManifest = Serialization.read[SnapshotManifest](s)
}
