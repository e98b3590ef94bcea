package graft.core

import org.apache.hadoop.fs.{FileAlreadyExistsException, FileSystem, Path}

import java.io.IOException
import java.nio.charset.StandardCharsets
import java.util.UUID

/** The ONE primitive every manifest commit reduces to: publish a small
  * immutable file at `target` iff nothing is there yet — ATOMICALLY, so
  * that of N concurrent committers of the same target exactly one wins
  * (returns true) and every loser sees false with the winner's file
  * intact. This is what makes version numbers a CAS and gives the store
  * its single-winner-per-version guarantee (stronger than the
  * reference's last-writer-wins VERSION_REF,
  * docs/mkdocs/docs/technical/on_disk_storage.md:29-31).
  *
  * One implementation per backend family, because "atomic no-overwrite"
  * is spelled differently on each:
  *
  *  - POSIX/local: hard LINK — link(2) fails with EEXIST atomically.
  *    rename(2) silently REPLACES an existing destination, so it is NOT
  *    a CAS here (caught by the six-concurrent-writer race spec).
  *  - HDFS: rename REFUSES an existing destination — rename is the CAS.
  *  - S3/S3A: conditional PUT (`If-None-Match: *`). The object store has
  *    no rename at all (S3A "rename" is copy+delete — neither atomic nor
  *    no-overwrite), so the conditional create is the only sound
  *    primitive: `create(target, overwrite=false)` buffers locally and
  *    the S3A connector (Hadoop 3.4+, fs.s3a.create.conditional.enabled)
  *    issues the PUT at close() with If-None-Match, surfacing a lost
  *    race as FileAlreadyExistsException/RemoteFileChangedException at
  *    CLOSE time — which is why the loser check here happens at both
  *    create and close.
  *
  * The race spec (LibrarySpec) drives these primitives directly — the
  * S3 branch races six writers against an in-test FileSystem that
  * emulates S3's conditional-PUT-at-close semantics, so the loser/winner
  * logic is proven without an object store.
  */
private[graft] sealed trait CommitCas {
  /** Publish `content` at `target` iff absent. True = this caller won. */
  def commit(fs: FileSystem, target: Path, content: String): Boolean
}

private[graft] object CommitCas {

  /** Pick the primitive for a filesystem: object stores commit via
    * conditional PUT, the local FS via hard link, everything else
    * (HDFS-like) via no-overwrite rename.
    */
  def forFs(fs: FileSystem): CommitCas = fs.getScheme match {
    case "s3a" | "s3" | "s3n" => ConditionalPut
    case _
        if fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
          fs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem] =>
      Link
    case _ => Rename
  }

  private def writeTmp(fs: FileSystem, target: Path, content: String): Path = {
    val tmp = new Path(target.getParent, s".tmp-${UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    tmp
  }

  /** POSIX local FS: write a temp sibling, hard-link it to the target
    * (link(2) EEXIST is the atomic loser signal), drop the temp.
    */
  case object Link extends CommitCas {
    def commit(fs: FileSystem, target: Path, content: String): Boolean = {
      val tmp = writeTmp(fs, target, content)
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(target.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      } finally fs.delete(tmp, false)
    }
  }

  /** HDFS-family: rename refuses an existing destination, so
    * write-temp + rename IS the CAS. NOT valid on the local FS (rename
    * replaces) or S3A (copy+delete) — forFs never picks it for those.
    */
  case object Rename extends CommitCas {
    def commit(fs: FileSystem, target: Path, content: String): Boolean = {
      val tmp = writeTmp(fs, target, content)
      val ok = fs.rename(tmp, target) && fs.exists(target)
      if (!ok) fs.delete(tmp, false)
      ok
    }
  }

  /** Object stores: create(overwrite=false) → conditional PUT at close.
    * A lost race surfaces as FileAlreadyExistsException at create OR at
    * close (S3A issues the If-None-Match PUT when the stream closes); a
    * close-time IOException with the target now present is the same
    * loser signal spelled by an older connector.
    */
  case object ConditionalPut extends CommitCas {
    def commit(fs: FileSystem, target: Path, content: String): Boolean = {
      val out =
        try fs.create(target, false)
        catch { case _: FileAlreadyExistsException => return false }
      try {
        out.write(content.getBytes(StandardCharsets.UTF_8))
        out.close()
        true
      } catch {
        case _: FileAlreadyExistsException => false
        case _: IOException if fs.exists(target) => false
      }
    }
  }
}
