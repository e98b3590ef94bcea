package graft

import java.net.URI
import java.util.concurrent.{Callable, CyclicBarrier, Executors}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataOutputStream, FileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import org.scalatest.funsuite.AnyFunSuite

import graft.core.CommitCas

/** Emulates S3's conditional-PUT-at-close semantics on the local disk:
  * nothing is visible until close(), and close() atomically publishes iff
  * the target is absent — else it throws FileAlreadyExistsException,
  * exactly what the S3A connector surfaces for a lost If-None-Match PUT
  * (Hadoop 3.4+ fs.s3a.create.conditional.enabled). Lets the race spec
  * prove the ConditionalPut primitive's winner/loser logic without an
  * object store.
  */
class S3ConditionalPutFs extends RawLocalFileSystem {
  override def getScheme: String = "s3a"

  private def conditional(f: Path)(fallback: => FSDataOutputStream): FSDataOutputStream = {
    val buf = new java.io.ByteArrayOutputStream()
    val local = pathToFile(f)
    new FSDataOutputStream(buf, null) {
      override def close(): Unit = S3ConditionalPutFs.lock.synchronized {
        if (local.exists())
          throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
        local.getParentFile.mkdirs()
        val o = new java.io.FileOutputStream(local)
        try o.write(buf.toByteArray) finally o.close()
      }
    }
  }

  override def create(
      f: Path,
      overwrite: Boolean,
      bufferSize: Int,
      replication: Short,
      blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    if (overwrite) super.create(f, overwrite, bufferSize, replication, blockSize, progress)
    else conditional(f)(super.create(f, overwrite, bufferSize, replication, blockSize, progress))

  override def create(
      f: Path,
      permission: FsPermission,
      overwrite: Boolean,
      bufferSize: Int,
      replication: Short,
      blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    if (overwrite)
      super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)
    else
      conditional(f)(
        super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress))
}
object S3ConditionalPutFs { val lock = new Object }

/** The manifest-commit primitives raced DIRECTLY: of six concurrent
  * committers of one target, exactly one must win and the winner's
  * content must be what survives — on the local-FS hard-link primitive
  * and on the S3 conditional-PUT primitive (against the emulated
  * conditional-put filesystem above). This is the contract Library's
  * version CAS stands on for every backend.
  */
class CommitCasSpec extends AnyFunSuite {

  private def localFs(): FileSystem = {
    val fs = new RawLocalFileSystem()
    fs.initialize(URI.create("file:///"), new Configuration())
    fs
  }

  private def s3LikeFs(): FileSystem = {
    val fs = new S3ConditionalPutFs()
    fs.initialize(URI.create("file:///"), new Configuration())
    fs
  }

  private def tmpTarget(): Path =
    new Path(java.nio.file.Files.createTempDirectory("graft-cas-").toString,
      "v00000.json")

  private def read(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  private def raceSix(cas: CommitCas, fs: FileSystem, target: Path): Unit = {
    val pool = Executors.newFixedThreadPool(6)
    try {
      val barrier = new CyclicBarrier(6)
      val futures = (1 to 6).map { i =>
        pool.submit(new Callable[Boolean] {
          def call(): Boolean = { barrier.await(); cas.commit(fs, target, s"writer-$i") }
        })
      }
      val outcomes = futures.map(_.get())
      assert(outcomes.count(identity) == 1,
        s"expected exactly one winner, got ${outcomes.count(identity)}")
      val winner = outcomes.indexOf(true) + 1
      assert(read(fs, target) == s"writer-$winner",
        "surviving content must be the winner's, untorn")
      // no temp litter left behind
      val siblings = fs.listStatus(target.getParent).map(_.getPath.getName)
      assert(!siblings.exists(_.startsWith(".tmp-")), s"temp litter: ${siblings.toSeq}")
    } finally pool.shutdown()
  }

  test("Link primitive: six racing committers, one winner (local FS)") {
    raceSix(CommitCas.Link, localFs(), tmpTarget())
  }

  test("ConditionalPut primitive: six racing committers, one winner (S3 semantics)") {
    raceSix(CommitCas.ConditionalPut, s3LikeFs(), tmpTarget())
  }

  test("ConditionalPut loses cleanly when the target already exists") {
    val fs = s3LikeFs()
    val target = tmpTarget()
    assert(CommitCas.ConditionalPut.commit(fs, target, "first"))
    assert(!CommitCas.ConditionalPut.commit(fs, target, "second"))
    assert(read(fs, target) == "first")
  }

  test("forFs picks the primitive by backend: s3a→ConditionalPut, file→Link") {
    assert(CommitCas.forFs(s3LikeFs()) == CommitCas.ConditionalPut)
    val local = FileSystem.getLocal(new Configuration())
    assert(CommitCas.forFs(local) == CommitCas.Link)
  }

  test("Rename primitive publishes content (HDFS-only CAS; atomicity is HDFS's)") {
    val fs = localFs()
    val target = tmpTarget()
    assert(CommitCas.Rename.commit(fs, target, "hdfs-style"))
    assert(read(fs, target) == "hdfs-style")
    // NOTE: no loser test on the local FS — rename(2) REPLACES an existing
    // destination here, which is exactly why forFs never picks Rename for
    // file:// (HDFS rename refuses an existing destination and IS the CAS).
  }
}
