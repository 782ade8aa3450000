package graft.lake

import java.nio.charset.StandardCharsets
import scala.util.Using

import org.apache.hadoop.fs.{FileSystem, Path}

/** The commit-path IO seam of [[LakeCatalog]]: every metadata operation the
  * optimistic-commit protocol depends on — listing versions, reading/
  * writing manifests, claiming a version lock, publishing a manifest —
  * goes through this interface, so the protocol's guarantees can be stated
  * (and tested) per backend instead of being implicit in FileSystem
  * behavior.
  *
  * Guarantee matrix the protocol relies on:
  *
  *   - `createExclusive` ATOMIC  → at most one writer claims a version.
  *     True on POSIX (O_EXCL) and HDFS; NOT true on plain object stores
  *     (check-then-create window) unless the store offers conditional put
  *     (S3 `If-None-Match`, GCS preconditions) or an external catalog
  *     service arbitrates commits (Iceberg REST catalog).
  *   - `renameIfAbsent` ATOMIC   → a published manifest is complete and
  *     unique. On `file://` this is a hard link (link(2) fails EEXIST
  *     atomically — note plain POSIX rename(2) REPLACES an existing
  *     target, and Hadoop's local rename only guards it with its own
  *     check-then-rename); HDFS rename genuinely fails on an existing
  *     destination; on object stores "rename" is copy+delete and needs
  *     the same conditional-put escape hatch.
  *   - `list`/`exists` CONSISTENT after a completed write → a writer that
  *     reads the latest version sees every published commit. True on
  *     POSIX/HDFS and on modern S3/GCS (strongly consistent since 2020);
  *     caching layers that break it also break the CAS check.
  *
  * [[HadoopCommitBackend]] is the production implementation. The test tree
  * carries an object-store simulator that selectively withdraws the two
  * atomicity guarantees to prove which parts of the protocol survive
  * without them (sequential CAS conflicts do; racing writers need
  * conditional put).
  */
trait CommitBackend {
  def mkdirs(dir: Path): Unit
  def exists(p: Path): Boolean
  /** File names directly under `dir` (empty when the dir is absent). */
  def list(dir: Path): Seq[String]
  def readBytes(p: Path): Array[Byte]
  /** Create `p` with `bytes`; fails if `p` exists. Not required atomic —
    * only used for private temp files with unguessable names.
    */
  def writeBytes(p: Path, bytes: Array[Byte]): Unit
  /** Best-effort exclusive create of an empty file; true iff this caller
    * created it. Atomic where the matrix above says so.
    */
  def createExclusive(p: Path): Boolean
  /** Modification time, None when absent. */
  def mtime(p: Path): Option[Long]
  def delete(p: Path): Unit
  /** Move `src` onto `dst` iff `dst` does not exist; true iff this caller
    * published. Atomic where the matrix above says so.
    */
  def renameIfAbsent(src: Path, dst: Path): Boolean
}

/** Production backend: Hadoop FileSystem semantics (file://, hdfs://,
  * s3a://). On `file://` roots the lock claim uses a POSIX O_EXCL create
  * (truly atomic — Hadoop's local create is only check-then-create); on
  * HDFS, Hadoop's create-exclusive and rename are atomic; on s3a the
  * operations work but carry the object-store caveats documented on
  * [[CommitBackend]].
  */
final class HadoopCommitBackend(fs: FileSystem) extends CommitBackend {
  def mkdirs(dir: Path): Unit = { fs.mkdirs(dir); () }
  def exists(p: Path): Boolean = fs.exists(p)
  def list(dir: Path): Seq[String] =
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).map(_.getPath.getName).toSeq
  def readBytes(p: Path): Array[Byte] =
    Using.resource(fs.open(p))(_.readAllBytes())
  def writeBytes(p: Path, bytes: Array[Byte]): Unit =
    Using.resource(fs.create(p, false))(_.write(bytes))
  def createExclusive(p: Path): Boolean =
    if (fs.getScheme == "file") {
      try {
        java.nio.file.Files.createFile(java.nio.file.Paths.get(p.toUri.getPath))
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException | _: java.io.IOException => false }
    } else {
      try { fs.create(p, false).close(); true }
      catch { case _: java.io.IOException => false }
    }
  def mtime(p: Path): Option[Long] =
    try Some(fs.getFileStatus(p).getModificationTime)
    catch { case _: java.io.IOException => None }
  def delete(p: Path): Unit = { fs.delete(p, false); () }
  def renameIfAbsent(src: Path, dst: Path): Boolean =
    if (fs.getScheme == "file") {
      // truly atomic publish: link(2) fails EEXIST atomically, where
      // rename(2) would replace the destination and Hadoop's local rename
      // only narrows that with a non-atomic exists check. The catch is
      // scoped to the LINK alone: once dst exists the publish HAS
      // happened, and a failing cleanup of the temp name must not be
      // misreported as a lost commit (the caller would raise a conflict
      // for a version it actually published).
      val linked =
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(dst.toUri.getPath),
            java.nio.file.Paths.get(src.toUri.getPath))
          Some(true)
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => Some(false)
          case _: UnsupportedOperationException | _: java.io.IOException => None
        }
      linked match {
        case Some(won) =>
          if (won) { try fs.delete(src, false) catch { case _: java.io.IOException => () }; () }
          won
        case None =>
          // filesystem without hard links: Hadoop's checked rename
          !fs.exists(dst) && fs.rename(src, dst)
      }
    } else !fs.exists(dst) && fs.rename(src, dst)
}

object CommitBackend {
  /** Convenience for text manifests. */
  private[lake] def utf8(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)
  private[lake] def utf8(b: Array[Byte]): String = new String(b, StandardCharsets.UTF_8)
}

/** Commit backend for `graftoss://` warehouses: plain object-store IO for
  * everything EXCEPT the two operations the CAS protocol needs atomic —
  * `createExclusive` (the version-lock claim) and `renameIfAbsent` (the
  * manifest publish) — which route through the store's CONDITIONAL PUT
  * ([[ObjectStoreFS.putIfAbsent]], the S3 `If-None-Match: *` / GCS
  * `ifGenerationMatch=0` escape hatch [[CommitBackend]]'s guarantee
  * matrix names for object stores). With it, concurrent writers racing
  * the same version get exactly one winner — proven end-to-end through
  * the real FileSystem path by ObjectStoreRaceSpec.
  *
  * `renameIfAbsent` becomes read + conditional-put + delete-src: the
  * publish point is the single atomic PUT of the fully-written manifest
  * bytes onto the versioned key, so a reader either sees no manifest or
  * the complete one — the copy window of the FS-level non-atomic rename
  * never exists for commits. (Data dirs still move through the plain FS;
  * their visibility is gated by the manifest, so non-atomic data renames
  * stay invisible to readers.)
  */
final class ObjectStoreCommitBackend(fs: FileSystem) extends CommitBackend {
  private val plain = new HadoopCommitBackend(fs)
  def mkdirs(dir: Path): Unit = plain.mkdirs(dir)
  def exists(p: Path): Boolean = plain.exists(p)
  def list(dir: Path): Seq[String] = plain.list(dir)
  def readBytes(p: Path): Array[Byte] = plain.readBytes(p)
  def writeBytes(p: Path, bytes: Array[Byte]): Unit = plain.writeBytes(p, bytes)
  def mtime(p: Path): Option[Long] = plain.mtime(p)
  def delete(p: Path): Unit = plain.delete(p)
  def createExclusive(p: Path): Boolean =
    ObjectStoreFS.putIfAbsent(fs.makeQualified(p), Array.emptyByteArray)
  def renameIfAbsent(src: Path, dst: Path): Boolean = {
    val bytes = plain.readBytes(src)
    val won = ObjectStoreFS.putIfAbsent(fs.makeQualified(dst), bytes)
    // the publish HAS happened (or lost) at the conditional put; the src
    // cleanup is best-effort either way
    try plain.delete(src) catch { case _: java.io.IOException => () }
    won
  }
}
