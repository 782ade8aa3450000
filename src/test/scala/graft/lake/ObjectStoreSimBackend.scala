package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}

/** Commit-backend test double with OBJECT-STORE semantics over a local
  * FileSystem — the S3-shaped store the environment cannot run for real
  * (no MinIO), simulated at the exact seam the commit protocol depends on:
  *
  *   - NO exclusive create: `createExclusive` is check-then-create, and the
  *     `interleaveOnClaim` hook fires BETWEEN the check and the create so a
  *     spec can schedule a rival writer inside the race window
  *     deterministically.
  *   - NO atomic rename: `renameIfAbsent` is exists-check + copy + delete
  *     (how S3 "renames"), with `interleaveOnPublish` in the same window. A
  *     late copy silently OVERWRITES the destination, as a plain S3 PUT
  *     does.
  *   - STRONG list/read-after-write consistency (modern S3/GCS, post-2020).
  *
  * `conditionalPut = true` restores atomicity of both operations —
  * modelling S3 `If-None-Match` / GCS `ifGenerationMatch=0` / an Iceberg
  * REST-catalog commit endpoint. ObjectStoreCommitSpec pins exactly which
  * protocol guarantees hold in each mode.
  */
final class ObjectStoreSimBackend(
    fs: FileSystem,
    conditionalPut: Boolean = false) extends CommitBackend {

  /** Fire between the exists-check and the mutation of createExclusive /
    * renameIfAbsent; a spec installs these to interleave a rival writer
    * inside the non-atomic window. Hooks do not re-fire for operations the
    * rival performs from inside a hook (per-thread guard).
    */
  @volatile var interleaveOnClaim: () => Unit = () => ()
  @volatile var interleaveOnPublish: () => Unit = () => ()

  // single-key PUTs are atomic on an object store; it's the multi-step
  // check-then-act sequences that race
  private val putLock = new Object
  private val inHook = new ThreadLocal[java.lang.Boolean] { override def initialValue = false }

  private def fire(hook: () => Unit): Unit =
    if (!inHook.get()) {
      inHook.set(true)
      try hook() finally inHook.set(false)
    }

  def mkdirs(dir: Path): Unit = { fs.mkdirs(dir); () }
  def exists(p: Path): Boolean = fs.exists(p)
  def list(dir: Path): Seq[String] =
    if (!fs.exists(dir)) Nil else fs.listStatus(dir).map(_.getPath.getName).toSeq
  def readBytes(p: Path): Array[Byte] =
    scala.util.Using.resource(fs.open(p))(_.readAllBytes())
  def writeBytes(p: Path, bytes: Array[Byte]): Unit =
    scala.util.Using.resource(fs.create(p, false))(_.write(bytes))

  def createExclusive(p: Path): Boolean =
    if (conditionalPut)
      putLock.synchronized { !fs.exists(p) && { fs.create(p, false).close(); true } }
    else {
      if (fs.exists(p)) false
      else {
        fire(interleaveOnClaim) // ← the race window: no If-None-Match
        // a plain PUT overwrites — both racers "succeed" their create
        putLock.synchronized { fs.create(p, true).close() }
        true
      }
    }

  def mtime(p: Path): Option[Long] =
    try Some(fs.getFileStatus(p).getModificationTime)
    catch { case _: java.io.IOException => None }
  def delete(p: Path): Unit = { fs.delete(p, false); () }

  def renameIfAbsent(src: Path, dst: Path): Boolean =
    if (conditionalPut)
      putLock.synchronized {
        !fs.exists(dst) && { copy(src, dst); fs.delete(src, false); true }
      }
    else {
      if (fs.exists(dst)) false
      else {
        fire(interleaveOnPublish) // ← copy+delete: not atomic, not conditional
        putLock.synchronized { copy(src, dst) }
        fs.delete(src, false)
        true
      }
    }

  private def copy(src: Path, dst: Path): Unit = {
    val bytes = readBytes(src)
    scala.util.Using.resource(fs.create(dst, true))(_.write(bytes))
  }
}
