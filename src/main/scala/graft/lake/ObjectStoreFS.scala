package graft.lake

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, FileNotFoundException, IOException}
import java.net.URI
import java.util.concurrent.{ConcurrentHashMap, ConcurrentSkipListMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FileAlreadyExistsException, FileStatus, FileSystem, Path, PositionedReadable, Seekable}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** In-process Hadoop `FileSystem` with OBJECT-STORE semantics — the
  * S3-shaped store this environment cannot run for real (no MinIO / s3a
  * endpoint; the reference configures one at spark_config.py:86-101),
  * emulated at the `FileSystem` API so the ENTIRE engine — Spark parquet
  * scans and commits, LakeCatalog manifests, bloom/stats sidecars, the
  * optimistic-commit protocol — runs against object-store behavior
  * end-to-end rather than only at the [[CommitBackend]] seam:
  *
  *   - FLAT KEY SPACE: directories are virtual. `mkdirs` records a zero-byte
  *     marker (as s3a does), `exists(dir)` is true iff a marker or any
  *     deeper key exists, and deleting the last object under a prefix makes
  *     the "directory" vanish.
  *   - NO ATOMIC RENAME: rename is list + per-object copy + delete — the
  *     multi-step sequence S3 actually performs. A concurrently observed
  *     rename is visibly partial, exactly the window the commit protocol's
  *     CAS must tolerate (see [[CommitBackend]]'s guarantee matrix and
  *     ObjectStoreCommitSpec).
  *   - PLAIN PUT CREATE: `create(overwrite = false)` is check-then-put, not
  *     O_EXCL — the honest object-store caveat for lock files.
  *   - STRONG read-after-write list/read consistency (modern S3/GCS).
  *
  * Registered under scheme `graftoss://` by GraftSession
  * (`fs.graftoss.impl`), so `LakeCatalog(spark, "graftoss://bucket/wh")`
  * just works. Contents live in a JVM-global map keyed by bucket
  * (authority) — intentionally process-local: this is a semantics harness,
  * not a distributed store, and it is only meaningful where driver and
  * executors share the JVM (local mode / tests).
  */
final class ObjectStoreFS extends FileSystem {

  private var fsUri: URI = _
  private var workingDir: Path = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    fsUri = URI.create(
      s"${name.getScheme}://${Option(name.getAuthority).getOrElse("")}")
    workingDir = new Path(fsUri.toString + "/")
  }

  override def getScheme: String = "graftoss"
  override def getUri: URI = fsUri
  override def getWorkingDirectory: Path = workingDir
  override def setWorkingDirectory(dir: Path): Unit = { workingDir = dir }

  private def store: ConcurrentSkipListMap[String, ObjectStoreFS.Obj] =
    ObjectStoreFS.bucket(Option(fsUri.getAuthority).getOrElse(""))

  /** Canonical object key of a path: absolute, no trailing slash, "" = root. */
  private def key(p: Path): String = {
    val abs = makeQualified(p).toUri.getPath
    val trimmed = abs.dropWhile(_ == '/')
    if (trimmed.endsWith("/")) trimmed.dropRight(1) else trimmed
  }

  private def dirMarker(k: String): String = if (k.isEmpty) "" else k + "/"

  private def isDir(k: String): Boolean =
    k.isEmpty || store.containsKey(dirMarker(k)) || {
      val probe = store.ceilingKey(k + "/")
      probe != null && probe.startsWith(k + "/")
    }

  private def pathOf(k: String): Path = new Path(s"$fsUri/$k")

  private def fileStatusOf(k: String, o: ObjectStoreFS.Obj): FileStatus =
    new FileStatus(o.bytes.length.toLong, false, 1, ObjectStoreFS.BlockSize,
      o.mtime, pathOf(k))

  private def dirStatusOf(k: String): FileStatus =
    new FileStatus(0L, true, 1, ObjectStoreFS.BlockSize, 0L, pathOf(k))

  override def getFileStatus(f: Path): FileStatus = {
    val k = key(f)
    val o = store.get(k)
    if (o != null) fileStatusOf(k, o)
    else if (isDir(k)) dirStatusOf(k)
    else throw new FileNotFoundException(s"graftoss: no such object: $f")
  }

  override def exists(f: Path): Boolean = {
    val k = key(f)
    store.containsKey(k) || isDir(k)
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val k = key(f)
    if (store.containsKey(k)) return Array(fileStatusOf(k, store.get(k)))
    if (!isDir(k)) throw new FileNotFoundException(s"graftoss: no such object: $f")
    val prefix = if (k.isEmpty) "" else k + "/"
    val out = scala.collection.mutable.LinkedHashMap.empty[String, FileStatus]
    // strongly-consistent LIST over the sorted key space, first level only
    store.tailMap(prefix).asScala.iterator
      .takeWhile { case (kk, _) => kk.startsWith(prefix) }
      .foreach { case (kk, o) =>
        val rest = kk.substring(prefix.length)
        if (rest.nonEmpty) {
          val slash = rest.indexOf('/')
          if (slash < 0) out.getOrElseUpdate(kk, fileStatusOf(kk, o))
          else {
            val child = prefix + rest.substring(0, slash)
            out.getOrElseUpdate(child + "/", dirStatusOf(child))
          }
        }
      }
    out.values.toArray
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val o = store.get(key(f))
    if (o == null) throw new FileNotFoundException(s"graftoss: no such object: $f")
    new FSDataInputStream(new ObjectStoreFS.SeekableBytes(o.bytes))
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val k = key(f)
    // check-then-put: the object-store caveat, NOT O_EXCL (a racing
    // create(overwrite=false) can still both "succeed" — by design)
    if (!overwrite && store.containsKey(k))
      throw new FileAlreadyExistsException(s"graftoss: object exists: $f")
    if (isDir(k) && store.containsKey(dirMarker(k)))
      throw new FileAlreadyExistsException(s"graftoss: is a directory: $f")
    val buf = new ByteArrayOutputStream()
    val out = new java.io.FilterOutputStream(buf) {
      override def close(): Unit = {
        super.close()
        // single-key PUT is atomic and replaces whatever is there now
        store.put(k, ObjectStoreFS.Obj(buf.toByteArray, System.currentTimeMillis()))
      }
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        buf.write(b, off, len)
    }
    new FSDataOutputStream(out, statistics)
  }

  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new IOException("graftoss: append is not supported on an object store")

  /** Non-atomic multi-step rename: list, copy each object, delete each
    * source — how S3 "renames". Hadoop dir-into-dir semantics preserved
    * (rename(src, existingDir) moves src UNDER it) because the parquet
    * FileOutputCommitter depends on them.
    */
  override def rename(src: Path, dst: Path): Boolean = {
    val sk = key(src)
    val srcIsFile = store.containsKey(sk)
    if (!srcIsFile && !isDir(sk)) return false
    var dk = key(dst)
    if (store.containsKey(dk)) return false // dst is an existing file
    if (isDir(dk)) // Hadoop semantics: move src UNDER an existing dir
      dk = if (dk.isEmpty) src.getName else dk + "/" + src.getName
    if (dk == sk) return true
    if (dk.startsWith(sk + "/")) return false // into own subtree
    if (srcIsFile) {
      val o = store.get(sk)
      store.put(dk, o.copy(mtime = System.currentTimeMillis()))
      store.remove(sk)
    } else {
      val prefix = sk + "/"
      val keys = store.tailMap(prefix).asScala.keysIterator
        .takeWhile(_.startsWith(prefix)).toVector
      val marker = dirMarker(sk)
      val all = if (store.containsKey(marker)) marker +: keys else keys
      // copy then delete, object by object — observably partial mid-flight
      all.foreach { kk =>
        val target =
          if (kk == marker) dirMarker(dk)
          else dk + "/" + kk.substring(prefix.length)
        store.put(target, store.get(kk))
      }
      all.foreach(store.remove)
    }
    true
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val k = key(f)
    if (store.remove(k) != null) return true
    if (!isDir(k)) return false
    val prefix = if (k.isEmpty) "" else k + "/"
    val children = store.tailMap(prefix).asScala.keysIterator
      .takeWhile(_.startsWith(prefix)).filterNot(_ == prefix).toVector
    if (children.nonEmpty && !recursive)
      throw new IOException(s"graftoss: directory not empty: $f")
    children.foreach(store.remove)
    store.remove(prefix)
    true
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    val k = key(f)
    if (store.containsKey(k))
      throw new FileAlreadyExistsException(s"graftoss: object exists: $f")
    // zero-byte marker, like s3a: makes the empty "directory" listable
    if (!k.isEmpty && !store.containsKey(dirMarker(k)))
      store.put(dirMarker(k), ObjectStoreFS.Obj(Array.emptyByteArray, System.currentTimeMillis()))
    true
  }
}

object ObjectStoreFS {
  val BlockSize: Long = 32L * 1024 * 1024

  final case class Obj(bytes: Array[Byte], mtime: Long)

  // JVM-global store: bucket (URI authority) -> sorted key space. Sorted so
  // LIST-by-prefix is the O(log n + answer) scan an object store performs.
  private val buckets =
    new ConcurrentHashMap[String, ConcurrentSkipListMap[String, Obj]]()

  private[lake] def bucket(name: String): ConcurrentSkipListMap[String, Obj] =
    buckets.computeIfAbsent(name, _ => new ConcurrentSkipListMap[String, Obj]())

  /** Drop every object in `name` — spec teardown. */
  def clearBucket(name: String): Unit = buckets.remove(name)

  /** CONDITIONAL PUT — the S3 `If-None-Match: *` / GCS
    * `ifGenerationMatch=0` primitive (public API on both stores since
    * 2024/always, respectively): atomically create `path` with `bytes`
    * iff no object exists at that key; true iff this caller created it.
    *
    * Deliberately NOT part of the Hadoop FileSystem surface — real object
    * stores expose it as an extra request header the generic FS API does
    * not carry, so consumers that need the atomicity (the commit
    * protocol's version claim/publish, via [[ObjectStoreCommitBackend]])
    * must reach for it explicitly, and everything else keeps the honest
    * check-then-put semantics.
    */
  def putIfAbsent(path: Path, bytes: Array[Byte]): Boolean = {
    val uri = path.toUri
    require(uri.getScheme == "graftoss", s"not a graftoss path: $path")
    val key = uri.getPath.dropWhile(_ == '/')
    bucket(Option(uri.getAuthority).getOrElse(""))
      .putIfAbsent(key, Obj(bytes, System.currentTimeMillis())) == null
  }

  /** Bytes currently held across all buckets (leak canary for specs). */
  def totalBytes: Long = buckets.asScala.valuesIterator
    .flatMap(_.asScala.valuesIterator).map(_.bytes.length.toLong).sum

  /** Byte-backed read stream with the seek/pread surface parquet needs. */
  private final class SeekableBytes(bytes: Array[Byte])
      extends ByteArrayInputStream(bytes) with Seekable with PositionedReadable {
    def seek(p: Long): Unit = {
      if (p < 0 || p > bytes.length) throw new IOException(s"seek past end: $p")
      pos = p.toInt
    }
    def getPos: Long = pos.toLong
    def seekToNewSource(targetPos: Long): Boolean = false
    def read(position: Long, buffer: Array[Byte], offset: Int, length: Int): Int = {
      if (position >= bytes.length) return -1
      val n = math.min(length, bytes.length - position.toInt)
      System.arraycopy(bytes, position.toInt, buffer, offset, n)
      n
    }
    def readFully(position: Long, buffer: Array[Byte], offset: Int, length: Int): Unit = {
      if (position + length > bytes.length)
        throw new java.io.EOFException(s"readFully past end: $position+$length > ${bytes.length}")
      System.arraycopy(bytes, position.toInt, buffer, offset, length)
    }
    def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }
}
