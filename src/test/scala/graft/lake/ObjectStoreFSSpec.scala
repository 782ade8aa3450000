package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.{FileSystem, Path}

/** [[ObjectStoreFS]] semantics pins: the flat-key-space / virtual-dir /
  * non-atomic-rename behavior every `graftoss://` consumer (Spark parquet
  * committer, LakeCatalog, sidecar IO) depends on. The full lake-family
  * replay over this FS lives in ObjectStoreLakeSpec.
  */
class ObjectStoreFSSpec extends SparkSpec {

  private def fs: FileSystem =
    new Path("graftoss://osfs-spec/x").getFileSystem(
      spark.sparkContext.hadoopConfiguration)

  private def p(s: String) = new Path(s"graftoss://osfs-spec/$s")

  override def afterAll(): Unit = {
    try ObjectStoreFS.clearBucket("osfs-spec")
    finally super.afterAll()
  }

  private def put(path: Path, content: String): Unit = {
    val out = fs.create(path, true)
    out.write(content.getBytes("UTF-8"))
    out.close()
  }

  private def get(path: Path): String = {
    val in = fs.open(path)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  test("put/get/list round-trip with virtual directories") {
    put(p("a/b/one.txt"), "1")
    put(p("a/b/two.txt"), "22")
    put(p("a/c/three.txt"), "333")
    assert(get(p("a/b/one.txt")) == "1")
    // dirs exist by virtue of deeper keys alone
    assert(fs.exists(p("a")) && fs.exists(p("a/b")) && fs.getFileStatus(p("a")).isDirectory)
    val names = fs.listStatus(p("a")).map(_.getPath.getName).sorted.toSeq
    assert(names == Seq("b", "c"))
    val files = fs.listStatus(p("a/b")).map(s => (s.getPath.getName, s.getLen)).sortBy(_._1).toSeq
    assert(files == Seq(("one.txt", 1L), ("two.txt", 2L)))
    // deleting the last object under a prefix makes the "dir" vanish
    fs.delete(p("a/c/three.txt"), false)
    assert(!fs.exists(p("a/c")))
  }

  test("create(overwrite=false) is check-then-put, not O_EXCL") {
    put(p("lock/v1"), "x")
    intercept[java.io.IOException] { fs.create(p("lock/v1"), false) }
    // a plain PUT replaces
    put(p("lock/v1"), "y")
    assert(get(p("lock/v1")) == "y")
  }

  test("rename moves whole prefixes per-object and refuses existing file targets") {
    put(p("src/d1/f1"), "a")
    put(p("src/d1/sub/f2"), "bb")
    assert(fs.rename(p("src/d1"), p("dst/d2")))
    assert(!fs.exists(p("src/d1")))
    assert(get(p("dst/d2/f1")) == "a" && get(p("dst/d2/sub/f2")) == "bb")
    // file onto existing file: refused (the committer's guard relies on it)
    put(p("r/x"), "1"); put(p("r/y"), "2")
    assert(!fs.rename(p("r/x"), p("r/y")))
    // dir into EXISTING dir: moves under it (Hadoop semantics)
    fs.mkdirs(p("into"))
    assert(fs.rename(p("dst/d2"), p("into")))
    assert(get(p("into/d2/f1")) == "a")
  }

  test("seek/pread surface supports parquet reads and writes end-to-end") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"row_$i")).toDF("id", "name")
    val out = "graftoss://osfs-spec/pq/t1"
    df.write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == 1000)
    assert(back.filter($"id" === 500L).select("name").head().getString(0) == "row_500")
    // column-pruned + filtered scan exercises footer seeks and pread
    assert(back.select("id").where($"id" > 990).count() == 10)
  }

  test("partitioned parquet write + partition discovery work on the stub") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i, if (i % 2 == 0) "even" else "odd")).toDF("n", "par")
    val out = "graftoss://osfs-spec/pq/t2"
    df.write.mode("overwrite").partitionBy("par").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.where($"par" === "even").count() == 50)
  }
}
