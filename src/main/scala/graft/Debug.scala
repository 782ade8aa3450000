package graft

/** scratch main for bisecting slow queries — not part of the library */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("graft-debug")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names0 = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    // conf:key=value args apply session conf overrides before running
    val names = names0.filterNot(_.startsWith("conf:"))
    names0.filter(_.startsWith("conf:")).foreach { c =>
      val kv = c.stripPrefix("conf:").split("=", 2)
      spark.conf.set(kv(0), kv(1))
      println(s"[debug] conf ${kv(0)}=${kv(1)}")
    }
    for (n <- names if n.startsWith("sql:")) {
      spark.sql(n.stripPrefix("sql:")).show(20, truncate = false)
    }
    for (n <- names if n.startsWith("explain:")) {
      val q = n.stripPrefix("explain:")
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    for (n <- names if !n.startsWith("sql:") && !n.startsWith("explain:")) {
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(n)(spark, dir).count()
      println(f"[debug] $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$cnt")
    }
    spark.stop()
  }
}
