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
    // `listen` arg: print each streaming micro-batch's progress durations
    // (triggerExecution / addBatch / walCommit / stateOps) while queries run
    if (names0.contains("listen")) {
      spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit =
          println(s"[listen] started ${e.name} ${e.id}")
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          val p = e.progress
          val dur = p.durationMs
          val states = p.stateOperators.map(so =>
            s"upd=${so.allUpdatesTimeMs} rm=${so.allRemovalsTimeMs} commit=${so.commitTimeMs}ms " +
              s"rows=${so.numRowsTotal} mem=${so.memoryUsedBytes} " +
              s"custom=${so.customMetrics}").mkString(";")
          println(s"[listen] batch=${p.batchId} rows=${p.numInputRows} dur=$dur state[$states]")
        }
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
          println(s"[listen] terminated ${e.id}")
      })
    }
    // `aqeplans` arg: print the EXECUTED physical plan of every batch query
    // that contains a join — post-AQE (isFinalPlan=true), so the receipt
    // shows what actually ran inside sink landings, not the static plan
    if (names0.contains("aqeplans")) {
      spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
          val p = qe.executedPlan.toString
          if (p.contains("Join")) {
            println(s"===== [aqeplan] $funcName ${durationNs / 1e9}%s =====")
            println(p.linesIterator.take(80).mkString("\n"))
          }
        }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, ex: Exception): Unit = ()
      })
    }
    // `jobs` arg: print every Spark job's wall time + description
    if (names0.contains("jobs")) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val d = Option(e.properties).flatMap(p =>
            Option(p.getProperty("spark.job.description"))).orElse(
            Option(e.properties).flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("")
          starts.put(e.jobId, (e.time, d))
        }
        override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = starts.remove(e.jobId)
          if (s != null)
            println(f"[job] ${e.jobId}%4d ${(e.time - s._1) / 1e3}%8.3fs  ${s._2.take(110)}")
        }
      })
    }
    // `lakewrite` arg: decompose the cost of one lake commit at this SF —
    // raw parquet write vs cat.write (write + footer-stats sidecar +
    // manifest publish), 5 reps each, medians printed
    if (names0.contains("lakewrite")) {
      import org.apache.spark.sql.functions.col
      val orders = Tables(spark, dir).orders
        .select("o_orderkey", "o_custkey", "o_totalprice")
      orders.count() // warm the scan
      def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
      val tmp = java.nio.file.Files.createTempDirectory("graft_lw_")
      def time(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val raw = (1 to 5).map(i => time(
        orders.write.parquet(tmp.resolve(s"raw$i").toString)))
      val cat = graft.lake.LakeCatalog(spark, tmp.resolve("lake").toString)
      val full = (1 to 5).map(i => time(
        cat.write("lw", s"t$i", orders)))
      val append = (1 to 5).map(i => time(
        cat.write("lw", "t1", orders, org.apache.spark.sql.SaveMode.Append)))
      println(f"[lakewrite] raw parquet write median ${med(raw)}%.3fs  " +
        f"cat.write(create) ${med(full)}%.3fs  cat.write(append) ${med(append)}%.3fs")
    }
    for (n <- names if n.startsWith("sql:")) {
      spark.sql(n.stripPrefix("sql:")).show(20, truncate = false)
    }
    // `explainall` arg: dump .explain("formatted") of every NON-STREAM query
    // (stream entries run queries internally; their evidence is traces) to
    // stdout, delimited per entry — the plan-scan artifact source
    if (names0.contains("explainall")) {
      for (n <- SparkEntry.queries.keys.toSeq.sorted if !n.startsWith("stream_")) {
        println(s"===== $n =====")
        try SparkEntry.queries(n)(spark, dir).explain("formatted")
        catch { case e: Throwable =>
          println(s"[explainall] $n failed: ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    }
    for (n <- names if n.startsWith("explain:")) {
      val q = n.stripPrefix("explain:")
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    for (n <- names if !n.startsWith("sql:") && !n.startsWith("explain:") &&
        n != "listen" && n != "jobs" && n != "lakewrite" && n != "aqeplans" && n != "explainall") {
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(n)(spark, dir).count()
      println(f"[debug] $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$cnt")
    }
    spark.stop()
  }
}
