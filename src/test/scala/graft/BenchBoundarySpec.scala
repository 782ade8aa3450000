package graft

/** Pins the bench-boundary housekeeping contract (GraftSession.releaseCaches
  * / quiesce / syncBarrier): boundary calls must be safe on a live session —
  * running queries before AND after them — and must actually drop cached
  * storage, because Bench charges none of this work to any query and a
  * boundary that broke the session would surface as a bogus `err:` entry on
  * whatever query runs next.
  */
class BenchBoundarySpec extends SparkSpec {

  test("quiesce is safe on a live session and queries run after it") {
    val before = spark.range(1000).selectExpr("sum(id) AS s").collect()(0).getLong(0)
    GraftSession.quiesce(spark)
    val after = spark.range(1000).selectExpr("sum(id) AS s").collect()(0).getLong(0)
    assert(before == after)
  }

  test("releaseCaches drops session-cached frames") {
    val df = spark.range(5000).toDF("id")
    df.cache().count()
    assert(!spark.sharedState.cacheManager.isEmpty)
    GraftSession.releaseCaches(spark)
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("syncBarrier completes (flush is untimed boundary work, never a query's)") {
    GraftSession.syncBarrier() // must not throw, with or without a sync binary
  }
}
