package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("every registered relational query returns rows at sf0.001") {
    // q_anti_join is legitimately empty at sf0.001 (every customer has
    // orders there); the partition test below still pins its semantics.
    for (q <- Relational.all if q.name != "q_anti_join") {
      val n = q.fn(spark, sfDir).count()
      assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("q1 groups are the distinct (returnflag, linestatus) pairs") {
    val df = Relational.q1PricingSummary.fn(spark, sfDir)
    val n = df.count()
    assert(n >= 1 && n <= 6)
    // exact decimal accounting: sum_disc_price <= sum_base_price
    val bad = df.filter(col("sum_disc_price") > col("sum_base_price")).count()
    assert(bad == 0)
  }

  test("semi + anti join partition the customer table") {
    val t = graft.Tables(spark, sfDir)
    val total = t.customer.count()
    val semi = Relational.qSemiJoin.fn(spark, sfDir).count()
    val anti = Relational.qAntiJoin.fn(spark, sfDir).count()
    assert(semi + anti == total)
  }

  test("window top-n yields at most 2 rows per customer, ranked") {
    val df = Relational.qWindowTopN.fn(spark, sfDir)
    val overMax = df.groupBy("o_custkey").count().filter(col("count") > 2).count()
    assert(overMax == 0)
    assert(df.filter(col("rn") > 2).count() == 0)
  }

  test("sessionize: session ids are dense per user starting at 1") {
    val df = Relational.qSessionize.fn(spark, sfDir)
    val byUser = df.groupBy("user_id")
      .agg(min("session_id").as("mn"), max("session_id").as("mx"), count(lit(1)).as("n"))
    assert(byUser.filter(col("mn") =!= 1 || col("mx") =!= col("n")).count() == 0)
  }

  test("approx sketches stay within error bounds of exact values") {
    val t = graft.Tables(spark, sfDir)
    val approx = Relational.qApproxSketches.fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = t.events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("u"),
        expr("percentile(value, 0.5)").as("med"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    for ((typ, (eu, emed)) <- exact) {
      val (au, amed) = approx(typ)
      assert(math.abs(au - eu).toDouble / eu <= 0.10, s"$typ distinct: $au vs $eu")
      assert(math.abs(amed - emed) <= math.max(1.0, emed * 0.25), s"$typ median: $amed vs $emed")
    }
  }

  test("KMV sketch estimates distinct counts within the k=256 error bound") {
    val t = graft.Tables(spark, sfDir)
    val est = Relational.qSketchKmv.fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = t.events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    for ((typ, eu) <- exact) {
      val au = est(typ)
      // std error of KMV at k=256 is ~1/sqrt(k-2) ≈ 6.3%; 4 sigma bound,
      // and exact-below-k groups must match exactly
      if (eu < 256) assert(au == eu, s"$typ below-k must be exact: $au vs $eu")
      else assert(math.abs(au - eu).toDouble / eu <= 0.25, s"$typ kmv: $au vs $eu")
    }
  }

  test("as-of join picks the latest rate at or before each ship date") {
    val df = Relational.qAsofJoin.fn(spark, sfDir)
    assert(df.filter(col("rate_date").isNull).count() == 0)
    // every lineitem appears exactly once
    assert(df.count() == graft.Tables(spark, sfDir).lineitem.count())
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracleSql keys line up") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.registry.map(_.name).distinct.size == SparkEntry.registry.size)
  }
}
