package graft.operators

import graft.{Q, Tables}
import graft.plans.TopKPerGroup
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.functions._

/** Public API for the custom TopKPerGroup operator (graft.plans): keep the
  * top-k rows per group without a global sort — partial bounded-heap
  * reduction before the shuffle, final reduction after (see the plan-shape
  * assertions in TopKSpec).
  */
object TopK {

  /** keep the top `k` rows of each group, ranked by `orderCols` (wrap a
    * column with `.desc`/`.asc` to pick direction; default ascending)
    */
  def perGroup(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column], k: Int): DataFrame = {
    require(groupCols.nonEmpty,
      "TopK.perGroup needs at least one group column (use orderBy().limit(k) for global top-k)")
    require(k >= 1, s"k must be >= 1, got $k")
    val s = df.sparkSession
    val order = orderCols.map(c => GraftBridge.expression(s, c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    GraftBridge.ofRows(s,
      TopKPerGroup(groupCols.map(GraftBridge.expression(s, _)), order, k,
        df.queryExecution.analyzed))
  }

  /** top-2 most expensive orders per customer via the custom operator —
    * same semantics as the window formulation, so the SQL oracle checks the
    * whole custom plan path end to end.
    */
  val qTopKPerGroup: Q = Q(
    "q_topk_pergroup",
    (s, dir) => {
      val t = Tables(s, dir)
      perGroup(t.orders,
        groupCols = Seq(col("o_custkey")),
        orderCols = Seq(col("o_totalprice").desc, col("o_orderkey").asc),
        k = 2)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) sub
    WHERE rn <= 2 ORDER BY o_custkey, o_orderkey""")
  )

  val all: Seq[Q] = Seq(qTopKPerGroup)
}
