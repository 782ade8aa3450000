package graft.operators

import graft.{Q, Tables}
import graft.Num._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Second tranche of the analytical layer (SURVEY §2 C24-C30): the classic
  * TPC-H query shapes expressible over the trimmed star schema — simple
  * predicate aggregation, multi-join top-n, CASE pivot aggregation, ratio
  * metrics, correlated per-group thresholds, HAVING filters, and
  * scalar-subquery anti-joins.
  *
  * Scale notes: `part` joins carry NO broadcast hint — part grows with SF,
  * so the planner (AQE + autoBroadcastJoinThreshold) chooses broadcast at
  * small SF and shuffle at large, instead of a hint forcing an OOM; fact
  * aggregation stays partial; the correlated-threshold query (q17 shape) uses a
  * window over the fact's natural key instead of a per-row subquery — one
  * shuffle on l_partkey, no re-scan. Threshold comparisons are re-expressed
  * division-free (2*qty*cnt < sum) so decimal arithmetic stays exact on
  * both engines.
  */
object RelationalTpch {

  private val D = "DECIMAL(12,2)"

  /** TPC-H Q6 shape: forecast revenue change from a discount band. */
  val q6ForecastRevenue: Q = Q(
    "q6_forecast_revenue",
    (s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .filter(
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
            m(col("l_discount")).between(m(lit(0.05)), m(lit(0.07))) &&
            col("l_quantity") < 24)
        .agg(sum(m(col("l_extendedprice")) * m(col("l_discount")))
          .cast(DoubleType).as("revenue"))
    },
    Some(s"""SELECT CAST(SUM(CAST(l_extendedprice AS $D) * CAST(l_discount AS $D)) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND CAST(l_discount AS $D) BETWEEN CAST(0.05 AS $D) AND CAST(0.07 AS $D)
      AND l_quantity < 24""")
  )

  /** TPC-H Q10 shape: top customers by revenue lost to returned items. */
  val q10ReturnedItems: Q = Q(
    "q10_returned_items",
    (s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .filter(col("l_returnflag") === "R")
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(sum(discPrice).cast(DoubleType).as("revenue"))
        .orderBy(desc("revenue"), asc("c_custkey"))
        .limit(20)
    },
    Some(s"""SELECT c_custkey, c_name, c_acctbal, n_name,
      CAST(SUM(CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $D))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20""")
  )

  /** TPC-H Q12 shape (adapted: no shipmode column): per line-status counts
    * of critical vs ordinary order priorities — the CASE-pivot aggregation.
    */
  val q12PriorityClasses: Q = Q(
    "q12_priority_classes",
    (s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy("l_linestatus")
        .agg(
          sum(when(col("o_orderpriority") === "1-URGENT" ||
            col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority") =!= "1-URGENT" &&
            col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L)).as("low_line_count"))
        .orderBy("l_linestatus")
    },
    Some("""SELECT l_linestatus,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus ORDER BY l_linestatus""")
  )

  /** TPC-H Q14 shape: promo revenue share — a ratio of two exact decimal
    * sums, surfaced as one IEEE double division (identical on both engines).
    */
  val q14PromoRevenue: Q = Q(
    "q14_promo_revenue",
    (s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
        .join(t.part, col("l_partkey") === col("p_partkey"))
        .agg(
          (sum(when(col("p_type").startsWith("PROMO"), discPrice)
            .otherwise(m(lit(0)))).cast(DoubleType) * 100.0 /
            sum(discPrice).cast(DoubleType)).as("promo_revenue"))
    },
    Some(s"""SELECT CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
        THEN CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $D))
        ELSE CAST(0 AS $D) END) AS DOUBLE) * 100.0
      / CAST(SUM(CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $D))) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'""")
  )

  /** TPC-H Q17 shape: revenue from small-quantity line items, threshold =
    * half of that part's average quantity. Re-expressed division-free
    * (2*qty*cnt < sum) so the per-part comparison is integer/decimal-exact,
    * and computed with ONE window over l_partkey instead of a correlated
    * re-scan of lineitem per row.
    */
  val q17SmallQtyRevenue: Q = Q(
    "q17_smallqty_revenue",
    (s, dir) => {
      val t = Tables(s, dir)
      val w = Window.partitionBy("l_partkey")
      t.lineitem
        .withColumn("sum_qty", sum(m(col("l_quantity"))).over(w))
        .withColumn("cnt_qty", count(lit(1)).over(w))
        .filter(m(col("l_quantity")) * 2 * col("cnt_qty") < col("sum_qty"))
        .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
    },
    Some(s"""SELECT CAST(SUM(CAST(l_extendedprice AS $D)) AS DOUBLE) / 7.0 AS avg_yearly
    FROM (
      SELECT l_extendedprice,
        CAST(l_quantity AS $D) * 2 * COUNT(*) OVER (PARTITION BY l_partkey) AS lhs,
        SUM(CAST(l_quantity AS $D)) OVER (PARTITION BY l_partkey) AS rhs
      FROM lineitem) t
    WHERE lhs < rhs""")
  )

  /** TPC-H Q18 shape: large-volume orders (HAVING over a fact groupBy,
    * then rejoined to order/customer detail).
    */
  val q18LargeOrders: Q = Q(
    "q18_large_orders",
    (s, dir) => {
      val t = Tables(s, dir)
      val big = t.lineitem
        .groupBy("l_orderkey")
        .agg(dsum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 110.0)
      big
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("total_qty"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(100)
    },
    Some(s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
    FROM (
      SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS $D)) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING CAST(SUM(CAST(l_quantity AS $D)) AS DOUBLE) > 110.0) big
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")
  )

  /** TPC-H Q19 shape: disjunctive multi-band predicate (brand x size x
    * quantity OR-of-ANDs) — the planner must push a complex boolean tree
    * into the join filter.
    */
  val q19DisjunctiveBands: Q = Q(
    "q19_disjunctive_bands",
    (s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .join(t.part, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 15)) ||
            (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
              col("l_quantity").between(10, 25)) ||
            (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
              col("l_quantity").between(20, 35)))
        .agg(sum(discPrice).cast(DoubleType).as("revenue"))
    },
    Some(s"""SELECT ${"CAST(SUM(CAST(l_extendedprice AS " + D + ") * (1 - CAST(l_discount AS " + D + "))) AS DOUBLE)"} AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 15)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 25)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 35)""")
  )

  /** TPC-H Q22 shape: customers above the positive-balance average with no
    * orders — scalar subquery threshold + anti-join. The threshold compare
    * is division-free (bal * cnt > sum) so it's decimal-exact.
    */
  val q22IdleCustomers: Q = Q(
    "q22_idle_customers",
    (s, dir) => {
      val t = Tables(s, dir)
      val pos = t.customer.filter(m(col("c_acctbal")) > m(lit(0)))
        .agg(sum(m(col("c_acctbal"))).as("bal_sum"), count(lit(1)).as("bal_cnt"))
      t.customer
        .crossJoin(broadcast(pos))
        .filter(m(col("c_acctbal")) * col("bal_cnt") > col("bal_sum"))
        .join(t.orders, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(substring(col("c_name"), 10, 1).as("name_digit"))
        .agg(count(lit(1)).as("numcust"),
          dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy("name_digit")
    },
    Some(s"""SELECT substring(c_name, 10, 1) AS name_digit,
      COUNT(*) AS numcust,
      CAST(SUM(CAST(c_acctbal AS $D)) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE CAST(c_acctbal AS $D) * (SELECT COUNT(*) FROM customer WHERE CAST(c_acctbal AS $D) > 0)
          > (SELECT SUM(CAST(c_acctbal AS $D)) FROM customer WHERE CAST(c_acctbal AS $D) > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY substring(c_name, 10, 1) ORDER BY name_digit""")
  )

  /** TPC-H Q7 shape: shipping volume between nation pairs by year — the
    * two-role dimension pattern (nation joined TWICE under different
    * aliases, supplier side and customer side) with a symmetric pair
    * filter. Both nation joins broadcast (25 rows); the fact side
    * shuffles only for the orders⋈lineitem join.
    */
  val q7VolumeShipping: Q = Q(
    "q7_volume_shipping",
    (s, dir) => {
      val t = Tables(s, dir)
      val n1 = t.nation.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = t.nation.select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter(
          (col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
            (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(discPrice).cast(DoubleType).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    Some(s"""SELECT supp_nation, cust_nation, l_year,
      CAST(SUM(CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $D))) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        EXTRACT(year FROM l_shipdate) AS l_year, l_extendedprice, l_discount
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')) v
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year""")
  )

  /** TPC-H Q13 shape: distribution of customers by order count — LEFT
    * OUTER join (customers with no orders must count at 0) followed by a
    * two-level aggregation. Both aggs partial; the outer join shuffles on
    * the customer key once.
    */
  val q13OrderDistribution: Q = Q(
    "q13_order_distribution",
    (s, dir) => {
      val t = Tables(s, dir)
      t.customer
        .join(t.orders.filter(col("o_orderpriority") =!= "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    },
    Some("""SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) c_orders
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC""")
  )

  /** TPC-H Q21 shape (adapted to the trimmed schema: `l_returnflag = 'R'`
    * plays the "failed delivery" role the full schema gives to
    * receipt-past-commit dates): suppliers who were the ONLY supplier
    * with returned items on a multi-supplier order — the distinctive
    * EXISTS (another supplier on the order) + NOT EXISTS (another
    * supplier ALSO returned) double self-correlation, planned as one
    * semi- and one anti-join against the same fact table.
    */
  val q21WaitingSuppliers: Q = Q(
    "q21_waiting_suppliers",
    (s, dir) => {
      val t = Tables(s, dir)
      val l1 = t.lineitem.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_suppkey"))
      val others = t.lineitem.select(
        col("l_orderkey").as("o2_orderkey"), col("l_suppkey").as("o2_suppkey"))
      val othersReturned = t.lineitem.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("r2_orderkey"), col("l_suppkey").as("r2_suppkey"))
      l1
        .join(t.orders.filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .join(others,
          col("l_orderkey") === col("o2_orderkey") &&
            col("l_suppkey") =!= col("o2_suppkey"), "left_semi")
        .join(othersReturned,
          col("l_orderkey") === col("r2_orderkey") &&
            col("l_suppkey") =!= col("r2_suppkey"), "left_anti")
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("s_name"), col("n_name").as("nation"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(desc("numwait"), asc("s_name"))
        .limit(20)
    },
    Some("""SELECT s_name, n_name AS nation, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN orders ON l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
    JOIN supplier ON l1.l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R')
    GROUP BY s_name, n_name ORDER BY numwait DESC, s_name LIMIT 20""")
  )

  val all: Seq[Q] = Seq(q6ForecastRevenue, q10ReturnedItems, q12PriorityClasses,
    q14PromoRevenue, q17SmallQtyRevenue, q18LargeOrders, q19DisjunctiveBands,
    q22IdleCustomers, q7VolumeShipping, q13OrderDistribution, q21WaitingSuppliers)
}
