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

  /** TPC-H Q2 shape (adapted: lineitem prices play the part-supplier cost
    * role the full schema gives partsupp): for banded parts, the
    * minimum-cost supplier offer within a region. The correlated
    * scalar-min subquery is decorrelated into ONE window over the offer's
    * natural key (l_partkey) — one shuffle, no per-row re-scan, no
    * self-join of the fact.
    */
  val q2MinCostSupplier: Q = Q(
    "q2_mincost_supplier",
    (s, dir) => {
      val t = Tables(s, dir)
      val euro = t.supplier
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region.filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
      val offers = t.lineitem
        .join(euro, col("l_suppkey") === col("s_suppkey"))
        .groupBy("l_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(min(m(col("l_extendedprice"))).as("cost"))
      offers
        .withColumn("min_cost", min(col("cost")).over(Window.partitionBy("l_partkey")))
        .filter(col("cost") === col("min_cost"))
        .join(t.part.filter(col("p_size").between(10, 20) && col("p_type") === "STANDARD"),
          col("l_partkey") === col("p_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
          col("p_type"), col("cost").cast(DoubleType).as("cost"))
        .orderBy(desc("s_acctbal"), asc("s_name"), asc("p_partkey"))
        .limit(100)
    },
    Some(s"""SELECT s_acctbal, s_name, n_name, p_partkey, p_type, CAST(cost AS DOUBLE) AS cost
    FROM (
      SELECT *, MIN(cost) OVER (PARTITION BY l_partkey) AS min_cost
      FROM (
        SELECT l_partkey, s_suppkey, s_name, s_acctbal, n_name,
          MIN(CAST(l_extendedprice AS $D)) AS cost
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
        GROUP BY l_partkey, s_suppkey, s_name, s_acctbal, n_name) o) x
    JOIN part ON l_partkey = p_partkey AND p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
    WHERE cost = min_cost
    ORDER BY s_acctbal DESC, s_name, p_partkey LIMIT 100""")
  )

  /** TPC-H Q4 shape (adapted: `l_returnflag = 'R'` plays the
    * late-delivery role): order-priority counts for orders with at least
    * one returned item — EXISTS planned as a LEFT SEMI join, aggregated
    * after the semi so each order counts once regardless of line count.
    */
  val q4OrderPriority: Q = Q(
    "q4_order_priority",
    (s, dir) => {
      val t = Tables(s, dir)
      t.orders
        .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
        .join(t.lineitem.filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01' AND o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority ORDER BY o_orderpriority""")
  )

  /** TPC-H Q8 shape: national market share — the fraction of a region's
    * PROMO-part import volume supplied by one nation, per year. The
    * two-level ratio is two exact decimal sums under one grouping with a
    * single IEEE division at the surface (the q14 discipline), and nation
    * appears in BOTH roles (customer region membership, supplier
    * nationality) — broadcast on both, fact shuffles only for its joins.
    */
  val q8MarketShare: Q = Q(
    "q8_market_share",
    (s, dir) => {
      val t = Tables(s, dir)
      val custNations = t.nation
        .join(broadcast(t.region.filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("c_nk"))
      val suppNations = t.nation
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      t.lineitem
        .join(t.part.filter(col("p_type") === "PROMO"),
          col("l_partkey") === col("p_partkey"))
        .join(t.orders
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(custNations), col("c_nationkey") === col("c_nk"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(suppNations), col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_3", discPrice)
          .otherwise(m(lit(0)))).cast(DoubleType) /
          sum(discPrice).cast(DoubleType)).as("mkt_share"))
        .orderBy("o_year")
    },
    Some(s"""SELECT o_year,
      CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE CAST(0 AS $D) END) AS DOUBLE)
        / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT EXTRACT(year FROM o_orderdate) AS o_year,
        CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $D)) AS volume,
        n1.n_name AS supp_nation
      FROM lineitem
      JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region ON n2.n_regionkey = r_regionkey AND r_name = 'AMERICA'
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01') v
    GROUP BY o_year ORDER BY o_year""")
  )

  /** TPC-H Q9 shape (adapted: 10% of p_retailprice per unit plays the
    * ps_supplycost role): product-line profit by supplier nation and
    * year — a multi-fact star join with an EXPRESSION group-by (year of
    * the order date) and a derived profit measure, decimal-exact
    * throughout (no division anywhere).
    */
  val q9ProductProfit: Q = Q(
    "q9_product_profit",
    (s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .join(t.part.filter(col("p_name").startsWith("red")),
          col("l_partkey") === col("p_partkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(discPrice - m(col("p_retailprice")) * m(col("l_quantity")) * m(lit(0.1)))
          .cast(DoubleType).as("sum_profit"))
        .orderBy(asc("nation"), desc("o_year"))
    },
    Some(s"""SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
      CAST(SUM(CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $D))
        - CAST(p_retailprice AS $D) * CAST(l_quantity AS $D) * CAST(0.1 AS $D)) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey AND p_name LIKE 'red%'
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY n_name, EXTRACT(year FROM o_orderdate)
    ORDER BY nation, o_year DESC""")
  )

  /** TPC-H Q15 shape: the top-revenue supplier view — per-supplier quarter
    * revenue compared against its own maximum. The scalar max is ONE
    * single-row aggregate broadcast into an exact decimal equality (never
    * a global window, which would single-partition the whole view).
    */
  val q15TopSupplier: Q = Q(
    "q15_top_supplier",
    (s, dir) => {
      val t = Tables(s, dir)
      val rev = t.lineitem
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(sum(discPrice).as("total_rev"))
      val mx = rev.agg(max(col("total_rev")).as("max_rev"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_rev") === col("max_rev"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast(DoubleType).as("total_revenue"))
        .orderBy("s_suppkey")
    },
    Some(s"""WITH rev AS (
      SELECT l_suppkey, SUM(CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $D))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s_suppkey""")
  )

  /** TPC-H Q20 shape (adapted: shipped quantity plays the availqty role):
    * suppliers in a region who moved real volume of red parts this year —
    * the NESTED SEMI-JOIN CHAIN: part-name filter semi-joins into the
    * fact aggregate, whose qualifying suppliers semi-join into supplier,
    * intersected with the region dimension. Every step is a semi join or
    * a bounded broadcast; no fact row ever widens.
    */
  val q20VolumeSuppliers: Q = Q(
    "q20_volume_suppliers",
    (s, dir) => {
      val t = Tables(s, dir)
      val redParts = t.part.filter(col("p_name").startsWith("red"))
        .select("p_partkey")
      val qualifying = t.lineitem
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(redParts, col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(sum(m(col("l_quantity"))).as("qty"))
        .filter(col("qty") > m(lit(40)))
        .select("l_suppkey")
      val asiaNations = t.nation
        .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      t.supplier
        .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name").as("nation"))
        .orderBy("s_name")
    },
    Some(s"""SELECT s_suppkey, s_name, n_name AS nation
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
    WHERE EXISTS (SELECT 1 FROM (
        SELECT l_suppkey, SUM(CAST(l_quantity AS $D)) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
          AND EXISTS (SELECT 1 FROM part
            WHERE p_partkey = l_partkey AND p_name LIKE 'red%')
        GROUP BY l_suppkey, l_partkey) q
      WHERE q.l_suppkey = s_suppkey AND q.qty > CAST(40 AS $D))
    ORDER BY s_name""")
  )

  /** TPC-H Q11 shape (adapted: lineitem net revenue plays the
    * `ps_supplycost * ps_availqty` stock-value role, and a bounded
    * nation-key band plays GERMANY — a single nation holds no suppliers at
    * the smallest SF): per-part stock value for one nation group, HAVING
    * value above a multiple of the mean per-part share. The correlated
    * scalar total is ONE single-row aggregate broadcast into the filter
    * (the q15 discipline) — never a global window, which would
    * single-partition the whole view. The threshold compare happens in
    * IEEE doubles derived from exact decimal sums, identical on both
    * engines; the mean compare is division-free (value·cnt > k·total).
    */
  val q11ImportantStock: Q = Q(
    "q11_important_stock",
    (s, dir) => {
      val t = Tables(s, dir)
      val natSupp = t.supplier
        .join(broadcast(t.nation.filter(col("n_nationkey") < 8)),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val vals = t.lineitem
        .join(natSupp, col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(sum(discPrice).as("value"))
      val tot = vals.agg(sum(col("value")).as("total"), count(lit(1)).as("cnt"))
      vals.crossJoin(broadcast(tot))
        .filter(col("value").cast(DoubleType) * col("cnt") >
          lit(1.5) * col("total").cast(DoubleType))
        .select(col("l_partkey"), col("value").cast(DoubleType).as("value"))
        .orderBy(desc("value"), asc("l_partkey"))
    },
    Some(s"""WITH vals AS (
      SELECT l_partkey, SUM(CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $D))) AS value
      FROM lineitem
      WHERE EXISTS (SELECT 1 FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey = l_suppkey AND n_nationkey < 8)
      GROUP BY l_partkey),
    tot AS (SELECT SUM(value) AS total, COUNT(*) AS cnt FROM vals)
    SELECT l_partkey, CAST(value AS DOUBLE) AS value FROM vals, tot
    WHERE CAST(value AS DOUBLE) * cnt > 1.5 * CAST(total AS DOUBLE)
    ORDER BY value DESC, l_partkey""")
  )

  /** TPC-H Q16 shape (adapted: lineitem part-supplier pairs play partsupp;
    * negative account balance plays the customer-complaints comment
    * filter): supplier-relationship counts — distinct suppliers shipping
    * each surviving (brand, type, size) combination, excluding one brand,
    * one type, a size set, and bad-standing suppliers. The NOT IN plans as
    * a LEFT ANTI join (keys are never null, so the semantics coincide);
    * the bad-supplier set is a filtered dim the planner may broadcast,
    * never hinted since supplier scales with SF. COUNT(DISTINCT) rides
    * Spark's two-phase distinct aggregate — partial per partition, final
    * on the group key, no global distinct shuffle of raw pairs.
    */
  val q16SupplierRelationship: Q = Q(
    "q16_supplier_relationship",
    (s, dir) => {
      val t = Tables(s, dir)
      val badSupp = t.supplier.filter(col("s_acctbal") < 0).select("s_suppkey")
      t.part
        .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
        .join(t.lineitem, col("p_partkey") === col("l_partkey"))
        .join(badSupp, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"), asc("p_size"))
    },
    Some("""SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO' AND p_size IN (1,4,9,16,25,36,49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")
  )

  val all: Seq[Q] = Seq(q6ForecastRevenue, q10ReturnedItems, q12PriorityClasses,
    q14PromoRevenue, q17SmallQtyRevenue, q18LargeOrders, q19DisjunctiveBands,
    q22IdleCustomers, q7VolumeShipping, q13OrderDistribution, q21WaitingSuppliers,
    q2MinCostSupplier, q4OrderPriority, q8MarketShare, q9ProductProfit,
    q15TopSupplier, q20VolumeSuppliers, q11ImportantStock, q16SupplierRelationship)
}
