package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Exact._

/** TPC-H-derived analytic workload, adapted to the driver's synthetic
  * star schema (no partsupp table; reduced column set — see TESTDATA.md).
  * These mirror the reference engine's own acceptance workload
  * (apache-impala-4.1.0/testdata/workloads/tpch/queries/tpch-q*.test),
  * re-expressed with the DataFrame API. Broadcast hints are limited to
  * FIXED-cardinality relations (region=5, nation=25, single-row scalar
  * aggregates); customer/part/supplier grow with scale factor, so their
  * joins are left to AQE + autoBroadcastJoinThreshold — at 100 TB these
  * tables are not broadcastable and a forced hint would OOM the build
  * side (Impala analog: DistributedPlanner picks broadcast vs
  * partitioned per cost, not unconditionally). Fact joins shuffle on
  * the join key; aggregates rely on partial (map-side) aggregation.
  * Money sums go through Exact.dsum for engine-portable determinism.
  */
object TpchQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // r16 input spread (Tables.lineitemSpread): ~98% of the fact
    // survives the date filter and pays 8 decimal aggregates per row —
    // interleaved A/B 1.47× (bench_control_r16b.json). The other TPC-H
    // queries are selective-filter joins where the spread exchange
    // measured SLOWER (q03 0.60×, q19 0.54×) — they keep the bare scan.
    "q01_pricing_summary" -> ((spark, dir) => {
      val t = Tables(spark, dir)
      t.lineitemSpread
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q03_shipping_priority" -> ((spark, dir) => {
      val t = Tables(spark, dir)
      val cust = t.customer.filter(col("c_mktsegment") === "BUILDING")
      t.lineitem.filter(col("l_shipdate") > lit("1998-06-30").cast("timestamp"))
        .join(t.orders.filter(col("o_orderdate") < lit("1998-06-30").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .select(col("l_orderkey"), col("revenue"), to_date(col("o_orderdate")).as("o_orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    "q04_order_priority" -> ((spark, dir) => {
      val t = Tables(spark, dir)
      t.orders
        .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
        .join(t.lineitem, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    "q05_local_supplier" -> ((spark, dir) => {
      val t = Tables(spark, dir)
      val asiaNations = t.nation
        .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
      t.lineitem
        .join(t.orders.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    "q06_forecast_revenue" -> ((spark, dir) => {
      val t = Tables(spark, dir)
      t.lineitem
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24.0)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))
    }),

    "q07_volume_shipping" -> ((spark, dir) => {
      val t = Tables(spark, dir)
      val n1 = t.nation.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = t.nation.select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    "q10_returned_items" -> ((spark, dir) => {
      val t = Tables(spark, dir)
      t.lineitem.filter(col("l_returnflag") === "R")
        .join(t.orders.filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-07-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    "q12_priority_by_linestatus" -> ((spark, dir) => {
      val t = Tables(spark, dir)
      t.lineitem
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("low_line_count"))
        .orderBy("l_linestatus")
    }),

    "q13_customer_distribution" -> ((spark, dir) => {
      val t = Tables(spark, dir)
      t.customer
        .join(t.orders.filter(col("o_orderstatus") =!= "P"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    "q14_promo_revenue" -> ((spark, dir) => {
      val t = Tables(spark, dir)
      t.lineitem
        .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .join(t.part, col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) *
          dsum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1.0) - col("l_discount"))).otherwise(0.0)) /
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("promo_revenue"))
    }),

    // Single lineitem pass (round 3): the per-order quantity total is a
    // window aggregate over the SAME l_orderkey shuffle the orders join
    // then reuses — the agg-then-rejoin formulation scanned lineitem
    // twice and aggregated a second time after the join. Window
    // partitions are per-order (≤7 rows), so no skew risk, and the
    // qualifying total IS the final sum_qty (no post-join agg at all).
    "q18_large_volume" -> ((spark, dir) => {
      val t = Tables(spark, dir)
      val w = org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey")
      val bigOrders = t.lineitem
        .withColumn("q", sum(col("l_quantity").cast("decimal(38,6)")).over(w))
        .filter(col("q") > 250)
        .select(col("l_orderkey").as("big_okey"), col("q").cast("double").as("sum_qty"))
        .dropDuplicates("big_okey")
      t.orders.join(bigOrders, col("o_orderkey") === col("big_okey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    "q19_discount_revenue" -> ((spark, dir) => {
      val t = Tables(spark, dir)
      t.lineitem
        .join(t.part, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_type") === "SMALL" && col("p_size").between(1, 10) && col("l_quantity").between(1, 20)) ||
          (col("p_type") === "MEDIUM" && col("p_size").between(1, 15) && col("l_quantity").between(5, 30)) ||
          (col("p_type") === "LARGE" && col("p_size").between(1, 25) && col("l_quantity").between(10, 40)))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
    }),

    "q22_dormant_customers" -> ((spark, dir) => {
      val t = Tables(spark, dir)
      val avgBal = t.customer.filter(col("c_acctbal") > 0.0)
        .agg(davg(col("c_acctbal")).as("abal"))
      t.customer
        .crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("abal"))
        .join(t.orders, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy("c_nationkey")
    }),
  )

  private val rev = "l_extendedprice * (1.0 - l_discount)"

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlSum("l_quantity")} AS sum_qty,
         |  ${sqlSum("l_extendedprice")} AS sum_base_price,
         |  ${sqlSum(rev)} AS sum_disc_price,
         |  ${sqlSum(s"$rev * (1.0 + l_tax)")} AS sum_charge,
         |  ${sqlAvg("l_quantity")} AS avg_qty,
         |  ${sqlAvg("l_extendedprice")} AS avg_price,
         |  ${sqlAvg("l_discount")} AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q03_shipping_priority" ->
      s"""SELECT l_orderkey, ${sqlSum(rev)} AS revenue, CAST(o_orderdate AS DATE) AS o_orderdate
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-06-30' AND l_shipdate > TIMESTAMP '1998-06-30'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q04_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01' AND o_orderdate < TIMESTAMP '1997-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q05_local_supplier" ->
      s"""SELECT n_name, ${sqlSum(rev)} AS revenue
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,

    "q06_forecast_revenue" ->
      s"""SELECT ${sqlSum("l_extendedprice * l_discount")} AS revenue FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24.0""".stripMargin,

    "q07_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  EXTRACT(YEAR FROM l_shipdate) AS l_year, ${sqlSum(rev)} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name, ${sqlSum(rev)} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
         |GROUP BY 1, 2, 3, 4 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q12_priority_by_linestatus" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q13_customer_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderstatus <> 'P'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q14_promo_revenue" ->
      s"""SELECT 100.0 * ${sqlSum(s"CASE WHEN p_type = 'PROMO' THEN $rev ELSE 0.0 END")}
         |  / ${sqlSum(rev)} AS promo_revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin,

    "q18_large_volume" ->
      s"""SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
         |  o_totalprice, ${sqlSum("l_quantity")} AS sum_qty
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE o_orderkey IN (
         |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
         |  HAVING sum(CAST(l_quantity AS DECIMAL(38,6))) > 250)
         |GROUP BY 1, 2, 3, 4, 5
         |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q19_discount_revenue" ->
      s"""SELECT ${sqlSum(rev)} AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_type = 'SMALL' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20)
         |   OR (p_type = 'MEDIUM' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 5 AND 30)
         |   OR (p_type = 'LARGE' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 40)""".stripMargin,

    "q22_dormant_customers" ->
      s"""SELECT c_nationkey, count(*) AS numcust, ${sqlSum("c_acctbal")} AS totacctbal
         |FROM customer
         |WHERE c_acctbal > (SELECT ${sqlAvg("c_acctbal")} FROM customer WHERE c_acctbal > 0.0)
         |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
