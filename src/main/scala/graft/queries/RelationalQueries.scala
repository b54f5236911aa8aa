package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryUtil._

/** Relational extensions beyond the reference's surface (SURVEY.md
  * §2.3/2.5/2.6/2.7/2.8): joins of every flavor, window functions, top-k,
  * set operations, rollup/cube, having, scalar expressions.
  *
  * Scale notes: dimension sides (customer/supplier/nation/region/part) are
  * explicitly `broadcast()` so the fact table never shuffles for star joins;
  * top-k goes through `orderBy().limit(k)` which Spark plans as
  * TakeOrderedAndProject (per-partition heaps, no global sort). */
object RelationalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q12_join_inner" -> ((s, d) => {
      t(s, d, "orders").join(broadcast(t(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(round(sum("o_totalprice"), 2).as("revenue"),
             count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment")
    }),

    "q13_join_broadcast" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      li.join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
             count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    }),

    "q14_join_semi" -> ((s, d) => {
      // customers having at least one 400k+ order (EXISTS ≡ left_semi)
      val big = t(s, d, "orders").filter(col("o_totalprice") > 400000.0)
      t(s, d, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")
    }),

    "q15_join_anti" -> ((s, d) => {
      // customers with no 400k+ order (NOT EXISTS ≡ left_anti)
      val big = t(s, d, "orders").filter(col("o_totalprice") > 400000.0)
      t(s, d, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")
    }),

    "q81_join_left" -> ((s, d) => {
      // per-order count of RETURNED items, zeros retained — the outer-join
      // shape count(inner join) silently gets wrong. Fact side stays on the
      // left; the filtered right side shrinks before the shuffle
      val ret = t(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_quantity"))
      t(s, d, "orders")
        .filter(col("o_orderdate") >= tsLit("1996-01-01") &&
          col("o_orderdate") < tsLit("1996-02-01"))
        .join(ret, col("o_orderkey") === col("l_orderkey"), "left_outer")
        .groupBy("o_orderkey")
        .agg(count(col("l_orderkey")).as("n_returned"),
          coalesce(sum("l_quantity"), lit(0.0)).as("qty_returned"))
        .orderBy("o_orderkey")
    }),

    "q82_join_full" -> ((s, d) => {
      // daily order count vs daily ship count, FULL OUTER on the date:
      // nulls possible on both sides (ship dates run past the last order
      // date); coalesce of the two keys is the canonical full-outer idiom
      val a = t(s, d, "orders").groupBy(col("o_orderdate").as("day"))
        .agg(count(lit(1)).as("n_ord"))
      val b = t(s, d, "lineitem").groupBy(col("l_shipdate").as("day"))
        .agg(count(lit(1)).as("n_ship"))
      a.as("a").join(b.as("b"), col("a.day") === col("b.day"), "full_outer")
        .select(coalesce(col("a.day"), col("b.day")).as("day"),
          coalesce(col("n_ord"), lit(0L)).as("n_ord"),
          coalesce(col("n_ship"), lit(0L)).as("n_ship"))
        .orderBy("day")
    }),

    "q16_tpch_q3" -> ((s, d) => {
      // shipping-priority: revenue of unshipped BUILDING orders, top 10
      val cust = broadcast(t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING"))
      val ord = t(s, d, "orders").filter(col("o_orderdate") < tsLit("1997-01-01"))
      val li = t(s, d, "lineitem").filter(col("l_shipdate") > tsLit("1997-01-01"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    "q17_tpch_q5" -> ((s, d) => {
      // local-supplier volume: customer and supplier in the same nation
      val li = t(s, d, "lineitem")
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") >= tsLit("1996-01-01") &&
                col("o_orderdate") < tsLit("1998-01-01"))
      val cust = broadcast(t(s, d, "customer"))
      val sup = broadcast(t(s, d, "supplier"))
      val nat = broadcast(t(s, d, "nation"))
      val reg = broadcast(t(s, d, "region").filter(col("r_name").isin("AMERICA", "ASIA")))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
                   col("c_nationkey") === col("s_nationkey"))
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .join(reg, col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
             count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }),

    "q18_window_rank" -> ((s, d) => {
      // top-2 orders per customer (deterministic tie-break on orderkey)
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    }),

    "q19_window_running" -> ((s, d) => {
      // running revenue per customer over time
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum(cents(col("o_totalprice"))).over(w).cast("double") / 100.0, 2)
            .as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "q20_topk" -> ((s, d) => {
      // TakeOrderedAndProject: per-partition heaps, no global sort
      t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    }),

    "q21_union_all" -> ((s, d) => {
      val o = t(s, d, "orders")
      val big = o.filter(col("o_totalprice") > 450000.0)
      val y95 = o.filter(col("o_orderdate") >= tsLit("1995-01-01") &&
                         col("o_orderdate") < tsLit("1995-04-01"))
      big.unionByName(y95)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("o_orderstatus")
    }),

    "q22_intersect" -> ((s, d) => {
      val o = t(s, d, "orders")
      val a = o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
      val b = o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
      a.intersect(b).orderBy("o_custkey")
    }),

    "q23_except" -> ((s, d) => {
      val o = t(s, d, "orders")
      val a = o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
      val b = o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
      a.except(b).orderBy("o_custkey")
    }),

    "q24_rollup" -> ((s, d) => {
      t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("sum_qty"), col("n"))
        .orderBy("flag", "status")
    }),

    "q25_cube" -> ((s, d) => {
      t(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy("status", "priority")
    }),

    "q26_having" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy("l_partkey")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
        .filter(col("n") >= 40)
        .orderBy("l_partkey")
    }),

    "q27_distinct" -> ((s, d) => {
      t(s, d, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q28_scalar_string" -> ((s, d) => {
      t(s, d, "part")
        .select(upper(substring(col("p_type"), 1, 3)).as("type3"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("label"),
          length(col("p_name")).as("name_len"),
          col("p_retailprice"))
        .groupBy("type3")
        .agg(count(lit(1)).as("n"),
          sum("name_len").as("sum_name_len"),
          countDistinct("label").as("n_labels"),
          round(avg("p_retailprice"), 4).as("avg_price"))
        .orderBy("type3")
    }),

    "q29_scalar_date" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("y", "m")
    }),

    "q30_case_bucket" -> ((s, d) => {
      t(s, d, "orders")
        .select(when(col("o_totalprice") < 100000.0, "low")
            .when(col("o_totalprice") < 300000.0, "mid")
            .otherwise("high").as("bucket"),
          col("o_totalprice"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("bucket")
    })
  )

  val oracleSql: Map[String, String] = Map(

    "q12_join_inner" ->
      """SELECT c_mktsegment, round(sum(o_totalprice), 2) AS revenue,
         count(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY 1""",

    "q13_join_broadcast" ->
      s"""SELECT r_name, n_name,
         ${revenueSql("l_extendedprice", "l_discount")} AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q14_join_semi" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
         GROUP BY 1 ORDER BY 1""",

    "q15_join_anti" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
         GROUP BY 1 ORDER BY 1""",

    "q81_join_left" ->
      """SELECT o_orderkey, count(l_orderkey) AS n_returned,
         coalesce(sum(l_quantity), 0.0) AS qty_returned
         FROM orders
         LEFT JOIN (SELECT l_orderkey, l_quantity FROM lineitem
                    WHERE l_returnflag = 'R') r ON o_orderkey = r.l_orderkey
         WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1996-02-01 00:00:00'
         GROUP BY 1 ORDER BY 1""",

    "q82_join_full" ->
      """WITH a AS (SELECT o_orderdate AS day, count(*) n_ord
           FROM orders GROUP BY 1),
         b AS (SELECT l_shipdate AS day, count(*) n_ship
           FROM lineitem GROUP BY 1)
         SELECT coalesce(a.day, b.day) AS day,
           coalesce(n_ord, 0) AS n_ord, coalesce(n_ship, 0) AS n_ship
         FROM a FULL OUTER JOIN b ON a.day = b.day
         ORDER BY 1""",

    "q16_tpch_q3" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         ${revenueSql("l_extendedprice", "l_discount")} AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
           AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
         GROUP BY 1, 2, 3 ORDER BY revenue DESC, l_orderkey LIMIT 10""",

    "q17_tpch_q5" ->
      s"""SELECT n_name,
         ${revenueSql("l_extendedprice", "l_discount")} AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name IN ('AMERICA', 'ASIA')
           AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY 1 ORDER BY 1""",

    "q18_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 2
         ORDER BY o_custkey, rn""",

    "q19_window_running" ->
      """SELECT o_custkey, o_orderkey,
         round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           / 100.0, 2) AS running_total
         FROM orders WHERE o_custkey < 100
         ORDER BY o_custkey, o_orderkey""",

    "q20_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",

    "q21_union_all" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
         FROM (
           SELECT * FROM orders WHERE o_totalprice > 450000.0
           UNION ALL
           SELECT * FROM orders
           WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
             AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00')
         GROUP BY 1 ORDER BY 1""",

    "q22_intersect" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
         INTERSECT
         SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
         ORDER BY o_custkey""",

    "q23_except" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
         EXCEPT
         SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
         ORDER BY o_custkey""",

    "q24_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
         coalesce(l_linestatus, 'ALL') AS status,
         sum(l_quantity) AS sum_qty, count(*) AS n
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY 1, 2""",

    "q25_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
         coalesce(o_orderpriority, 'ALL') AS priority,
         count(*) AS n, round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY 1, 2""",

    "q26_having" ->
      """SELECT l_partkey, count(*) AS n, sum(l_quantity) AS sum_qty
         FROM lineitem GROUP BY 1 HAVING count(*) >= 40
         ORDER BY 1""",

    "q27_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus
         FROM lineitem ORDER BY 1, 2""",

    "q28_scalar_string" ->
      """SELECT upper(substr(p_type, 1, 3)) AS type3, count(*) AS n,
         CAST(sum(length(p_name)) AS BIGINT) AS sum_name_len,
         count(DISTINCT p_brand || ':' || p_type) AS n_labels,
         round(avg(p_retailprice), 4) AS avg_price
         FROM part GROUP BY 1 ORDER BY 1""",

    "q29_scalar_date" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS y,
         CAST(month(o_orderdate) AS INT) AS m,
         count(*) AS n, round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY 1, 2 ORDER BY 1, 2""",

    "q30_case_bucket" ->
      """SELECT CASE WHEN o_totalprice < 100000.0 THEN 'low'
                     WHEN o_totalprice < 300000.0 THEN 'mid'
                     ELSE 'high' END AS bucket,
         count(*) AS n, round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY 1 ORDER BY 1"""
  )
}
