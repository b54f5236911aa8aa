package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryUtil._

/** Classic TPC-H query shapes adapted to the testdata schema, plus window
  * and null-handling suites — exercises the full analytic grammar. */
object TpchQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q19 shape (adapted to the trimmed part schema): disjunctive
    // OR-of-ANDs predicate spanning both join sides — the classic test that
    // the optimizer still pushes the per-side residuals below the join and
    // keeps the whole thing in one codegen span
    "q88_tpch_q19" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val p = broadcast(t(s, d, "part"))
      li.join(p, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#17" && col("p_size").between(10, 30) &&
            col("l_quantity").between(10, 40)) ||
          (col("p_brand") === "Brand#25" && col("p_size").between(20, 50) &&
            col("l_quantity").between(20, 50)))
        .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H Q10: returned-item reporting — who returned the most revenue
    // in one quarter (4-table star, top 20)
    "q89_tpch_q10" -> ((s, d) => {
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") >= tsLit("1996-01-01") &&
          col("o_orderdate") < tsLit("1996-04-01"))
      val ret = t(s, d, "lineitem").filter(col("l_returnflag") === "R")
      ret.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q1: the full pricing summary (8 aggregates incl. computed
    // disc_price/charge in exact cents math)
    "q58_tpch_q1" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= tsLit("2001-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          revenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))) *
               (lit(100L) + cents(col("l_tax")))).cast("double") / 1e6).as("sum_charge"),
          avg("l_quantity").as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // TPC-H Q4: order-priority checking (semi join on late lineitems)
    "q59_tpch_q4" -> ((s, d) => {
      val late = t(s, d, "lineitem").filter(col("l_shipdate") > tsLit("1997-06-01"))
      t(s, d, "orders")
        .filter(col("o_orderdate") >= tsLit("1997-01-01") &&
          col("o_orderdate") < tsLit("1997-10-01"))
        .join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q12: shipping modes... adapted: priority-class conditional sums
    "q60_tpch_q12" -> ((s, d) => {
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") >= tsLit("1996-01-01") &&
          col("l_shipdate") < tsLit("1997-01-01"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
            .cast("long").as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
            .cast("long").as("low_line_count"))
        .orderBy("l_returnflag")
    }),

    // TPC-H Q14: promo revenue share (conditional revenue / total revenue)
    "q61_tpch_q14" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= tsLit("1997-03-01") &&
          col("l_shipdate") < tsLit("1997-04-01"))
      val joined = li.join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
      val rev = cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
      joined.agg(
        (sum(when(col("p_type") === "PROMO", rev).otherwise(0L)).cast("double") * 100.0 /
          sum(rev).cast("double")).as("promo_revenue_pct"))
        .select(round(col("promo_revenue_pct"), 6).as("promo_revenue_pct"))
    }),

    // window-function suite: lag/lead/dense_rank/ntile over one pass
    "q62_window_suite" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders")
        .filter(col("o_custkey") < 50)
        .select(col("o_custkey"), col("o_orderkey"),
          dense_rank().over(w).as("rnk"),
          ntile(4).over(w).as("quartile"),
          coalesce(lag("o_orderkey", 1).over(w), lit(-1L)).as("prev_order"),
          coalesce(lead("o_orderkey", 1).over(w), lit(-1L)).as("next_order"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // arg-max/min aggregates: the order carrying each segment's max price
    "q63_minmax_by" -> ((s, d) => {
      t(s, d, "orders").join(broadcast(t(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(expr("max_by(o_orderkey, struct(o_totalprice, o_orderkey))").as("top_order"),
          expr("min_by(o_orderkey, struct(o_totalprice, o_orderkey))").as("bottom_order"),
          max("o_totalprice").as("top_price"))
        .orderBy("c_mktsegment")
    }),

    // null creation + handling: nullif/coalesce/null-aware counts + grouping
    "q64_null_handling" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(nullif(col("l_returnflag"), lit("N")).as("flag_or_null"),
          col("l_quantity"))
        .groupBy("flag_or_null")
        .agg(count(lit(1)).as("n_rows"), count(col("flag_or_null")).as("n_nonnull"),
          sum("l_quantity").as("sum_qty"))
        .select(coalesce(col("flag_or_null"), lit("<null>")).as("flag"),
          col("n_rows"), col("n_nonnull"), col("sum_qty"))
        .orderBy("flag")
    })
  )

  val oracleSql: Map[String, String] = Map(

    "q88_tpch_q19" ->
      s"""SELECT ${revenueSql("l_extendedprice", "l_discount")} AS revenue,
         count(*) AS n_items
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 1 AND 20)
            OR (p_brand = 'Brand#17' AND p_size BETWEEN 10 AND 30
                AND l_quantity BETWEEN 10 AND 40)
            OR (p_brand = 'Brand#25' AND p_size BETWEEN 20 AND 50
                AND l_quantity BETWEEN 20 AND 50)""",

    "q89_tpch_q10" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         ${revenueSql("l_extendedprice", "l_discount")} AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE l_returnflag = 'R'
           AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
         GROUP BY 1, 2, 3, 4
         ORDER BY revenue DESC, c_custkey LIMIT 20""",

    "q58_tpch_q1" ->
      s"""SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         ${revenueSql("l_extendedprice", "l_discount")} AS sum_disc_price,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
              * (100 - CAST(round(l_discount * 100) AS BIGINT))
              * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS DOUBLE) / 1e6 AS sum_charge,
         avg(l_quantity) AS avg_qty,
         round(avg(l_extendedprice), 4) AS avg_price,
         round(avg(l_discount), 6) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q59_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00')
         GROUP BY 1 ORDER BY 1""",

    "q60_tpch_q12" ->
      """SELECT l_returnflag,
         CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         GROUP BY 1 ORDER BY 1""",

    "q61_tpch_q14" ->
      """SELECT round(
           CAST(sum(CASE WHEN p_type = 'PROMO'
             THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))
             ELSE 0 END) AS DOUBLE) * 100.0
           / CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE),
           6) AS promo_revenue_pct
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'""",

    "q62_window_suite" ->
      """SELECT o_custkey, o_orderkey,
         dense_rank() OVER w AS rnk,
         ntile(4) OVER w AS quartile,
         coalesce(lag(o_orderkey) OVER w, -1) AS prev_order,
         coalesce(lead(o_orderkey) OVER w, -1) AS next_order
         FROM orders WHERE o_custkey < 50
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",

    "q63_minmax_by" ->
      """WITH j AS (SELECT c_mktsegment, o_orderkey, o_totalprice
           FROM orders JOIN customer ON o_custkey = c_custkey),
         r AS (SELECT c_mktsegment, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY c_mktsegment
             ORDER BY o_totalprice DESC, o_orderkey DESC) rt,
           row_number() OVER (PARTITION BY c_mktsegment
             ORDER BY o_totalprice ASC, o_orderkey ASC) rb
           FROM j)
         SELECT c_mktsegment,
           max(CASE WHEN rt = 1 THEN o_orderkey END) AS top_order,
           max(CASE WHEN rb = 1 THEN o_orderkey END) AS bottom_order,
           max(o_totalprice) AS top_price
         FROM r GROUP BY 1 ORDER BY 1""",

    "q64_null_handling" ->
      """SELECT coalesce(nullif(l_returnflag, 'N'), '<null>') AS flag,
         count(*) AS n_rows, count(nullif(l_returnflag, 'N')) AS n_nonnull,
         sum(l_quantity) AS sum_qty
         FROM lineitem GROUP BY nullif(l_returnflag, 'N')
         ORDER BY 1"""
  )
}
