package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (+ the LLM-data-pipeline extensions), each with a DuckDB
  * oracle in [[SparkEntry.oracleSql]].
  *
  * Cross-engine float discipline (Spark result must hash-equal the DuckDB
  * oracle at sf0.01):
  *  - counts / integer-valued sums: exact, never rounded;
  *  - sums of 2-decimal money columns: `round(_, 2)` — the true value lies on
  *    the 2-decimal grid, so rounding is exact in both engines;
  *  - computed products (revenue): exact integer-cents math, then one
  *    deterministic IEEE division — bit-identical in both engines;
  *  - avgs/stddevs/ratios: round to 4 decimals (6 when magnitude ≤ 1) so the
  *    cross-engine summation noise is ≪ the rounding grid;
  *  - every query ends with a fully deterministic ORDER BY.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def ts(v: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(v + " 00:00:00")

  /** Exact cents: 2-decimal double → exact long (price grid verified on
    * testdata; see file Scaladoc). */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_groupby_sum")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- reference parity: the groupby verb (SURVEY §2.4) ----

    "q01_groupby_sum" -> ((s, d) => {
      GroupByEngine
        .groupbyDf(t(s, d, "lineitem"), Seq("l_returnflag", "l_linestatus"),
          Seq(AggSpec("l_quantity", "sum", "sum_qty"),
              AggSpec("l_extendedprice", "sum", "sum_price")))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("sum_qty"), round(col("sum_price"), 2).as("sum_price"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q02_groupby_mean" -> ((s, d) => {
      GroupByEngine
        .groupbyDf(t(s, d, "lineitem"), Seq("l_returnflag"),
          Seq(AggSpec("l_extendedprice", "mean", "avg_price"),
              AggSpec("l_discount", "mean", "avg_disc")))
        .select(col("l_returnflag"),
          round(col("avg_price"), 4).as("avg_price"),
          round(col("avg_disc"), 6).as("avg_disc"))
        .orderBy("l_returnflag")
    }),

    "q03_groupby_count" -> ((s, d) => {
      GroupByEngine
        .groupbyDf(t(s, d, "lineitem"), Seq("l_returnflag", "l_linestatus"),
          Seq(AggSpec("l_orderkey", "count", "n")))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q04_groupby_min_max" -> ((s, d) => {
      GroupByEngine
        .groupbyDf(t(s, d, "lineitem"), Seq("l_linestatus"),
          Seq(AggSpec("l_extendedprice", "min", "min_price"),
              AggSpec("l_extendedprice", "max", "max_price"),
              AggSpec("l_shipdate", "min", "first_ship"),
              AggSpec("l_shipdate", "max", "last_ship")))
        .orderBy("l_linestatus")
    }),

    "q05_groupby_std" -> ((s, d) => {
      GroupByEngine
        .groupbyDf(t(s, d, "lineitem"), Seq("l_returnflag"),
          Seq(AggSpec("l_extendedprice", "std", "std_price")))
        .select(col("l_returnflag"), round(col("std_price"), 4).as("std_price"))
        .orderBy("l_returnflag")
    }),

    "q06_count_distinct" -> ((s, d) => {
      GroupByEngine
        .groupbyDf(t(s, d, "lineitem"), Seq("l_returnflag"),
          Seq(AggSpec("l_partkey", "count_distinct", "n_parts"),
              AggSpec("l_suppkey", "sorted_count_distinct", "n_supps")))
        .orderBy("l_returnflag")
    }),

    "q07_count_na" -> ((s, d) => {
      GroupByEngine
        .groupbyDf(t(s, d, "lineitem"), Seq("l_linestatus"),
          Seq(AggSpec("l_discount", "count_na", "n_null_disc"),
              AggSpec("l_discount", "count", "n_disc")))
        .orderBy("l_linestatus")
    }),

    "q08_filter_terms" -> ((s, d) => {
      GroupByEngine
        .groupbyDf(t(s, d, "lineitem"), Seq("l_returnflag"),
          Seq(AggSpec("l_quantity", "sum", "sum_qty"),
              AggSpec("l_orderkey", "count", "n")),
          where = Seq(
            FilterTerm("l_shipdate", ">", ts("1997-01-01")),
            FilterTerm("l_discount", "<=", 0.05),
            FilterTerm("l_returnflag", "in", Seq("A", "R")),
            FilterTerm("l_linestatus", "!=", "X")))
        .orderBy("l_returnflag")
    }),

    "q09_global_agg" -> ((s, d) => {
      GroupByEngine
        .groupbyDf(t(s, d, "lineitem"), Nil,
          Seq(AggSpec("l_quantity", "sum", "sum_qty"),
              AggSpec("l_orderkey", "count", "n"),
              AggSpec("l_shipdate", "min", "first_ship"),
              AggSpec("l_shipdate", "max", "last_ship")))
    }),

    // Reference-fidelity combine: per-shard aggregates concatenated,
    // duplicate group keys survive (pa.concat_tables,
    // reference parqueryd/controller.py:294). Shard = l_orderkey % 8 here
    // (testdata is one physical file per table).
    "q10_shard_concat" -> ((s, d) => {
      GroupByEngine
        .groupbyDfSharded(t(s, d, "lineitem"), pmod(col("l_orderkey"), lit(8)),
          Seq("l_returnflag"), Seq(AggSpec("l_quantity", "sum", "sum_qty"),
            AggSpec("l_orderkey", "count", "n")))
        .orderBy("l_returnflag", "sum_qty", "n")
    }),

    // aggregate=false passthrough: scan→filter→project, no grouping
    // (reference worker.py:385 flag).
    "q11_project_filter" -> ((s, d) => {
      GroupByEngine
        .groupbyDf(t(s, d, "lineitem"), Seq("l_orderkey", "l_linenumber"),
          Seq(AggSpec("l_quantity", "sum", "l_quantity"),
              AggSpec("l_extendedprice", "sum", "l_extendedprice")),
          where = Seq(FilterTerm("l_shipdate", ">=", ts("2001-06-01"))),
          aggregate = false)
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- relational extensions (SURVEY §2.3/2.5/2.6/2.7) ----

    "q12_join_inner" -> ((s, d) => {
      t(s, d, "orders").join(t(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(round(sum("o_totalprice"), 2).as("revenue"),
             count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment")
    }),

    "q13_join_broadcast" -> ((s, d) => {
      // star join: fact ⋈ broadcast dims; revenue in exact integer cents,
      // one deterministic IEEE division at the end (bit-identical to oracle)
      val li = t(s, d, "lineitem")
      val sup = broadcast(t(s, d, "supplier"))
      val nat = broadcast(t(s, d, "nation"))
      val reg = broadcast(t(s, d, "region"))
      li.join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .join(reg, col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg((sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
                .cast("double") / 10000.0).as("revenue"),
             count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    })
  )

  // ------------------------------------------------------------ oracle SQL

  def oracleSql: Map[String, String] = Map(

    "q01_groupby_sum" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_price
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",

    "q02_groupby_mean" ->
      """SELECT l_returnflag, round(avg(l_extendedprice), 4) AS avg_price,
         round(avg(l_discount), 6) AS avg_disc
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q03_groupby_count" ->
      """SELECT l_returnflag, l_linestatus, count(l_orderkey) AS n
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",

    "q04_groupby_min_max" ->
      """SELECT l_linestatus, min(l_extendedprice) AS min_price,
         max(l_extendedprice) AS max_price, min(l_shipdate) AS first_ship,
         max(l_shipdate) AS last_ship
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q05_groupby_std" ->
      """SELECT l_returnflag, round(stddev_samp(l_extendedprice), 4) AS std_price
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q06_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_suppkey) AS n_supps
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q07_count_na" ->
      """SELECT l_linestatus,
         count(CASE WHEN l_discount IS NULL THEN 1 END) AS n_null_disc,
         count(l_discount) AS n_disc
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q08_filter_terms" ->
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty, count(l_orderkey) AS n
         FROM lineitem
         WHERE l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
           AND l_discount <= 0.05 AND l_returnflag IN ('A', 'R')
           AND l_linestatus <> 'X'
         GROUP BY 1 ORDER BY 1""",

    "q09_global_agg" ->
      """SELECT sum(l_quantity) AS sum_qty, count(l_orderkey) AS n,
         min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship
         FROM lineitem""",

    "q10_shard_concat" ->
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty, count(l_orderkey) AS n
         FROM lineitem GROUP BY l_orderkey % 8, l_returnflag
         ORDER BY 1, 2, 3""",

    "q11_project_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-06-01 00:00:00'
         ORDER BY l_orderkey, l_linenumber""",

    "q12_join_inner" ->
      """SELECT c_mktsegment, round(sum(o_totalprice), 2) AS revenue,
         count(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY 1""",

    "q13_join_broadcast" ->
      """SELECT r_name, n_name,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)
           / 10000.0 AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1, 2 ORDER BY 1, 2"""
  )
}
