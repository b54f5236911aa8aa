package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import QueryUtil._

/** Reference-parity surface: the groupby verb in all its modes
  * (SURVEY.md §2.2/2.4 — filter triplets, agg ops, concat combine,
  * aggregate=false passthrough, global aggregation). */
object ParityQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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
    })
  )

  val oracleSql: Map[String, String] = Map(

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
         ORDER BY l_orderkey, l_linenumber"""
  )
}
