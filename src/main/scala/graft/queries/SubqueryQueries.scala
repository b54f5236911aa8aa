package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import QueryUtil._

/** Correlated-subquery shapes (TPC-H Q2/Q11/Q15 skeletons) — pins Catalyst's
  * subquery decorrelation: each correlated predicate becomes a join against
  * a re-aggregated subplan, not a per-row re-execution. */
object SubqueryQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q2 skeleton: rows matching their group's minimum (correlated
    // scalar subquery ≡ join against per-key min)
    "q68_correlated_min" -> ((s, d) => {
      t(s, d, "part").createOrReplaceTempView("sq_part")
      s.sql(
        """SELECT p_type, p_partkey, p_retailprice FROM sq_part p1
           WHERE p_retailprice = (SELECT min(p_retailprice) FROM sq_part p2
                                  WHERE p2.p_type = p1.p_type)
           ORDER BY p_type, p_partkey""")
    }),

    // TPC-H Q11 skeleton: groups whose share exceeds a global-threshold
    // scalar subquery in HAVING
    "q69_having_subquery" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("sq_lineitem")
      s.sql(
        """SELECT l_partkey, round(sum(l_extendedprice), 2) AS value
           FROM sq_lineitem
           GROUP BY l_partkey
           HAVING sum(l_extendedprice) >
             (SELECT sum(l_extendedprice) * 0.0007 FROM sq_lineitem)
           ORDER BY l_partkey""")
    }),

    // TPC-H Q15 skeleton: CTE revenue view, pick the max-revenue supplier(s)
    "q70_cte_max" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("sq_lineitem2")
      t(s, d, "supplier").createOrReplaceTempView("sq_supplier")
      s.sql(
        """WITH revenue AS (
             SELECT l_suppkey AS supplier_no,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS total_e4
             FROM sq_lineitem2
             WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
               AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
             GROUP BY l_suppkey)
           SELECT s_suppkey, s_name,
             CAST(total_e4 AS DOUBLE) / 10000.0 AS total_revenue
           FROM sq_supplier JOIN revenue ON s_suppkey = supplier_no
           WHERE total_e4 = (SELECT max(total_e4) FROM revenue)
           ORDER BY s_suppkey""")
    })
  )

  val oracleSql: Map[String, String] = Map(

    "q68_correlated_min" ->
      """SELECT p_type, p_partkey, p_retailprice FROM part p1
         WHERE p_retailprice = (SELECT min(p_retailprice) FROM part p2
                                WHERE p2.p_type = p1.p_type)
         ORDER BY p_type, p_partkey""",

    "q69_having_subquery" ->
      """SELECT l_partkey, round(sum(l_extendedprice), 2) AS value
         FROM lineitem
         GROUP BY l_partkey
         HAVING sum(l_extendedprice) >
           (SELECT sum(l_extendedprice) * 0.0007 FROM lineitem)
         ORDER BY l_partkey""",

    "q70_cte_max" ->
      """WITH revenue AS (
           SELECT l_suppkey AS supplier_no,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS total_e4
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
             AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name,
           CAST(total_e4 AS DOUBLE) / 10000.0 AS total_revenue
         FROM supplier JOIN revenue ON s_suppkey = supplier_no
         WHERE total_e4 = (SELECT max(total_e4) FROM revenue)
         ORDER BY s_suppkey"""
  )
}
