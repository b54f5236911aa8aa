package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (+ LLM-data-pipeline extensions), each with a DuckDB oracle.
  *
  * Cross-engine float discipline (Spark result must hash-equal the DuckDB
  * oracle at sf0.01):
  *  - counts / integer-valued sums: exact, never rounded;
  *  - sums of 2-decimal money columns: `round(_, 2)` — the true value lies on
  *    the 2-decimal grid, so rounding is exact in both engines;
  *  - computed products (revenue): exact integer-cents math, then one
  *    deterministic IEEE division — bit-identical in both engines
  *    ([[graft.queries.QueryUtil.revenue]]);
  *  - avgs/stddevs/ratios: round to 4 decimals (6 when magnitude ≤ 1) so
  *    cross-engine summation noise is ≪ the rounding grid;
  *  - time arithmetic in exact epoch millis, never interval types;
  *  - every query ends with a fully deterministic ORDER BY;
  *  - sketch ESTIMATES (HLL q34, IVF q57/q125, int8/PQ/IVF-PQ ANN
  *    q141/q142/q147, GK percentile q118, approx
  *    median/MAD q129, histogram boundaries q133) never appear in output —
  *    the checkable contract is their ERROR BOUND, emitted as a boolean the
  *    Spark side computes honestly and the oracle pins TRUE, next to the
  *    exact value the oracle recomputes. No rows-only queries remain;
  *  - oracle SQL output types must round-trip DuckDB as int64/int32/double
  *    exactly as Spark emits them — DuckDB `sum(BIGINT)` silently widens to
  *    HUGEINT and fails the driver's type-tagged hash (cast it back), and
  *    window ranks default to BIGINT where Spark gives int32.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_groupby_sum")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ RelationalQueries.queries ++ EventsQueries.queries ++
      TextQueries.queries ++ VectorQueries.queries ++ MiscQueries.queries ++
      TpchQueries.queries ++ SubqueryQueries.queries ++ PipelineQueries.queries ++
      SamplingQueries.queries

  def oracleSql: Map[String, String] =
    ParityQueries.oracleSql ++ RelationalQueries.oracleSql ++ EventsQueries.oracleSql ++
      TextQueries.oracleSql ++ VectorQueries.oracleSql ++ MiscQueries.oracleSql ++
      TpchQueries.oracleSql ++ SubqueryQueries.oracleSql ++ PipelineQueries.oracleSql ++
      SamplingQueries.oracleSql
}
