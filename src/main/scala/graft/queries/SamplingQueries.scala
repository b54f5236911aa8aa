package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Sampling, TextAnalysis => TA}
import QueryUtil._

/** Deterministic sampling/splitting over the `documents` table — the
  * dataset-assembly half of a training-data pipeline (the dedup/quality half
  * lives in [[TextQueries]]). Both queries aggregate the selected rows, so
  * the oracle pins every membership decision, not just counts. */
object SamplingQueries {

  private val SplitNames = Seq("train", "val", "test")
  private val SplitWeights = Seq(0.8, 0.1, 0.1)

  /** Per-language keep rates: upsample-free rebalance (zh deliberately
    * absent → dropped, pinning the "stratum not in map" semantics). */
  private val LangFracs =
    Map("en" -> 0.5, "de" -> 0.25, "es" -> 0.1, "fr" -> 1.0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q77_hash_split" -> ((s, d) => {
      t(s, d, "documents")
        .select(
          Sampling.splitColumn(col("doc_id"), SplitNames, SplitWeights)
            .as("split"),
          TA.tokenCount(col("text")).as("ntok"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum("ntok").cast("long").as("sum_tokens"))
        .orderBy("split")
    }),

    "q78_stratified_sample" -> ((s, d) => {
      Sampling.stratifiedSample(t(s, d, "documents"), col("doc_id"),
          col("lang"), LangFracs)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(TA.tokenCount(col("text"))).cast("long").as("sum_tokens"))
        .orderBy("lang")
    })
  )

  val oracleSql: Map[String, String] = Map(

    "q77_hash_split" ->
      s"""SELECT ${Sampling.splitSql("doc_id", SplitNames, SplitWeights)} AS split,
         count(*) AS n_docs,
         CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS sum_tokens
         FROM documents GROUP BY 1 ORDER BY 1""",

    "q78_stratified_sample" ->
      s"""SELECT lang, count(*) AS n_docs,
         CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS sum_tokens
         FROM documents
         WHERE ${Sampling.stratifiedSampleSql("doc_id", "lang", LangFracs)}
         GROUP BY 1 ORDER BY 1"""
  )
}
