package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis => TA}
import QueryUtil._

/** Composite pipelines: the end-to-end shapes users actually run —
  * clean-corpus preparation, conversion funnels, cohort retention. */
object PipelineQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // training-corpus preparation: quality filter → fingerprint dedup →
    // per-language stats (graft.ops composed end-to-end)
    "q71_corpus_pipeline" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .filter(TA.qualityClass(col("text")) === "ok")
      val deduped = Dedup.dedupExact(docs, TA.fingerprint(col("text")), col("doc_id"))
      deduped
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(TA.tokenCount(col("text"))).cast("long").as("sum_tokens"),
          round(avg(TA.typeTokenRatio(col("text"))), 6).as("avg_ttr"))
        .orderBy("lang")
    }),

    // conversion funnel: signup → first click after → first purchase after
    "q72_funnel" -> ((s, d) => {
      val e = events(s, d)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val signup = e.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("us").as("s_us"))
      val click = e.filter(col("event_type") === "click").as("c")
        .join(signup, Seq("user_id"))
        .filter(col("us") > col("s_us"))
        .groupBy("user_id").agg(min("us").as("c_us"))
      val purchase = e.filter(col("event_type") === "purchase").as("p")
        .join(click, Seq("user_id"))
        .filter(col("us") > col("c_us"))
        .groupBy("user_id").agg(min("us").as("p_us"))
      signup.agg(count(lit(1)).as("n_signup")).crossJoin(
        click.agg(count(lit(1)).as("n_click_after")))
        .crossJoin(purchase.agg(count(lit(1)).as("n_purchase_after")))
    }),

    // cohort retention: users by first-seen day, distinct actives per
    // day-offset 0..7
    "q73_retention" -> ((s, d) => {
      val e = events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val cohort = e.groupBy("user_id").agg(min("day").as("cohort_day"))
      e.join(cohort, Seq("user_id"))
        .withColumn("offset", datediff(col("day"), col("cohort_day")))
        .filter(col("offset") <= 7)
        .groupBy("cohort_day", "offset")
        .agg(countDistinct("user_id").as("n_active"))
        .orderBy("cohort_day", "offset")
    })
  )

  val oracleSql: Map[String, String] = Map(

    "q71_corpus_pipeline" ->
      s"""WITH ok AS (SELECT * FROM documents
           WHERE ${TA.qualityClassSql("text")} = 'ok'),
         ranked AS (SELECT *, row_number() OVER (
             PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) rn
           FROM ok),
         deduped AS (SELECT * FROM ranked WHERE rn = 1)
         SELECT lang, count(*) AS n_docs,
           CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS sum_tokens,
           round(avg(len(list_distinct(str_split(text, ' ')))::DOUBLE
             / len(str_split(text, ' '))), 6) AS avg_ttr
         FROM deduped GROUP BY 1 ORDER BY 1""",

    "q72_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) us FROM events),
         s AS (SELECT user_id, min(us) s_us FROM e
               WHERE event_type = 'signup' GROUP BY 1),
         c AS (SELECT e.user_id, min(us) c_us FROM e JOIN s USING (user_id)
               WHERE event_type = 'click' AND us > s_us GROUP BY 1),
         p AS (SELECT e.user_id, min(us) p_us FROM e JOIN c USING (user_id)
               WHERE event_type = 'purchase' AND us > c_us GROUP BY 1)
         SELECT (SELECT count(*) FROM s) AS n_signup,
                (SELECT count(*) FROM c) AS n_click_after,
                (SELECT count(*) FROM p) AS n_purchase_after""",

    "q73_retention" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
         cohort AS (SELECT user_id, min(d) cohort_day FROM e GROUP BY 1)
         SELECT cohort_day, CAST(date_diff('day', cohort_day, d) AS INT) AS "offset",
           count(DISTINCT user_id) AS n_active
         FROM e JOIN cohort USING (user_id)
         WHERE date_diff('day', cohort_day, d) <= 7
         GROUP BY 1, 2 ORDER BY 1, 2"""
  )
}
