package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, ExactRound, Sampling, TextAnalysis => TA}
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
          // ExactRound discipline: per-doc TTR quantizes to the 1e-6
          // grid in BIGINT, the mean is an order-free integer sum +
          // half-up integer division — an avg() over double ratios is
          // both summation-order-dependent AND tie-roundable
          sum(TA.typeTokenRatioMicro(col("text"))).as("__tm"))
        .select(col("lang"), col("n_docs"), col("sum_tokens"),
          (ExactRound.halfUpDiv("__tm", "n_docs").cast("double") / 1e6)
            .as("avg_ttr"))
        .orderBy("lang")
    }),

    // the MODERN pipeline end-to-end, composed from the round-7 ops:
    // scrub (normalize+redact) → Bloom decontamination against a held-out
    // set's fingerprints → near-dup clusters keep the BEST copy → hash
    // split keeps train — every stage's membership decision replayed by
    // the oracle from the ops' documented SQL twins.
    "q126_pipeline_v2" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val clean = docs.select(col("doc_id"), col("source"), col("lang"),
        TA.scrub(col("text")).as("text"))
      val heldOut = clean.filter(pmod(col("doc_id"), lit(7)) === 0)
        .select(md5(col("text")).as("fp"))
      val incoming = clean.filter(pmod(col("doc_id"), lit(7)) =!= 0)
        .withColumn("fp", md5(col("text")))
      // uncached on purpose, same verdict as jaccard's docsets
      // (Dedup.scala): the decontaminated set feeds five downstream
      // references, but persisting it MEASURED SLOWER at sf0.1 (6.0 s
      // recompute vs 8.2 s cached — materialization + storage churn beats
      // the repeated regex scrub, and ReuseExchange already shares the
      // aggregation subtrees)
      val decon = Dedup.antiJoinWithBloom(incoming, col("fp"), heldOut,
        col("fp"), expectedItems = 10000).drop("fp")
      val pairs = Dedup.jaccardPairs(decon, col("doc_id"), col("text"),
        n = 3, minJaccard = 0.9)
      val best = Dedup.dedupBestPerCluster(decon, col("doc_id"), pairs,
        TA.tokenCount(col("text")))
      best.filter(Sampling.trainValTest(col("doc_id")) === "train")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(TA.tokenCount(col("text"))).cast("long").as("sum_tokens"))
        .orderBy("lang")
    }),

    // pipeline v3, composed from the round-8 ops: scrub → n-gram-overlap
    // decontamination against a held-out benchmark (PARTIAL containment,
    // where v2's Bloom pass needs exact fingerprint equality) →
    // per-language token-budget mixture assembly → train split. Every
    // membership decision replayed by one composed oracle.
    "q140_pipeline_v3" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val clean = docs.select(col("doc_id"), col("lang"),
        TA.scrub(col("text")).as("text"))
      val bench = clean.filter(pmod(col("doc_id"), lit(9)) === 0)
      val incoming = clean.filter(pmod(col("doc_id"), lit(9)) =!= 0)
      val verdicts = Dedup.ngramOverlap(incoming, col("doc_id"), col("text"),
        bench, col("text"), n = 3, threshold = 0.5)
      val keep = incoming.join(
        verdicts.filter(!col("contaminated")).select(col("id").as("doc_id")),
        Seq("doc_id"), "left_semi")
      val budgeted = Sampling.budgetPerGroup(
        keep.withColumn("ntok", TA.tokenCount(col("text"))),
        col("doc_id"), col("ntok"), col("lang"), budget = 3000)
      budgeted.filter(Sampling.trainValTest(col("doc_id")) === "train")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("ntok").cast("long").as("sum_tokens"),
          sum("doc_id").as("sum_ids"))
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

    // every stage replayed: scrubSql → distinct benchmark 3-grams →
    // per-doc overlap ratio < 0.5 → hash-order cumulative token budget →
    // splitSql = 'train'
    "q140_pipeline_v3" -> {
      val scrub = TA.scrubSql("text")
      val sh3 = Dedup.shinglesSql("text", 3)
      val cum = Sampling.budgetCumSql("doc_id",
        "len(str_split(text, ' '))", "lang")
      val split = Sampling.splitSql("doc_id",
        Seq("train", "val", "test"), Seq(0.8, 0.1, 0.1))
      s"""WITH clean AS (SELECT doc_id, lang, $scrub AS text FROM documents),
         |bg AS (SELECT DISTINCT unnest($sh3) g FROM clean WHERE doc_id % 9 = 0),
         |inc AS (SELECT doc_id, lang, text, $sh3 s FROM clean WHERE doc_id % 9 <> 0),
         |ig AS (SELECT doc_id, unnest(s) g FROM inc),
         |hit AS (SELECT doc_id, count(*) h FROM ig
         |  WHERE g IN (SELECT g FROM bg) GROUP BY 1),
         |keep AS (SELECT inc.doc_id, lang, text FROM inc
         |  LEFT JOIN hit ON inc.doc_id = hit.doc_id
         |  WHERE coalesce(h, 0) / len(s) < 0.5),
         |cost AS (SELECT doc_id, lang, len(str_split(text, ' ')) AS ntok,
         |  $cum AS cum FROM keep),
         |sel AS (SELECT * FROM cost WHERE cum <= 3000),
         |tr AS (SELECT * FROM sel WHERE $split = 'train')
         |SELECT lang, count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS sum_tokens,
         |  CAST(sum(doc_id) AS BIGINT) AS sum_ids
         |FROM tr GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // every stage replayed: scrubSql → NOT IN held-out fingerprints →
    // shared-shingle jaccard pairs → recursive-CTE clusters → per-cluster
    // quality rank (token count DESC, id) → splitSql = 'train'
    "q126_pipeline_v2" -> {
      val scrub = TA.scrubSql("text")
      val sh3clean = Dedup.shinglesSql("text", 3)
      val split = Sampling.splitSql("doc_id",
        Seq("train", "val", "test"), Seq(0.8, 0.1, 0.1))
      s"""WITH RECURSIVE
         clean AS (SELECT doc_id, source, lang, $scrub AS text FROM documents),
         held AS (SELECT md5(text) fp FROM clean WHERE doc_id % 7 = 0),
         decon AS (SELECT * FROM clean WHERE doc_id % 7 <> 0
           AND md5(text) NOT IN (SELECT fp FROM held)),
         sh AS (SELECT doc_id, $sh3clean s FROM decon),
         e AS (SELECT doc_id AS doc, unnest(s) sg FROM sh),
         sizes AS (SELECT doc_id AS doc, len(s) n FROM sh),
         inter AS (SELECT a.doc i, b.doc j, count(*) ninter FROM e a
           JOIN e b ON a.sg = b.sg AND a.doc < b.doc GROUP BY 1, 2),
         pairs AS (SELECT i, j, ninter * 1.0 / (sa.n + sb.n - ninter) jaccard
           FROM inter JOIN sizes sa ON sa.doc = i JOIN sizes sb ON sb.doc = j),
         hi AS (SELECT i, j FROM pairs WHERE jaccard >= 0.9),
         edges AS (SELECT i a, j b FROM hi UNION SELECT j, i FROM hi),
         reach AS (
           SELECT a, b FROM edges
           UNION
           SELECT r.a, e2.b FROM reach r JOIN edges e2 ON r.b = e2.a),
         cc AS (SELECT a AS node, least(a, min(b)) AS cluster
           FROM reach GROUP BY a),
         m AS (SELECT cc.node, cc.cluster, len(str_split(d.text, ' ')) q
           FROM cc JOIN decon d ON d.doc_id = cc.node),
         rk AS (SELECT node, row_number() OVER (PARTITION BY cluster
             ORDER BY q DESC, node) rn FROM m),
         best AS (SELECT * FROM decon
           WHERE doc_id NOT IN (SELECT node FROM rk WHERE rn > 1))
         SELECT lang, count(*) AS n_docs,
           CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS sum_tokens
         FROM best WHERE $split = 'train'
         GROUP BY 1 ORDER BY 1"""
    },

    "q71_corpus_pipeline" ->
      s"""WITH ok AS (SELECT * FROM documents
           WHERE ${TA.qualityClassSql("text")} = 'ok'),
         ranked AS (SELECT *, row_number() OVER (
             PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) rn
           FROM ok),
         deduped AS (SELECT * FROM ranked WHERE rn = 1)
         SELECT lang, count(*) AS n_docs,
           CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS sum_tokens,
           ${graft.ops.ExactRound.halfUpDivSql(
             "sum(" + graft.ops.ExactRound.gridMicroSql(
               "len(list_distinct(str_split(text, ' ')))",
               "len(str_split(text, ' '))", 6) + ")", "count(*)")}::DOUBLE
             / 1e6 AS avg_ttr
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
