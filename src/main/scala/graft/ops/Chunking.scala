package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document chunking and sequence packing — the final assembly stage of a
  * pretraining data pipeline: long documents become overlapping fixed-size
  * token windows, and chunks are packed into context-length bins.
  *
  * Scale shape: chunking is a per-row array computation + posexplode (map
  * stage, no shuffle; the chunk count per doc is L/stride, so the lambda
  * re-split cost that made naive shingling O(L²) is bounded by a small
  * constant here). Packing is ONE window cumsum per pack group — partition
  * the packing by a natural key (source, shard, date) so no global sort
  * exists; within a 100 TB corpus each group packs independently in
  * parallel, which is exactly how per-shard training archives are built. */
object Chunking {

  /** Overlapping token windows: one row per (doc, chunk_idx) with the chunk
    * text and its token count. Window k (0-based) starts at token
    * 1 + k·stride; the final windows may be shorter than `width` (they are
    * kept — training pipelines pad or pack them, they don't drop tail
    * tokens). Null text chunks to nothing (posexplode of null).
    *
    * Runs through the native [[graft.functions.WordChunks]] expression: one
    * split per row. The composable form below re-splits per window — for a
    * long document (the case chunking exists for) that is O(L²/stride). */
  def chunk(df: DataFrame, id: Column, text: Column, width: Int,
      stride: Int): DataFrame = {
    graft.GraftExtensions.ensureRegistered(df.sparkSession)
    df.select(id.as("doc"),
        posexplode(call_function("word_chunks", text, lit(width), lit(stride)))
          .as(Seq("chunk_idx", "c")))
      .select(col("doc"), col("chunk_idx"),
        col("c.chunk").as("chunk"), col("c.n_tok").as("n_tok"))
  }

  /** The composable-functions formulation of [[chunk]] — value-identical on
    * non-null text (property-tested in OpsSpec), kept as the executable
    * spec of the native expression. NOT used in pipelines: the lambda
    * body's free-variable `split` re-evaluates per window, and a null text
    * emits a phantom `width`-token chunk (least/greatest skip nulls). */
  def chunkComposable(df: DataFrame, id: Column, text: Column, width: Int,
      stride: Int): DataFrame = {
    require(width >= 1 && stride >= 1 && stride <= width,
      s"need 1 <= stride <= width, got width=$width stride=$stride")
    val toks = split(text, " ")
    val ntok = greatest(size(toks), lit(1))
    val chunks = transform(
      sequence(lit(1), ntok, lit(stride)),
      s => struct(
        concat_ws(" ", slice(toks, s, lit(width))).as("chunk"),
        least(lit(width), size(toks) - s + 1).as("n_tok")))
    df.select(id.as("doc"), posexplode(chunks).as(Seq("chunk_idx", "c")))
      .select(col("doc"), col("chunk_idx"),
        col("c.chunk").as("chunk"), col("c.n_tok").as("n_tok"))
  }

  /** DuckDB twin of [[chunk]] (oracle construction): one row per chunk with
    * matching `doc, chunk_idx, chunk, n_tok` columns. */
  def chunkSql(idCol: String, textCol: String, width: Int, stride: Int,
      table: String = "documents"): String =
    s"""SELECT $idCol AS doc, (s - 1) // $stride AS chunk_idx,
       | array_to_string((str_split($textCol, ' '))[s:s + ${width - 1}], ' ') AS chunk,
       | least($width, len(str_split($textCol, ' ')) - s + 1) AS n_tok
       |FROM $table, LATERAL (
       |  SELECT unnest(generate_series(1, greatest(len(str_split($textCol, ' ')), 1), $stride)) s)""".stripMargin

  /** Greedy sequential packing: within each `group`, lay the chunks out in
    * (doc, chunk_idx) order as one continuous token stream and cut it at
    * `ctx`-token boundaries — `bin` is the context window the chunk STARTS
    * in (how GPT-style pretraining concatenates-and-cuts). Deterministic,
    * and one window cumsum per group: pack groups (source/shard/date) run
    * in parallel, no global sort. */
  def pack(chunks: DataFrame, group: Column, ctx: Int): DataFrame = {
    require(ctx >= 1, s"context length must be >= 1, got $ctx")
    val w = Window.partitionBy(group).orderBy(col("doc"), col("chunk_idx"))
    chunks
      .withColumn("__cum", sum(col("n_tok")).over(w))
      .withColumn("bin",
        floor((col("__cum") - col("n_tok")) / ctx))
      .drop("__cum")
  }
}
