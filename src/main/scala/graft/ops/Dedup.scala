package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Deduplication operators for training-data pipelines, smallest-to-largest
  * hammer: exact → fingerprint → SimHash → shingle-Jaccard → MinHash-LSH.
  *
  * Scale design (100 TB):
  *  - exact/fingerprint dedup is one hash-shuffle on a 16-byte key — the
  *    cheapest possible distributed dedup; prefer it whenever content is
  *    byte-identical after normalization.
  *  - pairwise Jaccard is never run all-pairs: candidates come either from a
  *    shared-shingle join (sparse when shingles are informative) or from
  *    MinHash-LSH banding, which bounds the join fan-out by bucket.
  *  - MinHash signatures are computed as k conditional-min aggregates in ONE
  *    groupBy pass (no seed explosion, map-side partial aggregation), so the
  *    shuffle carries one row of k longs per document.
  *  - all hashes are [[PortableHash]] md5-derived → reproducible anywhere.
  */
object Dedup {

  /** Exact duplicate statistics over a normalized key. */
  def exactDupStats(df: DataFrame, key: Column): DataFrame =
    df.groupBy(key.as("dup_key")).agg(count(lit(1)).as("copies"))
      .filter(col("copies") > 1)

  /** Keep one row per exact key (first by `tieBreak` — deterministic, unlike
    * dropDuplicates which keeps an arbitrary row). */
  def dedupExact(df: DataFrame, key: Column, tieBreak: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(key).orderBy(tieBreak)))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Word n-gram shingles of `text`, distinct. */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array(text)))
  }

  /** DuckDB twin of [[shingles]] (oracle construction; assumes len>=n as the
    * corpus guarantees). */
  def shinglesSql(col: String, n: Int): String =
    s"""list_distinct(list_transform(generate_series(1, len(str_split($col,' ')) - ${n - 1}),
       | i -> array_to_string((str_split($col,' '))[i:i+${n - 1}], ' ')))""".stripMargin

  /** (id, shingle) exploded pairs. */
  def shingleSets(df: DataFrame, id: Column, text: Column, n: Int): DataFrame =
    df.select(id.as("doc"), explode(shingles(text, n)).as("shingle"))

  /** All pairs with shingle-Jaccard ≥ `minJaccard`, via shared-shingle join
    * (no all-pairs blowup: only docs sharing at least one shingle meet).
    * The join key is `xxhash64(shingle)` — an 8-byte shuffle key instead of
    * the shingle string; a 2^-64 collision could merge two shingles, which
    * is noise at any corpus size. */
  def jaccardPairs(df: DataFrame, id: Column, text: Column, n: Int,
      minJaccard: Double): DataFrame = {
    val sets = shingleSets(df, id, text, n)
      .select(col("doc"), xxhash64(col("shingle")).as("shingle")).cache()
    val sizes = sets.groupBy("doc").agg(count(lit(1)).as("n"))
    val inter = sets.as("a")
      .join(sets.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("i"), col("b.doc").as("j"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("i") === col("sa.doc"))
      .join(sizes.as("sb"), col("j") === col("sb.doc"))
      .select(col("i"), col("j"),
        (col("inter").cast("double") /
          (col("sa.n") + col("sb.n") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** MinHash signature: k min-hashes over `n`-shingles in ONE aggregation
    * pass — one md5 per shingle, k affine-derived hash functions
    * ([[PortableHash.derivedHash]]). Output: `doc`, `s0..s{k-1}`. */
  def minhashSignatures(df: DataFrame, id: Column, text: Column, n: Int,
      k: Int): DataFrame = {
    val sets = shingleSets(df, id, text, n)
      .withColumn("h", PortableHash.baseHash(col("shingle")))
    val hashes = (0 until k).map(j =>
      min(PortableHash.derivedHash(col("h"), j)).as(s"s$j"))
    sets.groupBy("doc").agg(hashes.head, hashes.tail: _*)
  }

  /** MinHash signature via the single-buffer [[graft.functions.MinHashSketch]]
    * typed imperative aggregate (one k-long buffer per group with partial
    * merge, instead of k separate min aggregates). Bit-equal output to
    * [[minhashSignatures]]. */
  def minhashSignaturesSketch(df: DataFrame, id: Column, text: Column, n: Int,
      k: Int): DataFrame = {
    graft.GraftExtensions.ensureRegistered(df.sparkSession)
    shingleSets(df, id, text, n)
      .groupBy("doc")
      .agg(call_function("minhash_sketch", col("shingle"), lit(k)).as("sig"))
      .select(col("doc") +: (0 until k).map(j =>
        element_at(col("sig"), j + 1).as(s"s$j")): _*)
  }

  /** LSH banding: (doc, band, key) where key concatenates the band's
    * signature rows; docs sharing any (band, key) are candidates. */
  def lshBands(sig: DataFrame, k: Int, bands: Int): DataFrame = {
    require(bands > 0 && k % bands == 0,
      s"bands must divide k evenly (got k=$k, bands=$bands): otherwise band " +
        "keys drop signature components or degenerate to empty strings")
    val rows = k / bands
    val bandStructs = (0 until bands).map { b =>
      val key = concat_ws(",",
        (b * rows until (b + 1) * rows).map(j => col(s"s$j").cast("string")): _*)
      struct(lit(b).as("band"), key.as("bkey"))
    }
    sig.select(col("doc"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
  }

  /** Candidate pairs from LSH banding (distinct, i < j). */
  def lshCandidates(sig: DataFrame, k: Int, bands: Int): DataFrame = {
    val b = lshBands(sig, k, bands)
    b.as("a").join(b.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("i"), col("b.doc").as("j"))
      .distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: band candidates, then true
    * shingle-Jaccard computed ONLY for candidate pairs — the quadratic term
    * is bounded by band-bucket sizes, never by the corpus. */
  def minhashLshPairs(df: DataFrame, id: Column, text: Column, n: Int, k: Int,
      bands: Int, minJaccard: Double): DataFrame = {
    // one shingle explosion shared by signatures, sizes, and verify
    val sets = shingleSets(df, id, text, n).cache()
    val sizes = sets.groupBy("doc").agg(count(lit(1)).as("n"))
    val hashed = sets.withColumn("h", PortableHash.baseHash(col("shingle")))
    val sigAggs = (0 until k).map(j =>
      min(PortableHash.derivedHash(col("h"), j)).as(s"s$j"))
    val sig = hashed.groupBy("doc").agg(sigAggs.head, sigAggs.tail: _*)
    val cands = lshCandidates(sig, k, bands)
    val inter = cands
      .join(sets.as("sa"), col("i") === col("sa.doc"))
      .join(sets.as("sb"),
        col("j") === col("sb.doc") && col("sa.shingle") === col("sb.shingle"))
      .groupBy("i", "j").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("na"), col("i") === col("na.doc"))
      .join(sizes.as("nb"), col("j") === col("nb.doc"))
      .select(col("i"), col("j"),
        (col("inter").cast("double") /
          (col("na.n") + col("nb.n") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Embedding-cosine near-dup removal: mine within-LSH-bucket pairs with
    * cosine ≥ `minCosine` ([[Similarity.bucketedPairs]]), then keep the
    * lowest id of each near-dup pair. One greedy pass (drop any row that is
    * the higher id of some pair) — the standard first-cut for training-data
    * dedup; transitive-closure clustering is a follow-up iteration of the
    * same join if needed. */
  def embeddingNearDupes(df: DataFrame, id: Column, vec: Column, bits: Int,
      minCosine: Double): DataFrame =
    Similarity.bucketedPairs(df, id, vec, bits)
      .filter(col("cos") >= minCosine)

  def dedupByEmbedding(df: DataFrame, id: Column, vec: Column, bits: Int,
      minCosine: Double): DataFrame = {
    val losers = embeddingNearDupes(df, id, vec, bits, minCosine)
      .select(col("j").as("__loser")).distinct()
    df.join(losers, id === col("__loser"), "left_anti")
  }

  /** Transitive near-dup clusters from a pair list: connected components by
    * iterative min-label propagation (a join + min-agg per round, converges
    * in O(diameter) rounds — dup clusters are shallow in practice, and
    * `maxIter` bounds the worst case). Output: (node, cluster) where cluster
    * is the component's minimum id — the canonical representative each
    * duplicate collapses to.
    *
    * Scale note: each round is one shuffle on node id over the edge list —
    * the standard large-graph CC shape; for 100 TB pair lists checkpoint
    * every few rounds to truncate lineage. */
  def dupClusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // eager localCheckpoint per step: truncates lineage (lazy chaining would
    // reference the previous round twice and grow the plan exponentially)
    // and makes the convergence count a near-free scan of materialized blocks
    val edges = pairs.select(col("i").as("a"), col("j").as("b"))
      .union(pairs.select(col("j").as("a"), col("i").as("b")))
      .distinct().localCheckpoint(true)
    var labels = edges.select(col("a").as("node")).distinct()
      .withColumn("cluster", col("node")).localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val propagated = edges
        .join(labels, col("b") === col("node"))
        .groupBy(col("a")).agg(min("cluster").as("nbr_min"))
      val next = labels.join(propagated, col("node") === col("a"), "left")
        .select(col("node"),
          least(col("cluster"), coalesce(col("nbr_min"), col("cluster"))).as("cluster"))
        .localCheckpoint(true)
      val changed = next.as("n").join(labels.as("o"), Seq("node"))
        .filter(col("n.cluster") =!= col("o.cluster")).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels
  }

  /** SimHash (`bits`-wide) over distinct tokens: per-bit ±1 votes summed in
    * one aggregation pass, then bits assembled. */
  def simhash(df: DataFrame, id: Column, text: Column, bits: Int): DataFrame = {
    val toks = df.select(id.as("doc"),
      explode(array_distinct(split(text, " "))).as("tok"))
      .withColumn("h", PortableHash.md5Long(col("tok"), 0))
    val votes = (0 until bits).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"v$b"))
    toks.groupBy("doc").agg(votes.head, votes.tail: _*)
      .select(col("doc"),
        (0 until bits).map(b =>
          when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }
}
