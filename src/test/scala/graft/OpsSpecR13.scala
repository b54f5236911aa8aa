package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{PhraseAutomaton, PhraseMatch}
import graft.ops.{Curation, TextAnalysis => TA}

/** Round-13 operator specs: the Aho–Corasick content blocklist — each
  * matching rule (boundary, case, order, distinctness, validation) flipped
  * independently — and its Curation.hygiene wiring. */
class OpsSpecR13 extends AnyFunSuite {
  import SparkTestSession._

  private def hits(text: String, phrases: Seq[String],
      boundary: Boolean = true): Seq[String] = {
    val a = new PhraseAutomaton(phrases.toArray, boundary)
    val arr = PhraseMatch.matches(
      org.apache.spark.unsafe.types.UTF8String.fromString(text), a)
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  test("phrase matching: word-boundary rule accepts edges/punctuation and " +
    "rejects embedded occurrences, even two adjacent rejected spans") {
    val ps = Seq("zzqx", "dark pattern", "forbidden fruit")
    assert(hits("zzqx starts it", ps) === Seq("zzqx"))           // left edge
    assert(hits("it ends with zzqx", ps) === Seq("zzqx"))        // right edge
    assert(hits("mid, zzqx, here", ps) === Seq("zzqx"))          // punct
    assert(hits("a dark pattern!", ps) === Seq("dark pattern"))  // multi-word
    assert(hits("xzzqx and zzqxy", ps) === Nil)                  // embedded
    // the q259 adjacency trap: two embedded spans whose junction chars
    // would satisfy each other's INNER boundary — still no match
    assert(hits("xforbidden fruit forbidden fruitx", ps) === Nil)
    assert(hits("zzqx9", ps) === Nil)                            // digit is a word char
  }

  test("phrase matching: boundary=false is raw substring containment") {
    val ps = Seq("zzqx", "forbidden fruit")
    assert(hits("xzzqxy", ps, boundary = false) === Seq("zzqx"))
    assert(hits("xforbidden fruitx", ps, boundary = false) ===
      Seq("forbidden fruit"))
  }

  test("phrase matching: case-exact over its input; results are DISTINCT " +
    "phrases in BLOCKLIST order, not text or lexicographic order") {
    val ps = Seq("zzqx", "dark pattern") // non-alphabetical list
    assert(hits("ZZQX", ps) === Nil)     // automaton itself never folds case
    assert(hits("a dark pattern then zzqx then dark pattern again", ps) ===
      Seq("zzqx", "dark pattern"))       // list order + dedup
    // overlapping patterns both fire: "ab" inside "zabz", "abc" embedded
    assert(hits("z ab abc", Seq("abc", "ab")) === Seq("abc", "ab"))
  }

  test("phrase automaton: validation rejects empties, duplicates, and " +
    "boundary phrases not starting/ending on a word char") {
    intercept[IllegalArgumentException](new PhraseAutomaton(Array[String]()))
    intercept[IllegalArgumentException](new PhraseAutomaton(Array("a", "a")))
    intercept[IllegalArgumentException](new PhraseAutomaton(Array("")))
    intercept[IllegalArgumentException](new PhraseAutomaton(Array(" pad ")))
    new PhraseAutomaton(Array(" pad "), wordBoundary = false) // ok unbound
    intercept[IllegalArgumentException](
      TA.blockedByPhrases(col("t"), Seq("Upper Case")).toString)
  }

  test("blockedByPhrases column: one pass over lower(text), matching the " +
    "per-phrase regexp semantics the DuckDB twin replays") {
    import spark.implicits._
    val df = Seq(
      (1L, "clean text here"),
      (2L, "has a Dark PATTERN."),
      (3L, "xdark patternx embedded"),
      (4L, "zzqx")).toDF("id", "t")
    val got = df.select(col("id"),
        TA.blockedByPhrases(col("t"), Seq("dark pattern", "zzqx")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === Map(1L -> false, 2L -> true, 3L -> false, 4L -> true))
  }

  // ---- unigram-LM tokenizer ----------------------------------------------

  private def uniModel(pieces: (String, Long)*): graft.functions.UnigramModel =
    new graft.functions.UnigramModel(pieces.map(_._1).toArray,
      pieces.map(_._2).toArray, unkScoreMicro = -20_000_000L)

  private def viterbi(w: String, m: graft.functions.UnigramModel) =
    graft.functions.UnigramApply.segmentWord(w, m).toSeq

  test("unigram Viterbi: max-score segmentation; exact ties break to the " +
    "lexicographically greatest US-joined seg (= longer piece first)") {
    // "ab" exactly ties "a"+"b" — the tie rule must pick the single piece
    val tie = uniModel("a" -> -500000L, "b" -> -500000L, "ab" -> -1000000L)
    assert(viterbi("ab", tie) === Seq("ab"))
    // make the split strictly better and it must win instead
    val split = uniModel("a" -> -400000L, "b" -> -400000L, "ab" -> -1000000L)
    assert(viterbi("ab", split) === Seq("a", "b"))
    // chained: "abc" via {ab,c} vs {a,bc} — equal sums, tie prefers the
    // seg string "ab<US>c" > "a<US>bc"
    val chain = uniModel("a" -> -500000L, "b" -> -500000L, "c" -> -500000L,
      "ab" -> -1000000L, "bc" -> -1000000L)
    assert(viterbi("abc", chain) === Seq("ab", "c"))
    // unk fallback prices unseen chars; segmentation never fails
    assert(viterbi("axb", tie) === Seq("a", "x", "b"))
  }

  test("unigram trainer: deterministic across runs, keeps every corpus " +
    "char, hits the vocab target, and learns the dominant bigram") {
    import spark.implicits._
    val docs = (Seq.fill(40)("abab dede abab") ++ Seq.fill(10)("fg fg hh"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val singles = Set("a", "b", "d", "e", "f", "g", "h")
    def train() = TA.unigramTrain(docs, col("text"), vocabSize = 10,
      seedSize = 20, emRounds = 2, maxPieceLen = 4)
    val m1 = train()
    val m2 = train()
    assert(m1.pieces.toSeq === m2.pieces.toSeq, "retrain must be bit-equal")
    assert(m1.scoresMicro.toSeq === m2.scoresMicro.toSeq)
    assert(m1.unkScoreMicro === m2.unkScoreMicro)
    assert(singles.subsetOf(m1.pieces.toSet), "single chars never pruned")
    assert(m1.pieces.length <= 10, s"vocab target: ${m1.pieces.toSeq}")
    // the corpus is mostly "abab": the trained model must tokenize it in
    // fewer pieces than characters (a multi-char piece survived + won)
    assert(viterbi("abab", m1).length < 4,
      s"expected a learned multi-char piece: ${m1.pieces.toSeq}")
  }

  test("unigram artifact round-trip: save -> atomic publish -> cold load " +
    "is bit-equal and tokenizes identically") {
    import spark.implicits._
    val docs = Seq.fill(30)((1L, "zq zq zqzq")).toDF("id", "text")
    val m = TA.unigramTrain(docs, col("text"), vocabSize = 6, seedSize = 8,
      emRounds = 2, maxPieceLen = 3)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-uni-artifact").toString
    TA.unigramSave(spark, m, dir)
    val loaded = TA.unigramLoad(spark, dir)
    assert(loaded.pieces.toSeq === m.pieces.toSeq)
    assert(loaded.scoresMicro.toSeq === m.scoresMicro.toSeq)
    assert(loaded.unkScoreMicro === m.unkScoreMicro)
    val t1 = docs.select(TA.unigramTokens(col("text"), m).as("t"))
      .collect().map(_.getSeq[String](0))
    val t2 = docs.select(TA.unigramTokens(col("text"), loaded).as("t"))
      .collect().map(_.getSeq[String](0))
    assert(t1.toSeq === t2.toSeq)
  }

  test("unigram EM: corpus likelihood under the trained model never falls " +
    "across EM rounds (measured on the word table)") {
    import spark.implicits._
    val docs = (Seq.fill(25)("toktok tok") ++ Seq.fill(5)("kot"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    // likelihood proxy: total Viterbi score of the corpus words under the
    // model after k EM rounds, k = 1 vs 3
    def score(rounds: Int): Long = {
      val m = TA.unigramTrain(docs, col("text"), vocabSize = 8,
        seedSize = 12, emRounds = rounds, maxPieceLen = 3)
      docs.select(explode(TA.unigramTokens(col("text"), m)).as("p"))
        .collect().map { r =>
          val p = r.getString(0)
          val i = m.pieces.indexOf(p)
          if (i >= 0) m.scoresMicro(i) else m.unkScoreMicro
        }.sum
    }
    assert(score(3) >= score(1),
      "more EM rounds must not hurt corpus likelihood")
  }

  test("unigram trainer on the real corpus: learned vocab segments every " +
    "document, beats the char baseline on fertility, and keeps singles") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val m = TA.unigramTrain(docs, col("text"), vocabSize = 45,
      seedSize = 60, emRounds = 2, maxPieceLen = 4)
    val singles = m.pieces.filter(_.length == 1).toSet
    assert(m.pieces.length <= 45 && singles.nonEmpty)
    assert(m.pieces.exists(_.length >= 2),
      "a 31-word corpus must earn multi-char pieces")
    val agg = docs.select(
        sum(length(regexp_replace(col("text"), lit(" "), lit(""))))
          .cast("long").as("chars"),
        sum(TA.unigramTokenCount(col("text"), m)).cast("long").as("uni"))
      .head()
    // subword tokens are never more numerous than chars, and the learned
    // multi-char pieces must actually be USED (strictly fewer tokens)
    assert(agg.getLong(1) > 0 && agg.getLong(1) < agg.getLong(0))
  }

  test("Curation.hygiene blockPhrases: a blocklisted page drops, the same " +
    "page passes with the gate off, and the other gates are untouched") {
    import spark.implicits._
    val df = Seq(
      (1L, "six good words make a line."),
      (2L, "six good words plus zzqx dirt."),        // blocklisted
      (3L, "bad encoding here\u0001\u0007 fails."), // encoding gate
      (4L, "lorem ipsum heads this doc. more words follow here."))
      .toDF("doc_id", "text")
    def ids(bp: Seq[String]) = Curation.hygiene(df, col("text"), "t2",
        minWordsPerLine = 3, blockPhrases = bp)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(Nil) === Set(1L, 2L))
    assert(ids(Seq("zzqx")) === Set(1L))
    // phrase only hit on a boundary: "zzq" never fires on "zzqx" pages
    assert(ids(Seq("zzq")) === Set(1L, 2L))
  }

  // ---- WordPiece tokenizer ------------------------------------------------

  private def wpModel(pieces: String*): graft.functions.WordPieceModel =
    new graft.functions.WordPieceModel(pieces.toArray, "[UNK]")

  private def wpSeg(w: String, m: graft.functions.WordPieceModel) =
    graft.functions.WordPieceApply.segmentWord(w, m).toSeq

  test("wordpiece greedy: longest-match-first at word start and mid-word; " +
    "greedy is NOT globally optimal and that is the pinned contract") {
    val m = wpModel("t", "th", "the", "##e", "##h", "va", "val",
      "##lue", "##u", "##l")
    assert(wpSeg("the", m) === Seq("the"))        // longest beats th/t
    assert(wpSeg("thee", m) === Seq("the", "##e"))
    // greedy commits to "val" and pays 3 pieces; va|##lue (2) is never seen
    assert(wpSeg("value", m) === Seq("val", "##u", "##e"))
    assert(wpSeg("valu", m) === Seq("val", "##u"))
  }

  test("wordpiece greedy: all-or-nothing [UNK] — no initial match, stuck " +
    "mid-word after progress, and the empty/single-char edges") {
    val m = wpModel("a", "ab", "##b", "##c")
    assert(wpSeg("abc", m) === Seq("ab", "##c"))
    assert(wpSeg("abcd", m) === Seq("[UNK]"))     // stuck at 'd' after 2 pieces
    assert(wpSeg("xab", m) === Seq("[UNK]"))      // no initial match
    assert(wpSeg("a", m) === Seq("a"))
    assert(wpSeg("", m) === Seq())
  }

  test("wordpiece model validation: rejects empties, duplicates, bare-## " +
    "continuations, and over-span pieces") {
    intercept[IllegalArgumentException](wpModel())
    intercept[IllegalArgumentException](wpModel("a", "a"))
    intercept[IllegalArgumentException](wpModel(""))
    intercept[IllegalArgumentException](wpModel("##"))
    intercept[IllegalArgumentException](wpModel("a" * 17))
    wpModel("a" * 16, "##" + "b" * 16) // at the cap: fine
  }

  test("wordpiece trainer segmentation: marked-char init + min-rank merge " +
    "loop with ##-stripping products, and merge-list validation") {
    import graft.functions.{WordPieceMergeModel, WordPieceSegment}
    val m = new WordPieceMergeModel(Array(
      "##a" -> "##b", "c" -> "##ab"))             // c+##ab needs rank-0's product
    def seg(w: String) = WordPieceSegment.segmentWord(w, m).toSeq
    assert(seg("cab") === Seq("cab"))             // both merges fire in order
    assert(seg("dab") === Seq("d", "##ab"))       // rank-0 only
    assert(seg("ca") === Seq("c", "##a"))         // no pair present
    intercept[IllegalArgumentException](new WordPieceMergeModel(
      Array("a" -> "b")))                         // right operand must be ##
    intercept[IllegalArgumentException](new WordPieceMergeModel(
      Array("c" -> "##ab")))                      // operand from no earlier merge
  }

  test("wordpiece trainer: deterministic, likelihood-ranked (the dominant " +
    "LOW-frequency-symbol pair wins over the raw-count argmax), and the " +
    "vocab round-trips through apply") {
    import spark.implicits._
    // 'ab' pair count 30 with n_a=n_b=30 -> score 1/30; 'xe' count 25 but
    // e also ends every "we"/"ze" word (n_e=75) -> 25/(25*75) = 1/75.
    // A raw-count trainer at equal counts would also pick ab; tilt it:
    // make xe the COUNT argmax (35) yet still the likelihood loser.
    val docs = (Seq.fill(30)("ab") ++ Seq.fill(35)("xe") ++
        Seq.fill(20)("we") ++ Seq.fill(20)("ze"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val m1 = TA.wordPieceTrain(docs, col("text"), nMerges = 1)
    val m2 = TA.wordPieceTrain(docs, col("text"), nMerges = 1)
    assert(m1.pieces.toSeq === m2.pieces.toSeq, "retrain must be bit-equal")
    // score(a,##b) = 30/(30*30) = 1/30 > score(x,##e) = 35/(35*75) = 1/75
    assert(m1.pieces.contains("ab") && !m1.pieces.contains("xe"),
      s"likelihood argmax must pick ab: ${m1.pieces.toSeq}")
    assert(wpSeg("ab", m1) === Seq("ab"))
    assert(wpSeg("xe", m1) === Seq("x", "##e"))
  }

  test("wordpiece trainer on the real corpus: vocab segments every word " +
    "with zero [UNK], and learned merges strictly cut the token count") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val m = TA.wordPieceTrain(docs, col("text"), nMerges = 8)
    assert(m.pieces.exists(p => (if (p.startsWith("##")) p.length - 2
      else p.length) >= 2), "8 merges must earn multi-char pieces")
    val agg = docs.select(
        sum(TA.wordPieceTokenCount(col("text"), m)).cast("long").as("wp"),
        sum(length(regexp_replace(col("text"), lit(" "), lit(""))))
          .cast("long").as("chars"),
        sum(size(filter(TA.wordPieceTokens(col("text"), m),
          t => t === lit("[UNK]")))).cast("long").as("unks"))
      .head()
    assert(agg.getLong(2) === 0L,
      "training keeps every corpus char: nothing can be [UNK]")
    assert(agg.getLong(0) > 0 && agg.getLong(0) < agg.getLong(1),
      "learned pieces must be used (fewer tokens than chars)")
  }

  test("wordpiece artifact round-trip: save -> atomic publish -> cold load " +
    "is bit-equal and tokenizes identically") {
    import spark.implicits._
    val docs = Seq.fill(30)((1L, "zq zq zqzq")).toDF("id", "text")
    val m = TA.wordPieceTrain(docs, col("text"), nMerges = 2)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-wp-artifact").toString
    TA.wordPieceSave(spark, m, dir)
    val loaded = TA.wordPieceLoad(spark, dir)
    assert(loaded.pieces.toSeq === m.pieces.toSeq)
    assert(loaded.unkToken === m.unkToken)
    val t1 = docs.select(TA.wordPieceTokens(col("text"), m).as("t"))
      .collect().map(_.getSeq[String](0))
    val t2 = docs.select(TA.wordPieceTokens(col("text"), loaded).as("t"))
      .collect().map(_.getSeq[String](0))
    assert(t1.toSeq === t2.toSeq)
  }

  // ---- embedding admission gate (EmbedStream.gate, batch leg) -------------

  private def vecDf(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("embed admission: same-bucket near-dup of the reference dies, " +
    "different-bucket and low-cosine arrivals admit, exact dup keeps min id") {
    val ref = vecDf(0L -> Seq(1f, 0f)).select("embedding")
    val arrivals = vecDf(
      1L -> Seq(0.9f, 0.1f),   // cos .9939 >= .95, bucket (+,+) = ref's → dies
      2L -> Seq(-1f, 0.5f),    // different bucket → admitted
      3L -> Seq(0.9f, 0.1f),   // exact dup of 1 — dedup drops it first
      4L -> Seq(0.5f, 0.866f)) // same bucket, cos 0.5 < .95 → admitted
    val got = graft.streaming.EmbedStream
      .gate(arrivals, ref, bits = 2, minCosine = 0.95)
      .select("vec_id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(2L, 4L))
  }

  test("embed admission: exact dup of an ADMITTED arrival dies in the " +
    "dedup stage even when far from every reference vector") {
    val ref = vecDf(0L -> Seq(1f, 0f)).select("embedding")
    val arrivals = vecDf(
      7L -> Seq(-0.6f, 0.8f),
      9L -> Seq(-0.6f, 0.8f)) // identical — only min id 7 survives
    val got = graft.streaming.EmbedStream
      .gate(arrivals, ref, bits = 2, minCosine = 0.95)
      .select("vec_id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(7L))
  }

  test("embed admission: a near-dup whose sign pattern differs ESCAPES the " +
    "single-probe bucket join — the documented recall contract (q224's " +
    "multiprobe is the recall lever, not this gate)") {
    val ref = vecDf(0L -> Seq(1f, 0.0001f)).select("embedding")
    // cosine ≈ 1.0 but dim-2 sign flips the bucket: admitted by contract
    val arrivals = vecDf(5L -> Seq(1f, -0.0001f))
    val got = graft.streaming.EmbedStream
      .gate(arrivals, ref, bits = 2, minCosine = 0.95)
      .select("vec_id").collect().map(_.getLong(0))
    assert(got.toSeq === Seq(5L))
  }
}
