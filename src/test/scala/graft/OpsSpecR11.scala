package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** Round-11 operator specs: the scale-safe exact ntile (distributed rank),
  * the micro-nat-quantized backoff ladder, and the determinism/valve fixes
  * prescribed by the r10 verdict. */
class OpsSpecR11 extends AnyFunSuite {
  import SparkTestSession._

  // ---- scale-safe exact ntile -------------------------------------------

  test("ntileExact reproduces ntile() bit for bit: every k, ragged N%k, " +
    "nulls-last order, N < k") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // scores with duplicates (tie-break on id makes the order total) and
    // nulls (must rank last, exactly like ASC NULLS LAST)
    val rows = (0L until 100L).map { i =>
      (i, if (i % 13 == 0) None else Some((i * 37 % 11).toDouble))
    }
    val df = rows.toDF("id", "score")
    val order = Seq(col("score").asc_nulls_last, col("id").asc)
    for (k <- Seq(1, 3, 5, 7)) {
      val want = df.withColumn("b", ntile(k).over(Window.orderBy(order: _*)))
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      val got = Sampling.ntileExact(df, order, k, "b")
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      assert(got === want, s"k=$k diverged from the ntile window")
    }
    // N < k: every row its own bucket in rank order
    val tiny = Seq((10L, 2.0), (20L, 1.0)).toDF("id", "score")
    val got = Sampling.ntileExact(tiny, order, 5, "b")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got === Map(20L -> 1, 10L -> 2))
  }

  test("globalRowNumber is the exact global row_number under a total order") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val df = (0L until 57L).map(i => (i, i * 31 % 7)).toDF("id", "g")
    val order = Seq(col("g").asc, col("id").desc)
    val want = df.withColumn("rn",
        row_number().over(Window.orderBy(order: _*)).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = Sampling.globalRowNumber(df, order, "rn")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === want)
  }

  // ---- byte-level BPE -----------------------------------------------------

  test("byte-level BPE: multi-byte codepoints split to mapped UTF-8 bytes, " +
    "merges reassemble them, unmerged bytes stay split, ASCII self-maps") {
    import spark.implicits._
    def bch(b: Int) = String.valueOf(graft.functions.BpeApply.byteChar(b))
    val merges = Seq(
      bch(0xC3) -> bch(0xA9),               // é
      bch(0xE2) -> bch(0x82),               // € bytes 1-2
      (bch(0xE2) + bch(0x82)) -> bch(0xAC), // full €
      "t" -> "a", "ta" -> "b")
    val got = Seq("café table große €")
      .toDF("text")
      .select(TextAnalysis.bpeTokens(col("text"), merges, byteLevel = true))
      .head.getSeq[String](0)
    assert(got === Seq(
      "c", "a", "f", bch(0xC3) + bch(0xA9),          // é merged from bytes
      "tab", "l", "e",                               // ASCII chain
      "g", "r", "o", bch(0xC3), bch(0x9F), "e",      // ß stays 2 symbols
      bch(0xE2) + bch(0x82) + bch(0xAC)))            // € via chained merge
    // codepoint mode on the same text: é/ß/€ are ONE symbol each — the
    // budget drift byte level exists to close
    val cp = Seq("café große €").toDF("text")
      .select(TextAnalysis.bpeTokens(col("text"), Seq("t" -> "a")))
      .head.getSeq[String](0)
    assert(cp.contains("é") && cp.contains("ß") && cp.contains("€"))
  }

  test("byte-level BPE training learns a cross-byte merge and applies " +
    "back through the same expression") {
    import spark.implicits._
    val corpus = Seq("éé éé éé", "éé").toDF("text")
    val merges = TextAnalysis.bpeTrain(corpus, col("text"), nMerges = 1,
      byteLevel = true)
    def bch(b: Int) = String.valueOf(graft.functions.BpeApply.byteChar(b))
    // the only repeated adjacent pair is é's own byte pair
    assert(merges === Seq(bch(0xC3) -> bch(0xA9)))
    val applied = Seq("é").toDF("text")
      .select(TextAnalysis.bpeTokens(col("text"), merges, byteLevel = true))
      .head.getSeq[String](0)
    assert(applied === Seq(bch(0xC3) + bch(0xA9)))
  }

  // ---- Unicode normalization --------------------------------------------

  test("unicode normalization: NFC composes decomposed twins, NFKC folds " +
    "compatibility forms (ligature, superscript, full-width), NFC leaves them") {
    import spark.implicits._
    val dec = "café über Å"
    val comp = "café über Å"
    val compat = "ﬁle ² ＡＢ" // ﬁle ² ＡＢ
    val got = Seq((dec, comp, compat)).toDF("d", "c", "k")
      .select(TextAnalysis.normalizeText(col("d")).as("dn"),
        TextAnalysis.normalizeText(col("c")).as("cn"),
        TextAnalysis.normalizeText(col("k")).as("knfc"),
        TextAnalysis.normalizeText(col("k"), "NFKC").as("knfkc"))
      .head
    assert(got.getString(0) === got.getString(1), "NFC twins must converge")
    assert(got.getString(0) === comp)
    // NFC preserves compatibility characters; NFKC folds them to ASCII
    assert(got.getString(2) === compat)
    assert(got.getString(3) === "file 2 AB")
  }

  test("Curation.hygiene nfc flag: decomposed and composed pages come out " +
    "byte-identical; flag off preserves the raw encodings") {
    import spark.implicits._
    val docs = Seq(
      (0L, "A fine long sentence here okay.\nSecond café line stays good."),
      (1L, "A fine long sentence here okay.\nSecond café line stays good.")
    ).toDF("doc_id", "text")
    val on = Curation.hygiene(docs, col("text"), "t2", nfc = true)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(on(0L) === on(1L), "nfc=true must collapse the twins")
    assert(on(0L).contains("café"))
    val off = Curation.hygiene(docs, col("text"), "t2")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(off(0L) !== off(1L), "nfc=false must not rewrite encodings")
  }

  // ---- NB confidence margin ---------------------------------------------

  test("nbPredictWithMargin: pred matches nbPredict, margin is the exact " +
    "micro-nat best-vs-second gap, strong markers out-margin weak docs") {
    import spark.implicits._
    val train = Seq(
      ("en", "the quick brown fox en_marker"),
      ("en", "jumps over the lazy dog en_marker"),
      ("de", "der schnelle braune fuchs de_marker"),
      ("de", "springt ueber den faulen hund de_marker")).toDF("lang", "text")
    val model = TextAnalysis.nbFit(train, col("lang"), col("text"),
      nBuckets = 64, seed = 11)
    val test = Seq(
      (1L, "en_marker en_marker the fox"),  // strongly English
      (2L, "the der over den")              // mixed evidence → small margin
    ).toDF("id", "text")
    val m = TextAnalysis.nbPredictWithMargin(test, col("id"), col("text"),
        model)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    val p = TextAnalysis.nbPredict(test, col("id"), col("text"), model)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m.view.mapValues(_._1).toMap === p,
      "argmax must agree with nbPredict exactly")
    assert(m.values.forall(_._2 >= 0L), "margin is best minus second, >= 0")
    assert(m(1L)._2 > m(2L)._2,
      s"marker doc must out-margin the mixed doc: $m")
  }

  // ---- markup / FIM / URL ops -------------------------------------------

  test("stripMarkup: script/style elements drop whole, tags drop, entities " +
    "decode in the documented order, whitespace collapses") {
    import spark.implicits._
    val got = Seq(
      "<p>Hello <b>world</b></p>",
      "<script>var x=1;</script>keep<style>.a{}</style>",
      "a &amp;lt; b &lt;x&gt; &quot;q&quot; &#39;s &nbsp;end",
      "no markup at all",
      "").toDF("t")
      .select(TextAnalysis.stripMarkup(col("t"))).as[String].collect()
    assert(got(0) === "Hello world")
    assert(got(1) === "keep", "element content must not leak as prose")
    // &amp; decodes LAST: '&amp;lt;' becomes the literal '&lt;', never '<'
    assert(got(2) === "a &lt; b <x> \"q\" 's end")
    assert(got(3) === "no markup at all")
    assert(got(4) === "")
    val ratios = Seq("<script>var x=1;</script>", "half<b></b>", "text")
      .toDF("t").select(TextAnalysis.markupRatio(col("t")))
      .as[Double].collect()
    assert(ratios(0) === 1.0 && ratios(2) === 0.0)
    assert(ratios(1) > 0.0 && ratios(1) < 1.0)
  }

  test("fimTransform: pieces re-assemble the original token stream; cuts " +
    "and the coin are pure functions of the id; boundary cuts legal") {
    import spark.implicits._
    val docs = (0L until 50L).map(i =>
      (i, (0 until 6).map(j => s"w${(i * 7 + j) % 13}").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Chunking.fimTransform(docs, col("doc_id"), col("text"),
        rate = 0.6, seed = 17)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getBoolean(2),
          if (r.isNullAt(3)) -1 else r.getInt(3),
          if (r.isNullAt(4)) -1 else r.getInt(4), r.getString(5)))).toMap
    val raw = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.values.exists(_._2) && out.values.exists(!_._2),
      "rate=0.6 must leave both applied and raw docs at n=50")
    out.foreach { case (id, (n, applied, lo, hi, text)) =>
      if (!applied) assert(text === raw(id))
      else {
        val toks = raw(id).split(" ")
        assert(n === toks.length && 0 <= lo && lo <= hi && hi <= n)
        // PSM order: pre prefix suf suffix mid middle
        val expected = (Seq("<|fim_pre|>") ++ toks.take(lo) ++
          Seq("<|fim_suf|>") ++ toks.drop(hi) ++
          Seq("<|fim_mid|>") ++ toks.slice(lo, hi)).mkString(" ")
        // empty pieces collapse the double space exactly as array_join does
        assert(text.split(" ").filter(_.nonEmpty).toSeq ===
          expected.split(" ").filter(_.nonEmpty).toSeq, s"doc $id")
      }
    }
    // determinism: a second run is bit-identical
    val again = Chunking.fimTransform(docs, col("doc_id"), col("text"),
        rate = 0.6, seed = 17)
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(again === out.view.mapValues(_._5).toMap)
  }

  test("urlHost/urlDomain: scheme span, port/path/query delimiters, " +
    "subdomain collapse, non-URL and single-label edge cases") {
    import spark.implicits._
    val got = Seq(
      "https://www.Example.COM/path?q=1",
      "http://cdn.img.shop.co:8080/x",
      "ftp://host/x",
      "not a url",
      "https://localhost/admin").toDF("u")
      .select(TextAnalysis.urlHost(col("u")),
        TextAnalysis.urlDomain(col("u")))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got(0) === (("www.example.com", "example.com")))
    assert(got(1) === (("cdn.img.shop.co", "shop.co")))
    assert(got(2) === (("host", "host")))
    assert(got(3) === (("", "")))
    assert(got(4) === (("localhost", "localhost")))
  }

  // ---- bench sustained-load gate ----------------------------------------

  test("bench sustained-load gate: flags the r10 signature and the " +
    "whole-run-loaded box, passes a quiet session") {
    // the r10 artifact: min 0.196 / median 0.409 self-declared clean —
    // the median-relative segment gate shifted with the load
    assert(Bench.sustainedLoad(0.196, 0.409))
    // whole-run load inflates even the min; the cross-round floor catches it
    assert(Bench.sustainedLoad(0.40, 0.42))
    // quiet box: median within the drift ratio of both min and floor
    assert(!Bench.sustainedLoad(0.19, 0.21))
    assert(!Bench.sustainedLoad(0.20, 0.26))
  }

  // ---- micro-nat quantized backoff ladder -------------------------------

  test("stupidBackoff sums integer micro-nats per slot: a mixed-level doc " +
    "lands exactly on round(Σ round(1e6·lp) / (n·1e6), 6)") {
    import spark.implicits._
    // ref "a b c d e f": the probe's first 5-gram (abcde) is seen
    // (ln(1/1) − ln(1/1) = 0), its second (bcdez) backs off to the floor
    // (z unseen: 4lnα + ln(0+1) − ln(N+V), N=6, V=6)
    val ref = Seq((0L, "a b c d e f")).toDF("doc_id", "text")
    val probes = Seq((1L, "a b c d e z")).toDF("doc_id", "text")
    val got = TextAnalysis.stupidBackoff(probes, col("doc_id"), col("text"),
        ref, col("text"), order = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val lnA = math.log(0.4)
    val slot1 = 0.0
    val slot2 = 4 * lnA + math.log(1.0) - math.log(12.0)
    // the exact arithmetic BOTH engines replay: per-slot HALF_UP micro-nat
    // grid, exact integer sum, one IEEE division, one 6-decimal round
    val u1 = BigDecimal(1e6 * slot1).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val u2 = BigDecimal(1e6 * slot2).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    // r12 ExactRound discipline: half-up the BIGINT mean FIRST — never
    // round an IEEE quotient (its exact .5 ties are engine-dependent)
    val s = -(u1 + u2)
    val want = ((2 * s + 2L) / (2 * 2L)).toDouble / 1e6
    assert(got(1L) === ((2L, want)))
  }
}
