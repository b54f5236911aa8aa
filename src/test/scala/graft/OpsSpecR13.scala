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
}
