package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A compiled multi-phrase blocklist (Aho–Corasick automaton), driver-sized
  * by contract — real badword/blocklist files are hundreds to a few
  * thousand short phrases (C4's public "dirty, naughty, obscene" list is
  * ~400 entries per language), the same budget class as [[BpeModel]] — and
  * shipped to executors inside the expression via `addReferenceObj`.
  *
  * Matching contract (fixed here so the DuckDB oracle can replay it):
  *  - matching is CASE-EXACT over the characters it is given — callers
  *    that want case-insensitive C4 semantics pass `lower(text)` and
  *    lowercase phrases (both engines' `lower` agree on ASCII, and the
  *    repo's blocklists are ASCII by construction);
  *  - with `wordBoundary = true` (the C4 badword mode) an occurrence
  *    counts only when the characters adjacent to the matched span are
  *    NOT ASCII word characters `[A-Za-z0-9]` (or the span touches the
  *    string edge) — exactly the RE2 predicate
  *    `(^|[^A-Za-z0-9])phrase($|[^A-Za-z0-9])`, so multi-word phrases
  *    match across any whitespace/punctuation spelling the phrase uses
  *    literally. Word-boundary phrases must start and end with a word
  *    character (validated) — a phrase ending in punctuation would make
  *    the boundary predicate unsatisfiable;
  *  - the UTF-16 scan and RE2's codepoint scan agree on the boundary
  *    test: a surrogate half is not ASCII-alphanumeric in either.
  *
  * The goto/fail/output tables are rebuilt lazily per deserialized copy
  * (the [[BpeModel.ranks]] pattern) — only the phrase array travels. */
final class PhraseAutomaton(val phrases: Array[String],
    val wordBoundary: Boolean = true) extends Serializable {
  locally {
    require(phrases.nonEmpty, "phrase list must be non-empty")
    val seen = new java.util.HashSet[String]()
    phrases.foreach { p =>
      require(p != null && p.nonEmpty, "blocked phrase must be non-empty")
      require(seen.add(p), s"duplicate blocked phrase: '$p'")
      require(!wordBoundary ||
        (PhraseMatch.isWordChar(p.charAt(0)) &&
          PhraseMatch.isWordChar(p.charAt(p.length - 1))),
        s"word-boundary phrase must start and end with [A-Za-z0-9]: '$p'")
    }
  }

  @transient lazy val trie: PhraseMatch.Trie = PhraseMatch.build(phrases)

  override def toString: String =
    s"PhraseAutomaton(${phrases.length} phrases, boundary=$wordBoundary)"
}

/** Multi-phrase containment scan as ONE native per-row pass: reports every
  * blocklist phrase occurring in the text — `array<string>` of DISTINCT
  * matched phrases in BLOCKLIST ORDER (rule order, so downstream "first
  * rule that fired" reporting is stable and the oracle can re-sort by the
  * phrase table's index). Empty array = clean text.
  *
  * This is the C4 §2.2 page gate the per-phrase alternative runs N
  * `contains`/`regexp` passes for: the automaton reads each character
  * once, so cost is O(|text| + matches) regardless of blocklist size.
  * Scale shape: zero shuffle — a projection inside whole-stage codegen
  * (the generated code is one static call); the automaton rides the
  * expression as a broadcast-sized reference object, built once per
  * executor from the serialized phrase list. */
case class PhraseMatches(child: Expression, automaton: PhraseAutomaton)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"phrase_matches expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    PhraseMatch.matches(input.asInstanceOf[UTF8String], automaton)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val autoRef = ctx.addReferenceObj("phraseAutomaton", automaton,
      classOf[PhraseAutomaton].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PhraseMatch.matches($c, $autoRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): PhraseMatches =
    copy(child = newChild)

  override def prettyName: String = "phrase_matches"
}

object PhraseMatch {

  /** ASCII word character — the boundary alphabet (RE2 `[A-Za-z0-9]`). */
  def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  /** Built Aho–Corasick tables: per-node char→node transitions, failure
    * links, and per-node COMPLETE output sets (own endings ∪ output of the
    * failure chain, flattened at build so the scan never walks fail links
    * for outputs). */
  final class Trie(val next: Array[java.util.HashMap[Character, Integer]],
      val fail: Array[Int], val out: Array[Array[Int]])

  def build(phrases: Array[String]): Trie = {
    val next = new java.util.ArrayList[java.util.HashMap[Character, Integer]]()
    val ends = new java.util.ArrayList[java.util.ArrayList[Int]]()
    def newNode(): Int = {
      next.add(new java.util.HashMap[Character, Integer]())
      ends.add(new java.util.ArrayList[Int]())
      next.size() - 1
    }
    newNode() // root = 0
    var pi = 0
    while (pi < phrases.length) {
      val p = phrases(pi)
      var s = 0
      var i = 0
      while (i < p.length) {
        val c = Character.valueOf(p.charAt(i))
        val t = next.get(s).get(c)
        if (t == null) {
          val nn = newNode()
          next.get(s).put(c, nn)
          s = nn
        } else s = t
        i += 1
      }
      ends.get(s).add(pi)
      pi += 1
    }
    val n = next.size()
    val fail = new Array[Int](n)
    val out = new Array[Array[Int]](n)
    out(0) = Array.empty
    val queue = new java.util.ArrayDeque[Integer]()
    next.get(0).forEach { (_, t) => fail(t) = 0; queue.add(t) }
    while (!queue.isEmpty) {
      val s = queue.poll().intValue()
      // BFS order guarantees fail(s) (strictly shallower) is complete
      val own = ends.get(s)
      val inherited = out(fail(s))
      val merged = new Array[Int](own.size() + inherited.length)
      var k = 0
      while (k < own.size()) { merged(k) = own.get(k); k += 1 }
      System.arraycopy(inherited, 0, merged, own.size(), inherited.length)
      out(s) = merged
      next.get(s).forEach { (c, t) =>
        var f = fail(s)
        while (f != 0 && !next.get(f).containsKey(c)) f = fail(f)
        val g = next.get(f).get(c)
        fail(t) = if (g != null && g.intValue() != t.intValue()) g.intValue() else 0
        queue.add(t)
      }
    }
    new Trie(next.toArray(new Array[java.util.HashMap[Character, Integer]](n)),
      fail, out)
  }

  /** One left-to-right automaton pass; called from interpreted eval AND
    * the generated code. */
  def matches(text: UTF8String, a: PhraseAutomaton): GenericArrayData = {
    val s = text.toString
    val trie = a.trie
    val matched = new Array[Boolean](a.phrases.length)
    var nMatched = 0
    var st = 0
    var i = 0
    val n = s.length
    while (i < n && nMatched < matched.length) {
      val c = Character.valueOf(s.charAt(i))
      while (st != 0 && !trie.next(st).containsKey(c)) st = trie.fail(st)
      val t = trie.next(st).get(c)
      st = if (t == null) 0 else t.intValue()
      val outs = trie.out(st)
      var k = 0
      while (k < outs.length) {
        val pidx = outs(k)
        if (!matched(pidx)) {
          val start = i - a.phrases(pidx).length + 1
          val ok = !a.wordBoundary ||
            ((start == 0 || !isWordChar(s.charAt(start - 1))) &&
              (i == n - 1 || !isWordChar(s.charAt(i + 1))))
          if (ok) { matched(pidx) = true; nMatched += 1 }
        }
        k += 1
      }
      i += 1
    }
    val res = new Array[AnyRef](nMatched)
    var j = 0
    var w = 0
    while (j < matched.length) {
      if (matched(j)) { res(w) = UTF8String.fromString(a.phrases(j)); w += 1 }
      j += 1
    }
    new GenericArrayData(res)
  }
}
