package graft

import org.scalatest.funsuite.AnyFunSuite

/** Meta-spec over the driver contract: the query inventory must stay
  * internally consistent, because the driver's correctness gate silently
  * downgrades any query without an `oracleSql` entry to a weaker rows-only
  * check — a typo'd key would LOOK green while verifying nothing. */
class InventorySpec extends AnyFunSuite {

  /** Queries that are rows-only BY DESIGN (engine-specific estimates that
    * no exact SQL twin can reproduce) — every other query needs an oracle.
    * Empty since round 7: q34/q57 now emit oracle-checkable error/recall
    * bounds (the estimate is engine-specific, its bound is not). */
  private val rowsOnlyByDesign = Set.empty[String]

  test("the driver's entry() smoke contract returns rows") {
    import SparkTestSession._
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle unless documented rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing === rowsOnlyByDesign,
      s"queries without oracle beyond the documented set: ${missing -- rowsOnlyByDesign}")
  }

  test("no orphan oracles (oracle key without a query)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries with no query: $orphans")
  }

  /** Rounded-rational census walker (the q169 guard): flags every
    * `round()` whose argument is an IEEE division of exact integers —
    * DIRECTLY, LAUNDERED through Project/Alias chains (r14: a bottom-up
    * attribute-lineage walk taints the exprId of any alias whose child is
    * an exact-integer quotient or a reference to one, so
    * `withColumn("r", intA/intB)` + a later `round(r)` is caught too), or
    * PASSED THROUGH literal arithmetic (r15: `q * 1.0`, `q + 0.0`,
    * `q * 100` keep the taint — a foldable operand only rescales the same
    * IEEE quotient, its half-ties still sit on engine-dependent bits).
    * r15 also flags `Average` over a tainted child: avg of an
    * integer-ratio column is the mean-of-ratios class (quantize per-row
    * to the micro grid, integer-sum, halfUpDiv — never avg the double).
    * r15 also flags `Sum` over a DOUBLE tainted child — summing IEEE
    * quotients is order-dependent across engines even unrounded.
    * r16 widens to TWO-TAINTED-CHILDREN arithmetic: a product/sum/
    * difference of two tainted quotients (ratio-of-ratios) and a Divide
    * with EITHER side tainted keep the taint — this caught q139's
    * round(nb/rb − na/ra, 6) live (null-rate delta, shipping since r5;
    * migrated to ratioRoundedSigned on the exact cross-multiplied
    * rational). r18 closes the r17-documented blind spot: a MULTIPLY
    * with EITHER side tainted keeps the taint regardless of the other
    * operand — literal (r15), second quotient (r16), or an arbitrary
    * non-literal double column (`q * some_double_col`): scaling by any
    * factor preserves the quotient's engine-dependent low bits, exactly
    * as Divide already treated it. r19 closes the last documented
    * arithmetic blind spot: ADD/SUBTRACT with EITHER side tainted keeps
    * the taint whatever the other operand is — including an untainted
    * non-literal double column — completing the rule set: NO arithmetic
    * node washes a tainted operand (an addend large enough to absorb
    * the quotient's low bits cannot be proven at plan time, so the
    * walker stays conservative). The four binary arithmetic forms now
    * share one discipline; what remains outside it is non-arithmetic
    * laundering (e.g. a quotient round-tripped through a string), which
    * no query does and the dual-SF oracle gate backstops. */
  private def roundedRationalOffenders(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Average, Sum}
    import org.apache.spark.sql.types._
    def intExact(e: Expression): Boolean = e match {
      case c: Cast => intExact(c.child)
      case other => other.dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case d: DecimalType if d.scale == 0 => true
        case _ => false
      }
    }
    def stripCast(e: Expression): Expression = e match {
      case c: Cast => stripCast(c.child)
      case other => other
    }
    val tainted = scala.collection.mutable.Set[ExprId]()
    def taintedExpr(e: Expression): Boolean = stripCast(e) match {
      case d: Divide if intExact(d.left) && intExact(d.right) => true
      case a: AttributeReference => tainted.contains(a.exprId)
      // literal arithmetic does not wash the quotient: either operand
      // foldable + the other tainted → still the q169 class
      case m: Multiply =>
        // r18: multiplication never washes — either side tainted keeps
        // the taint whatever the other operand is (literal, second
        // quotient, or an untainted double column), the same rule
        // Divide received in r16
        taintedExpr(m.left) || taintedExpr(m.right)
      case dv: Divide =>
        // r16: quotient OF tainted operands (either side) — dividing by or
        // into an IEEE integer-quotient is the ratio-of-ratios class
        taintedExpr(dv.left) || taintedExpr(dv.right)
      case ad: Add =>
        // r19: addition never washes either — EITHER side tainted keeps
        // the taint regardless of the other operand (literal r15, second
        // quotient r16, and now an arbitrary untainted double column):
        // adding any finite value preserves which side of a half-tie the
        // quotient's engine-dependent low bits land on unless the
        // addend's magnitude absorbs them, which cannot be proven at
        // plan time — the r17/r18-documented final blind spot
        taintedExpr(ad.left) || taintedExpr(ad.right)
      case su: Subtract =>
        taintedExpr(su.left) || taintedExpr(su.right)
      case _ => false
    }
    val out = scala.collection.mutable.ArrayBuffer[String]()
    plan.foreachUp { node =>
      // aliases first, so a lateral `round` over a same-node alias resolves
      node.expressions.foreach(_.foreach {
        case al: Alias if taintedExpr(al.child) => tainted += al.exprId
        case _ =>
      })
      node.expressions.foreach(_.foreach {
        case r: Round if taintedExpr(r.child) => out += r.sql
        case av: Average if taintedExpr(av.child) => out += av.sql
        // r15: Sum over an IEEE quotient of exact integers is the same
        // mean-of-ratios class — the double summation ORDER is engine-
        // dependent, so a pinned output over it is fragile even unrounded
        case sm: Sum if sm.child.dataType == DoubleType &&
          taintedExpr(sm.child) => out += sm.sql
        case _ =>
      })
    }
    out.toSeq
  }

  test("rounded-rational census: no query output is round() over an IEEE " +
    "division of exact integers, direct OR laundered — the q169 class; " +
    "use ExactRound") {
    // Freezes the r12 ExactRound discipline against regression: a future
    // query writing round(intA / intB, k) — or hiding the quotient behind
    // a withColumn/select alias chain — re-introduces the cross-engine
    // half-tie flip that kept q169 red for two rounds.
    import SparkTestSession._
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      roundedRationalOffenders(fn(spark, sf).queryExecution.analyzed)
        .foreach(o => offenders += s"$name: $o")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    assert(offenders.isEmpty,
      s"round() over an exact-integer quotient (use ExactRound):\n" +
        offenders.mkString("\n"))
  }

  test("the census walker catches a quotient LAUNDERED through alias " +
    "chains, and does not flag double-derived ratios") {
    import SparkTestSession._
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, round}
    val base = Seq((1L, 3L)).toDF("a", "b")
    // the r13 verdict's documented escape: quotient aliased, projected
    // through a second Project, THEN rounded
    val laundered = base
      .withColumn("r", col("a") / col("b"))
      .select(col("r"), col("a"))
      .withColumn("rr", round(col("r"), 2))
    assert(roundedRationalOffenders(laundered.queryExecution.analyzed).nonEmpty,
      "the laundered round(int/int) must be flagged")
    // direct form still caught
    val direct = base.select(round(col("a") / col("b"), 2).as("rr"))
    assert(roundedRationalOffenders(direct.queryExecution.analyzed).nonEmpty)
    // a genuinely-double ratio is NOT the q169 class — no false positive
    val fine = base
      .withColumn("r", col("a") * lit(0.5) / col("b"))
      .withColumn("rr", round(col("r"), 2))
    assert(roundedRationalOffenders(fine.queryExecution.analyzed).isEmpty)
  }

  test("the census walker tracks taint through LITERAL arithmetic and " +
    "flags Average over a tainted child — the r14-documented escapes") {
    import SparkTestSession._
    import spark.implicits._
    import org.apache.spark.sql.functions.{avg, col, lit, round}
    val base = Seq((1L, 3L)).toDF("a", "b")
    // escape #1 (pre-r15): the quotient laundered through a no-op
    // multiply — round(q * 1.0) — walked straight past the alias taint
    val mulEscape = base
      .withColumn("r", col("a") / col("b"))
      .withColumn("rr", round(col("r") * lit(1.0), 2))
    assert(roundedRationalOffenders(mulEscape.queryExecution.analyzed).nonEmpty,
      "round over quotient * literal must be flagged")
    // literal add and a scale chain, laundered through an alias too
    val addEscape = base
      .withColumn("r", (col("a") / col("b")) + lit(0.0))
      .withColumn("rr", round(col("r") * lit(100), 2))
    assert(roundedRationalOffenders(addEscape.queryExecution.analyzed).nonEmpty,
      "round over (quotient + literal) * literal must be flagged")
    // escape #2 (pre-r15): avg of an integer-ratio column — the
    // mean-of-ratios class (per-row micro grid + integer sum instead)
    val avgEscape = base
      .withColumn("r", col("a") / col("b"))
      .agg(avg(col("r")).as("m"))
    assert(roundedRationalOffenders(avgEscape.queryExecution.analyzed).nonEmpty,
      "avg over an exact-integer quotient must be flagged")
    // avg of a genuinely-double ratio is not the class — no false positive
    val avgFine = base
      .withColumn("r", col("a") * lit(0.5) / col("b"))
      .agg(avg(col("r")).as("m"))
    assert(roundedRationalOffenders(avgFine.queryExecution.analyzed).isEmpty)
    // Sum over a double quotient of exact integers: summation order is
    // engine-dependent, so a pinned output over it is the same class
    import org.apache.spark.sql.functions.{sum => sqlSum}
    val sumEscape = base
      .withColumn("r", col("a") / col("b"))
      .agg(sqlSum(col("r")).as("s"))
    assert(roundedRationalOffenders(sumEscape.queryExecution.analyzed).nonEmpty,
      "sum over an exact-integer quotient must be flagged")
    // sum of exact-integer (non-quotient) columns stays unflagged
    val sumFine = base.agg(sqlSum(col("a")).as("s"))
    assert(roundedRationalOffenders(sumFine.queryExecution.analyzed).isEmpty)
  }

  test("the census walker catches TWO-TAINTED-CHILDREN arithmetic — the " +
    "r16 widening (ratio-of-ratios, quotient differences, divides with " +
    "a tainted side) — without flagging genuinely-double combinations") {
    import SparkTestSession._
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, round}
    val base = Seq((1L, 3L, 2L, 7L)).toDF("a", "b", "c", "d")
    def q1 = col("a") / col("b")
    def q2 = col("c") / col("d")
    // the q139 shape: round over a DIFFERENCE of two integer quotients
    val diff = base.withColumn("r1", q1).withColumn("r2", q2)
      .withColumn("rr", round(col("r1") - col("r2"), 6))
    assert(roundedRationalOffenders(diff.queryExecution.analyzed).nonEmpty,
      "round(quotient - quotient) must be flagged")
    // ratio-of-ratios: product and quotient of two tainted children
    val prod = base.withColumn("rr", round(q1 * q2, 6))
    assert(roundedRationalOffenders(prod.queryExecution.analyzed).nonEmpty,
      "round(quotient * quotient) must be flagged")
    val ratio = base.withColumn("r1", q1).withColumn("r2", q2)
      .withColumn("rr", round(col("r1") / col("r2"), 6))
    assert(roundedRationalOffenders(ratio.queryExecution.analyzed).nonEmpty,
      "round(quotient / quotient) must be flagged")
    // divide with ONE tainted side keeps the taint too
    val half = base.withColumn("x", col("a") * lit(0.5))
      .withColumn("rr", round(q1 / col("x"), 6))
    assert(roundedRationalOffenders(half.queryExecution.analyzed).nonEmpty,
      "round(quotient / double) must be flagged — division never washes")
    // genuinely-double arithmetic stays unflagged
    val fine = base
      .withColumn("r1", col("a") * lit(0.5) / col("b"))
      .withColumn("r2", col("c") * lit(0.5) / col("d"))
      .withColumn("rr", round(col("r1") - col("r2"), 6))
    assert(roundedRationalOffenders(fine.queryExecution.analyzed).isEmpty,
      "differences of genuinely-double ratios are not the class")
    // and a RAW threshold compare over tainted children is engine-safe —
    // only round/avg/sum sites fire, so no offender without them
    val cmp = base.withColumn("ok", (q1 - q2) >= lit(0.5))
    assert(roundedRationalOffenders(cmp.queryExecution.analyzed).isEmpty,
      "raw quotient compares must stay unflagged")
  }

  test("the census walker catches a quotient scaled by an UNTAINTED " +
    "non-literal double column — the r17-documented blind spot, closed " +
    "in r18 — without flagging products of genuinely-double ratios") {
    import SparkTestSession._
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, round}
    val base = Seq((1L, 3L, 0.5)).toDF("a", "b", "w")
    // the documented escape: round(q * w) where w is a double COLUMN
    // (not foldable, not tainted) — scaling preserves the quotient's
    // engine-dependent low bits
    val colEscape = base
      .withColumn("r", col("a") / col("b"))
      .withColumn("rr", round(col("r") * col("w"), 6))
    assert(roundedRationalOffenders(colEscape.queryExecution.analyzed).nonEmpty,
      "round(quotient * double_column) must be flagged")
    // and the mirror orientation
    val colEscape2 = base
      .withColumn("rr", round(col("w") * (col("a") / col("b")), 6))
    assert(roundedRationalOffenders(colEscape2.queryExecution.analyzed).nonEmpty,
      "round(double_column * quotient) must be flagged")
    // a product of two genuinely-double ratios stays unflagged
    val fine = base
      .withColumn("r1", col("a") * lit(0.5) / col("b"))
      .withColumn("rr", round(col("r1") * col("w"), 6))
    assert(roundedRationalOffenders(fine.queryExecution.analyzed).isEmpty,
      "products without an exact-integer quotient are not the class")
  }

  test("the census walker catches a quotient SHIFTED by an untainted " +
    "non-literal double column — the r19 widening (ADD/SUBTRACT join " +
    "MULTIPLY/DIVIDE under 'no arithmetic washes') — without flagging " +
    "sums of genuinely-double ratios") {
    import SparkTestSession._
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, round}
    val base = Seq((1L, 3L, 0.5)).toDF("a", "b", "w")
    // the r17/r18-documented escape: round(q + w) with w a double COLUMN
    val addEscape = base
      .withColumn("r", col("a") / col("b"))
      .withColumn("rr", round(col("r") + col("w"), 6))
    assert(roundedRationalOffenders(addEscape.queryExecution.analyzed).nonEmpty,
      "round(quotient + double_column) must be flagged")
    // both subtraction orientations
    val subEscape = base
      .withColumn("rr", round(col("w") - (col("a") / col("b")), 6))
    assert(roundedRationalOffenders(subEscape.queryExecution.analyzed).nonEmpty,
      "round(double_column - quotient) must be flagged")
    val subEscape2 = base
      .withColumn("r", col("a") / col("b"))
      .withColumn("rr", round(col("r") - col("w"), 6))
    assert(roundedRationalOffenders(subEscape2.queryExecution.analyzed).nonEmpty,
      "round(quotient - double_column) must be flagged")
    // a sum of genuinely-double ratios is not the class
    val fine = base
      .withColumn("r1", col("a") * lit(0.5) / col("b"))
      .withColumn("rr", round(col("r1") + col("w"), 6))
    assert(roundedRationalOffenders(fine.queryExecution.analyzed).isEmpty,
      "sums without an exact-integer quotient are not the class")
  }

  test("query names are unique across the contributing modules") {
    // Map ++ silently overwrites duplicates — count entries per source map
    val perModule = Seq(
      graft.queries.ParityQueries.queries, graft.queries.RelationalQueries.queries,
      graft.queries.EventsQueries.queries, graft.queries.TextQueries.queries,
      graft.queries.VectorQueries.queries, graft.queries.MiscQueries.queries,
      graft.queries.TpchQueries.queries, graft.queries.SubqueryQueries.queries,
      graft.queries.PipelineQueries.queries, graft.queries.SamplingQueries.queries)
    val total = perModule.map(_.size).sum
    assert(total === SparkEntry.queries.size,
      "duplicate query name collapsed by Map ++ — two modules define the same key")
  }
}
