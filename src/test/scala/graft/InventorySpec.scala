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

  test("rounded-rational census: no query output is round() over an IEEE " +
    "division of exact integers — the q169 class; use ExactRound") {
    // Freezes the r12 ExactRound discipline against regression: a future
    // query writing round(intA / intB, k) re-introduces the cross-engine
    // half-tie flip that kept q169 red for two rounds. The census walks
    // every analyzed plan and flags DIRECT round-over-Divide compositions
    // whose both operands are exact integers (possibly behind casts);
    // quotients laundered through an intermediate projection are out of
    // its reach — the dual-SF oracle gate stays the backstop for those.
    import SparkTestSession._
    import org.apache.spark.sql.catalyst.expressions.{Cast, Divide, Expression, Round}
    import org.apache.spark.sql.types._
    def intExact(e: Expression): Boolean = e match {
      case c: Cast => intExact(c.child)
      case other => other.dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case d: DecimalType if d.scale == 0 => true
        case _ => false
      }
    }
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.analyzed
      plan.foreach { node =>
        node.expressions.foreach(_.foreach {
          case r: Round => r.child match {
            case d: Divide if intExact(d.left) && intExact(d.right) =>
              offenders += s"$name: ${r.sql}"
            case _ =>
          }
          case _ =>
        })
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    assert(offenders.isEmpty,
      s"round() over an exact-integer quotient (use ExactRound):\n" +
        offenders.mkString("\n"))
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
