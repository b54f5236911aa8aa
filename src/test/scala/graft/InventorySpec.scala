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
