package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semantic-coherent context assembly — the "in-context pretraining" pack
  * order (Shi et al. 2023: packing RELATED documents into one training
  * context instead of random concatenation measurably improves long-context
  * use). The repo's packing layer ([[Chunking.pack]]/[[Chunking.packFFD]])
  * is token-budget-only; this module supplies the missing ORDER: a
  * deterministic greedy walk over the k-NN similarity graph
  * ([[Similarity.knnGraph]]) within each pack group, so graph neighbors
  * become sequence neighbors and the concat-and-cut packer lands related
  * documents in the same context window.
  *
  * Extension scope (not reference parity): part of the LLM-data-pipeline
  * assembly layer next to [[Chunking]] and [[Sampling.trainingShards]]. */
object Assembly {

  // not private: Spark's codegen'd encoder projections need access
  final case class WalkDoc(g: String, doc: Long)
  final case class WalkEdge(g: String, i: Long, j: Long, rk: Int)
  final case class WalkPos(g: String, pos: Long, doc: Long)

  /** Deterministic greedy neighbor walk, per group: start at the group's
    * MINIMUM doc id; from the current doc, move to its best-ranked (by
    * `rk` ascending, then `j`) not-yet-visited graph neighbor; when the
    * current doc has no unvisited neighbor, JUMP to the minimum unvisited
    * doc id (the hash/id-order fallback) and continue. Every doc in
    * `docs` appears exactly once; the output `(g, pos, doc)` is the pack
    * order [[Chunking.packOrdered]] consumes. Fully deterministic (total
    * tie order: rank, then id), so the walk is oracle-replayable
    * bit-for-bit ([[semanticWalkCte]]).
    *
    * `edges` must expose `(g, i, j, rk)` — the [[Similarity.knnGraph]]
    * edge list restricted to within-group pairs (the caller joins the
    * group key onto both endpoints); edges whose endpoints are not in
    * `docs` are ignored. `rk` is knnGraph's per-source rank, so the walk
    * prefers the strongest similarity edge without ever comparing raw
    * floats across engines.
    *
    * Scale shape: ONE cogroup — two hash exchanges on the group key, the
    * docs side carrying `(g, id)` only and the edges side bounded at
    * k·|group| rows by knnGraph's construction (the walk never shuffles
    * more than the bounded edge list; spec-pinned in OpsSpecR14). The
    * walk itself is sequential WITHIN a group (inherent to any
    * chain-building order) and O(n·k + n log n) per group — pick pack
    * groups that bound group size (source/shard/date), exactly
    * [[Chunking.packFFD]]'s stated rule. Groups run in parallel. */
  def semanticWalk(docs: DataFrame, group: Column, id: Column,
      edges: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val dk = docs.select(group.cast("string").as("g"),
        id.cast("long").as("doc"))
      .as[WalkDoc].groupByKey(_.g)
    val ek = edges.select(col("g").cast("string").as("g"),
        col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        col("rk").cast("int").as("rk"))
      .as[WalkEdge].groupByKey(_.g)
    dk.cogroup(ek) { (g: String, ds: Iterator[WalkDoc], es: Iterator[WalkEdge]) =>
      val all = ds.map(_.doc).toArray
      if (all.isEmpty) Iterator.empty
      else {
        // neighbor lists in (rk, j) priority order — integer tie total order
        val nbrs: Map[Long, Array[Long]] = es.toArray.groupBy(_.i)
          .map { case (i, arr) => i -> arr.sortBy(e => (e.rk, e.j)).map(_.j) }
        val unvisited = scala.collection.mutable.TreeSet.empty[Long]
        all.foreach(unvisited += _)
        val out = new scala.collection.mutable.ArrayBuffer[WalkPos](all.length)
        var cur = unvisited.firstKey
        unvisited -= cur
        var pos = 1L
        out += WalkPos(g, pos, cur)
        while (unvisited.nonEmpty) {
          val next = nbrs.getOrElse(cur, Array.empty[Long])
            .find(unvisited.contains)
            .getOrElse(unvisited.firstKey)
          unvisited -= next
          pos += 1
          out += WalkPos(g, pos, next)
          cur = next
        }
        out.iterator
      }
    }.toDF()
  }

  /** DuckDB twin of [[semanticWalk]] (oracle construction): CTE list (no
    * leading WITH; the caller's WITH must be RECURSIVE) ending in relation
    * `walk(g, pos, doc)`. Requires two relations already in scope:
    * `__wk_nbr(g, i, nb)` — per-node neighbor LIST in (rk, j) order — and
    * `__wk_docs(g, docs, n)` — per-group sorted doc-id LIST + count. The
    * recursion carries the visited set as a LIST (the q97 FFD-replay
    * technique); each step takes the first unvisited neighbor of the
    * current doc, else the first unvisited doc id. The neighbor pick
    * filters against `s.docs`, matching [[semanticWalk]]'s dangling-edge
    * rule exactly: a neighbor id that is not in the group's doc set is
    * IGNORED, never walked to (so the twin stays bit-equal even when the
    * caller's `__wk_nbr` lists carry ids outside the doc set). */
  val semanticWalkCte: String =
    """walk AS (
       SELECT g, CAST(1 AS BIGINT) AS pos, docs[1] AS doc,
              [docs[1]] AS visited
       FROM __wk_docs
       UNION ALL
       SELECT w.g, w.pos + 1,
              coalesce(
                list_filter(n.nb, x -> list_contains(s.docs, x)
                  AND NOT list_contains(w.visited, x))[1],
                list_filter(s.docs, x -> NOT list_contains(w.visited, x))[1]),
              list_append(w.visited, coalesce(
                list_filter(n.nb, x -> list_contains(s.docs, x)
                  AND NOT list_contains(w.visited, x))[1],
                list_filter(s.docs, x -> NOT list_contains(w.visited, x))[1]))
       FROM walk w
       JOIN __wk_docs s ON s.g = w.g
       LEFT JOIN __wk_nbr n ON n.g = w.g AND n.i = w.doc
       WHERE w.pos < s.n
     )"""
}
