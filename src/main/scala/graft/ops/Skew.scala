package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for the 100 TB path.
  *
  * AQE (`spark.sql.adaptive.enabled`, on in [[graft.GraftSession]]) already
  * splits skewed shuffle partitions at runtime; these are the explicit
  * tools for the cases AQE can't fix:
  *  - a single group key so hot that one reducer drowns → [[saltedAggregate]]
  *    two-phase aggregation (salt fan-out, partial merge, final merge);
  *  - a hot join key against a non-broadcastable dim → [[saltedJoin]]
  *    (salt the fact side, replicate the dim side salt-ways).
  *
  * Both are algebraic rewrites, not samplers: results are exactly equal to
  * the unsalted plan (specs pin this).
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Uniform salt in [0, buckets): seeded `rand` — the idiom Spark's
    * indeterminate-stage rollback understands for retry correctness
    * (partition-id arithmetic skews when upstream partition sizes skew,
    * which is exactly when salting is needed). */
  private def saltExpr(buckets: Int): Column =
    floor(rand(42) * buckets).cast("int")

  /** Aggregations that re-merge losslessly across salt partials. */
  private def partial(op: String, in: Column, out: String): (Column, Column) = op match {
    case "sum"   => (sum(in).as(out), sum(col(out)).as(out))
    case "count" => (count(in).as(out), sum(col(out)).cast("long").as(out))
    case "min"   => (min(in).as(out), min(col(out)).as(out))
    case "max"   => (max(in).as(out), max(col(out)).as(out))
    case other => throw new IllegalArgumentException(
      s"saltedAggregate supports sum/count/min/max, got '$other' " +
        "(mean/std decompose into sum+count at the call site)")
  }

  /** Two-phase salted groupBy: phase 1 aggregates on (keys, salt) — the hot
    * key fans out over `saltBuckets` reducers — phase 2 merges partials on
    * the true keys. `aggs` are (inputCol, op, outputCol) with re-mergeable
    * ops. */
  def saltedAggregate(df: DataFrame, keys: Seq[String],
      aggs: Seq[(String, String, String)], saltBuckets: Int): DataFrame = {
    val specs = aggs.map { case (in, op, out) => partial(op, col(in), out) }
    val phase1 = df
      .withColumn(SaltCol, saltExpr(saltBuckets))
      .groupBy((keys :+ SaltCol).map(col): _*)
      .agg(specs.head._1, specs.tail.map(_._1): _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(specs.head._2, specs.tail.map(_._2): _*)
  }

  /** Salted equi-join for a skewed fact side: fact rows get a random-ish but
    * deterministic salt in [0, saltBuckets); the (small, but not
    * broadcastable) right side is replicated saltBuckets times so every
    * salted key finds its match. Exactly an inner/left equi-join result. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "left_outer", "left_semi", "left_anti")(joinType),
      s"saltedJoin is only sound for fact-preserving join types, got '$joinType' " +
        "(right/full would emit unmatched dim rows once per salt replica)")
    val saltedFact = fact.withColumn(SaltCol, saltExpr(saltBuckets))
    val replicatedDim = dim.withColumn(SaltCol,
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(replicatedDim, Seq(key, SaltCol), joinType).drop(SaltCol)
  }
}
