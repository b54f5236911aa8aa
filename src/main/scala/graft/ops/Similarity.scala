package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths, matching the 100 TB design brief:
  *  - brute-force cosine top-k: one codegen'd map stage + TakeOrderedAndProject
  *    (per-partition heaps, no global sort). The correctness baseline.
  *  - sign-LSH bucketed top-k: random-hyperplane-style bucket (sign bits of
  *    leading dimensions) prunes candidates before the cosine evaluation —
  *    the shape that survives when the table is billions of vectors: bucket
  *    is a cheap map-side key, candidate evaluation touches only the query's
  *    bucket (partition-prunable if the table is written bucketed/partitioned
  *    by this key).
  *
  * All vector math is array-lambda expression composition (`zip_with` +
  * `aggregate` fold in index order) — deterministic summation order, which
  * keeps results reproducible and oracle-comparable; no UDFs, stays in
  * whole-stage codegen.
  */
object Similarity {

  /** Cast float array to double for exact, portable arithmetic. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product, sequential index-order fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** DuckDB twin of [[cosine]] over float-list columns (oracle use). */
  def cosineSql(a: String, b: String): String = {
    def d(x: String, y: String) =
      s"list_sum(list_transform(generate_series(1, len($x)), i -> $x[i]::DOUBLE * $y[i]::DOUBLE))"
    s"${d(a, b)} / (sqrt(${d(a, a)}) * sqrt(${d(b, b)}))"
  }

  /** Sign-LSH bucket: bit i set iff dimension i+1 is non-negative. A fixed
    * projection basis (the leading `bits` axes) keeps it deterministic and
    * engine-portable; swap in a seeded random basis for production skew
    * resistance. */
  def signBucket(v: Column, bits: Int): Column =
    (0 until bits)
      .map(i => when(element_at(v, i + 1) >= 0f, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)

  def signBucketSql(col: String, bits: Int): String =
    s"""list_sum(list_transform(generate_series(1, $bits),
       | i -> CASE WHEN $col[i] >= 0 THEN (1::BIGINT << (i - 1)) ELSE 0::BIGINT END))::BIGINT""".stripMargin

  /** Brute-force cosine top-k of `df` rows against the single-row `query`
    * (joined via broadcast cross join). */
  def bruteForceTopK(df: DataFrame, id: Column, vec: Column, query: DataFrame,
      queryVec: Column, k: Int): DataFrame =
    df.crossJoin(broadcast(query.select(asDouble(queryVec).as("__q"))))
      .select(id.as("id"), cosine(asDouble(vec), col("__q")).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)

  /** Sign-LSH bucketed top-k: evaluate cosine only inside the query's bucket. */
  def lshTopK(df: DataFrame, id: Column, vec: Column, query: DataFrame,
      queryVec: Column, bits: Int, k: Int): DataFrame =
    df.withColumn("__bucket", signBucket(vec, bits))
      .crossJoin(broadcast(query.select(asDouble(queryVec).as("__q"),
        signBucket(queryVec, bits).as("__qbucket"))))
      .filter(col("__bucket") === col("__qbucket"))
      .select(id.as("id"), cosine(asDouble(vec), col("__q")).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)

  /** Blocked all-pairs similarity: cosine only within sign-LSH buckets —
    * the scalable skeleton for embedding near-dup mining (bucket sizes bound
    * the quadratic term). */
  def bucketedPairs(df: DataFrame, id: Column, vec: Column, bits: Int): DataFrame = {
    val b = df.select(id.as("vid"), asDouble(vec).as("v"))
      .withColumn("bucket", signBucket(col("v"), bits))
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("i"), col("b.vid").as("j"), col("a.bucket").as("bucket"),
        cosine(col("a.v"), col("b.v")).as("cos"))
  }
}
