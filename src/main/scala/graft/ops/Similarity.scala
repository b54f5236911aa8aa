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

  /** Cosine via the native codegen'd [[graft.functions.CosineSimilarity]]
    * expression — one fused zero-allocation loop per row, bit-identical to
    * [[cosine]] (same summation order and final form). Inputs must be raw
    * `array<float>` columns. */
  def cosineNative(df: DataFrame, a: Column, b: Column): Column = {
    graft.GraftExtensions.ensureRegistered(df.sparkSession)
    call_function("cosine_sim", a, b)
  }

  /** Brute-force cosine top-k of `df` rows against the single-row `query`
    * (joined via broadcast cross join). `native=true` uses the fused codegen
    * expression; false the composable array-lambda form. */
  def bruteForceTopK(df: DataFrame, id: Column, vec: Column, query: DataFrame,
      queryVec: Column, k: Int, native: Boolean = true): DataFrame = {
    val joined = df.crossJoin(broadcast(query.select(queryVec.as("__q"))))
    val cos =
      if (native) cosineNative(df, vec, col("__q"))
      else cosine(asDouble(vec), asDouble(col("__q")))
    joined.select(id.as("id"), cos.as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }

  /** Sign-LSH bucketed top-k: evaluate cosine only inside the query's bucket. */
  def lshTopK(df: DataFrame, id: Column, vec: Column, query: DataFrame,
      queryVec: Column, bits: Int, k: Int, native: Boolean = true): DataFrame = {
    val joined = df.withColumn("__bucket", signBucket(vec, bits))
      .crossJoin(broadcast(query.select(queryVec.as("__q"),
        signBucket(queryVec, bits).as("__qbucket"))))
      .filter(col("__bucket") === col("__qbucket"))
    val cos =
      if (native) cosineNative(df, vec, col("__q"))
      else cosine(asDouble(vec), asDouble(col("__q")))
    joined.select(id.as("id"), cos.as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }

  /** IVF-style ANN: partition vectors into `nCentroids` inverted lists by
    * nearest centroid; a query probes only the `nProbe` nearest lists.
    *
    * Centroids here are a deterministic id-stride sample (swap in k-means
    * centroids in production — the pipeline shape is identical). With
    * `nProbe == nCentroids` this degrades to exact brute force (spec-pinned).
    *
    * Scale shape: assignment is one broadcast-centroids map stage (n×C fused
    * cosines, no shuffle); at query time the probed lists are the only rows
    * scored — with the table written partitioned by `cluster`, partition
    * pruning skips the rest entirely. */
  def ivfTopK(df: DataFrame, id: Column, vec: Column, query: DataFrame,
      queryVec: Column, nCentroids: Int, nProbe: Int, k: Int): DataFrame = {
    val stride = math.max(df.count() / nCentroids, 1L)
    // orderBy before limit: the stride filter can match more than nCentroids
    // ids, and an unordered limit would make the centroid set (and therefore
    // every result) partition-order dependent
    val centroids = broadcast(
      df.select(id.as("cid"), vec.as("cvec"))
        .filter(pmod(col("cid"), lit(stride)) === 0)
        .orderBy("cid")
        .limit(nCentroids))
    // inverted-list assignment: one broadcast map stage, no shuffle of vectors
    val assigned = df.select(id.as("vid"), vec.as("v"))
      .crossJoin(centroids)
      .withColumn("ccos", cosineNative(df, col("v"), col("cvec")))
      .groupBy("vid")
      .agg(expr("max_by(cid, ccos)").as("cluster"), first("v").as("v"))
    // probe the nProbe centroids nearest to the query
    val probed = broadcast(
      centroids.crossJoin(broadcast(query.select(queryVec.as("qv"))))
        .select(col("cid"), col("qv"),
          cosineNative(df, col("cvec"), col("qv")).as("ccos"))
        .orderBy(col("ccos").desc, col("cid"))
        .limit(nProbe))
    assigned.join(probed, col("cluster") === col("cid"))
      .select(col("vid").as("id"), cosineNative(df, col("v"), col("qv")).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }

  /** Blocked all-pairs similarity: cosine only within sign-LSH buckets —
    * the scalable skeleton for embedding near-dup mining (bucket sizes bound
    * the quadratic term). */
  def bucketedPairs(df: DataFrame, id: Column, vec: Column, bits: Int,
      native: Boolean = true): DataFrame = {
    val b = df.select(id.as("vid"), vec.as("v"))
      .withColumn("bucket", signBucket(col("v"), bits))
    val cos =
      if (native) cosineNative(df, col("a.v"), col("b.v"))
      else cosine(asDouble(col("a.v")), asDouble(col("b.v")))
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("i"), col("b.vid").as("j"), col("a.bucket").as("bucket"),
        cos.as("cos"))
  }
}
