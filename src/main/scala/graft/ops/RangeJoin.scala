package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized range (interval) join.
  *
  * Spark plans a bare non-equi join (`pt >= start AND pt < end`) as a
  * broadcast-nested-loop or cartesian product — quadratic, the classic
  * interval-join trap. The standard fix (as in Spark-based geospatial/
  * time-series engines): quantize time into fixed buckets, explode each
  * range into the buckets it covers, and equi-join point-bucket to
  * range-bucket, re-checking the exact predicate after the hash join. Each
  * (point, range) match meets in EXACTLY one bucket — the point's — so no
  * dedup pass is needed and the output is the precise interval join.
  *
  * Scale: the equi-join shuffles on the bucket key like any hash join;
  * range rows replicate once per covered bucket, so choose `bucketLen`
  * near the typical range span (replication factor ≈ span/bucketLen + 1).
  * Degenerate giant ranges should be split or handled on a broadcast side
  * path by the caller.
  */
object RangeJoin {

  /** Exact floor-division bucket for non-negative longs: `c - c%len` is an
    * exact multiple of `len`, so the double division is exact (no boundary
    * flips from FP rounding at epoch-micros magnitudes). */
  private def bucketOf(c: Column, len: Long): Column =
    ((c - c % len) / len).cast("long")

  /** All (left-row, range-row) pairs with `start <= pt < end`, as one
    * equi-join on the time bucket. `pt`, `start`, `end` are non-negative
    * long columns in the same unit (epoch micros by convention); column
    * names must not collide across the two inputs. */
  def pointInRange(left: DataFrame, pt: Column, ranges: DataFrame,
      start: Column, end: Column, bucketLen: Long): DataFrame = {
    require(bucketLen > 0, "bucketLen must be positive")
    val l = left.withColumn("__bucket", bucketOf(pt, bucketLen))
    // drop inverted ranges BEFORE the explode: sequence(a, b) with a > b
    // generates a DESCENDING sequence, so one malformed row would explode
    // into bucketOf(start)-bucketOf(end) spurious rows instead of zero
    val r = ranges.filter(end > start).withColumn("__bucket",
      explode(sequence(bucketOf(start, bucketLen), bucketOf(end - 1, bucketLen))))
    l.join(r, Seq("__bucket"))
      .filter(pt >= start && pt < end)
      .drop("__bucket")
  }
}
