package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators: Z-order (Morton) interleaving so ONE sort
  * key clusters data on TWO dimensions at once. Parquet keeps per-file
  * min/max statistics per column; after a plain sort on column A, a filter
  * on column B still touches every file (B spans its full range in each
  * file). Laid out along the Z-curve, each file covers a small rectangle of
  * (A, B) space, so predicates on EITHER column prune files — the standard
  * multi-dimensional data-skipping layout (Morton 1966; the technique
  * behind Delta/Iceberg Z-ORDER). Pure bit arithmetic on both engines —
  * the q92 oracle pins the interleave value itself.
  */
object Layout {

  /** Bit-spread of the low 16 bits of `x` into even positions (0 → 0,
    * 1 → 2, …, 15 → 30) by the classic mask-doubling ladder. */
  def spread16(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** DuckDB twin of [[spread16]]. */
  def spread16Sql(x: String): String = {
    val a = s"(($x) & 65535)"
    val b = s"((($a | ($a << 8)) & 16711935))"
    val c = s"((($b | ($b << 4)) & 252645135))"
    val d = s"((($c | ($c << 2)) & 858993459))"
    s"((($d | ($d << 1)) & 1431655765))"
  }

  /** Morton code of two 16-bit dimensions: bits of `a` at even positions,
    * bits of `b` at odd. Equal-prefix z-values = same rectangle of (a, b)
    * space. */
  def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** DuckDB twin of [[zValue]]. */
  def zValueSql(a: String, b: String): String =
    s"(${spread16Sql(a)} | (${spread16Sql(b)} << 1))"

  /** Range-partition and sort by the Morton code of (a, b) — each output
    * file then covers a compact rectangle of the two-dimensional space, so
    * parquet min/max stats prune on either column (spec-pinned in ScaleSpec
    * by measuring per-file spans).
    *
    * Each dimension is min-max normalized onto the full 16-bit grid first
    * (one tiny write-time aggregate): raw interleaving only clusters when
    * both dims use comparable bit widths — with a ∈ [0, 2^8) and
    * b ∈ [0, 2^12), every z high bit comes from b and the "z-order"
    * silently degenerates to a plain sort on b (found by the per-file-span
    * spec; the same reason production Z-ORDER implementations normalize by
    * range or rank). */
  def writeZOrdered(df: DataFrame, path: String, a: Column, b: Column,
      files: Int): Unit = {
    val s = df.agg(
      min(a.cast("long")), max(a.cast("long")),
      min(b.cast("long")), max(b.cast("long"))).head()
    if (s.isNullAt(0)) { // empty input: nothing to lay out, write as-is
      df.write.mode("overwrite").parquet(path)
      return
    }
    def norm(c: Column, lo: Long, hi: Long): Column =
      ((c.cast("long") - lo) * 65535L / math.max(hi - lo, 1L)).cast("long")
    val z = zValue(norm(a, s.getLong(0), s.getLong(1)),
      norm(b, s.getLong(2), s.getLong(3)))
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Bucketed layout for RECURRING equi-joins and aggregations on a fixed
    * key: both sides written with the same bucket count hash-place matching
    * keys in matching files, so every later join or groupBy on that key
    * reads co-located data and plans with ZERO shuffle exchanges
    * (spec-pinned in PlanSpec) — at 100 TB this converts the nightly
    * fact-to-fact join from a full-table shuffle into a per-bucket local
    * merge. Bucket metadata lives in the session catalog (`saveAsTable`),
    * not in the parquet files — plain `spark.read.parquet` of the same
    * files would NOT know the layout; readers must go through
    * `spark.table`. `sortBy(key)` additionally pre-sorts each bucket file
    * so sort-merge joins skip their sort when files-per-bucket is 1
    * (`repartition(key)` before write gives exactly that). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      nBuckets: Int): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    df.repartition(nBuckets, col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, key).sortBy(key)
      .saveAsTable(table)
  }
}
