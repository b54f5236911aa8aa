package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the driver-facing query inventory. */
object QueryUtil {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** The events table carries TIMESTAMP(NANOS) parquet, which Spark's
    * vectorized reader rejects by default. Read nanos as long, then floor to
    * microseconds — exactly what engines with µs timestamps (DuckDB included)
    * do when reading ns parquet, so oracle comparisons stay exact.
    * Integer `DIV` keeps the arithmetic exact (nanos exceed 2^53, so a double
    * division would corrupt low bits). */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Timestamp literal parsed in the SESSION timezone (UTC), not the JVM
    * default — `Timestamp.valueOf` would shift the boundary on non-UTC
    * hosts and diverge from the oracle. */
  def tsLit(v: String): Column = lit(v + " 00:00:00").cast("timestamp")

  /** Filter-term value for timestamp columns: a literal string, which Spark
    * casts to timestamp in the session timezone at comparison time. */
  def ts(v: String): String = v + " 00:00:00"

  /** Exact cents: 2-decimal money double → exact long. The testdata money
    * columns sit on a 2-decimal grid, so this is lossless; downstream sums
    * become exact integer math, bit-identical to the DuckDB oracle. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Exact revenue `sum(price * (1 - discount))` in integer 1e-4 units, then
    * one deterministic IEEE division — bit-identical across engines. */
  def revenue(price: Column, discount: Column): Column =
    (sum(cents(price) * (lit(100L) - cents(discount))).cast("double") / 10000.0)

  /** DuckDB-side fragment matching [[revenue]]. */
  def revenueSql(price: String, discount: String): String =
    s"""CAST(sum(CAST(round($price * 100) AS BIGINT)
       | * (100 - CAST(round($discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0""".stripMargin
}
