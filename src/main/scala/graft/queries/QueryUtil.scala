package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the driver-facing query inventory. */
object QueryUtil {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** The events table's `ts` physical type varies across testdata
    * generations: TIMESTAMP(NANOS) (read as long via the legacy flag, floored
    * to µs — integer `DIV` because nanos exceed 2^53 and a double division
    * would corrupt low bits) or native µs timestamps (read as NTZ, cast to
    * the session type — sessions pin UTC, so the instant is preserved
    * verbatim). Both normalize to the same TIMESTAMP column, so every
    * downstream query and oracle is generation-agnostic. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/events.parquet")
    df.withColumn("ts", normalizeTs(df.schema("ts").dataType))
  }

  /** Normalization shared by the batch and streaming events readers
    * (`ts DIV 1000` is exact integer division — nano longs exceed 2^53,
    * so `/` through double would corrupt low bits). */
  def normalizeTs(stored: org.apache.spark.sql.types.DataType): Column =
    stored match {
      case org.apache.spark.sql.types.LongType => timestamp_micros(expr("ts DIV 1000"))
      case _                                   => col("ts").cast("timestamp")
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
