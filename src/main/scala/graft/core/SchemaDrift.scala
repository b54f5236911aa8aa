package graft.core

import org.apache.spark.SparkException
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Schema-on-read over independently written shard files — the reference's
  * contract (parqueryd/worker.py:381-397, README.md:25-28): shard sets
  * drift over time (a column added by a new producer, an int widened to
  * long) and a query over the union must still answer.
  *
  * Strategy, in cost order:
  *  1. `mergeSchema=true` read — Spark merges footers DISTRIBUTED (one task
  *     wave), handles added/missing columns. This is the common case and
  *     costs only the footer pass.
  *  2. If merge throws `CANNOT_MERGE_SCHEMAS` (type drift: int32 vs int64),
  *     sweep per-path footer schemas on a bounded driver pool, widen them
  *     through the numeric lattice below, and re-read with one EXPLICIT
  *     widened schema — Spark 4's Parquet reader upcasts per file
  *     (int→long, int/long/float→double) and fills absent columns with
  *     null, so the result is STILL a single FileSourceScan: no per-shard
  *     DataFrame unions, no N-way plan blowup at 100k shards.
  *
  * Widening lattice (both engines' SQL semantics agree with it):
  * byte < short < int < long; float < double; any integral ⊔ any
  * fractional = double (never float — int32 doesn't fit float exactly).
  * Decimals widen to max integral digits + max scale. Equal types pass
  * through; anything else (string vs int) is real corruption and raises a
  * typed error naming the field.
  */
object SchemaDrift {

  final class SchemaDriftException(msg: String) extends IllegalArgumentException(msg)

  /** Read a drifting shard set as one DataFrame (single scan either path). */
  def readSharded(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "readSharded needs at least one path")
    try spark.read.option("mergeSchema", "true").parquet(paths: _*)
    catch {
      case e: SparkException if e.getMessage.contains("CANNOT_MERGE_SCHEMAS") =>
        spark.read.schema(widenedSchema(spark, paths)).parquet(paths: _*)
    }
  }

  /** Per-path footer schemas, swept on a bounded pool (footer-only reads;
    * this is the rare fallback path, and still O(paths) driver work — the
    * happy path merges footers in executors). */
  private def widenedSchema(spark: SparkSession, paths: Seq[String]): StructType = {
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration._
    // daemon pool + finite deadline: this fallback fires exactly when
    // storage is degraded, so one hung footer read must surface as an
    // error (and never pin the JVM via non-daemon threads), not wedge the
    // driver forever
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(32, paths.size),
      (r: Runnable) => { val t = new Thread(r, "graft-drift-footer"); t.setDaemon(true); t })
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // deadline SCALES with the sweep size (≥1 s per path, 10 min floor) and
    // is conf-overridable: a flat cap would reject an honest 100k-shard
    // sweep — the exact scenario this fallback exists for — while a hung
    // footer read must still surface as an error, not wedge the driver
    val deadline = spark.conf.getOption("graft.drift.footerSweepTimeoutSec")
      .map(_.toLong).getOrElse(math.max(600L, paths.size.toLong)).seconds
    try {
      val schemas = Await.result(
        Future.sequence(paths.map(p => Future(spark.read.parquet(p).schema))),
        deadline)
      schemas.reduce(widen)
    } catch {
      case _: java.util.concurrent.TimeoutException =>
        throw new SchemaDriftException(
          s"schema-drift footer sweep over ${paths.size} paths exceeded $deadline " +
            "(degraded storage?) — retry, raise graft.drift.footerSweepTimeoutSec, " +
            "or pass an explicit schema")
    } finally pool.shutdown()
  }

  /** Union of fields (first-seen order), types widened; all nullable —
    * a field absent from any shard is null there by contract. */
  private[graft] def widen(a: StructType, b: StructType): StructType = {
    val bByName = b.fields.map(f => f.name -> f).toMap
    val merged = a.fields.map { fa =>
      bByName.get(fa.name) match {
        case Some(fb) => StructField(fa.name, widenType(fa.name, fa.dataType, fb.dataType))
        case None     => fa.copy(nullable = true)
      }
    }
    val aNames = a.fieldNames.toSet
    val added = b.fields.filterNot(f => aNames(f.name)).map(_.copy(nullable = true))
    StructType(merged ++ added)
  }

  private[graft] def widenType(field: String, a: DataType, b: DataType): DataType = (a, b) match {
    case _ if a == b => a
    case (x, y) if integral(x) && integral(y) =>
      if (rank(x) >= rank(y)) x else y
    case (FloatType, DoubleType) | (DoubleType, FloatType) => DoubleType
    case (x, y) if (integral(x) && fractional(y)) || (fractional(x) && integral(y)) =>
      DoubleType // never float: int32 doesn't fit float exactly
    // date ⊔ timestamp = timestamp_ntz (midnight expansion): the common
    // producer drift when an upstream starts carrying time-of-day on a date
    // column. NTZ specifically — Spark's Parquet reader upcasts INT32 date
    // only to TimestampNTZ, never to LTZ, and an LTZ-written shard reads
    // under an NTZ target as its UTC wall clock (sessions here pin
    // session.timeZone=UTC, so instants are preserved verbatim).
    case (DateType, t) if timestampLike(t) => TimestampNTZType
    case (t, DateType) if timestampLike(t) => TimestampNTZType
    case (x: DecimalType, y: DecimalType) =>
      val intDigits = math.max(x.precision - x.scale, y.precision - y.scale)
      val scale = math.max(x.scale, y.scale)
      DecimalType(math.min(DecimalType.MAX_PRECISION, intDigits + scale), scale)
    case (x: ArrayType, y: ArrayType) =>
      ArrayType(widenType(field, x.elementType, y.elementType), containsNull = true)
    case (x: StructType, y: StructType) => widen(x, y)
    case _ =>
      throw new SchemaDriftException(
        s"shard schema conflict on field '$field': ${a.sql} vs ${b.sql} is not a widening")
  }

  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true; case _ => false
  }
  private def fractional(t: DataType): Boolean = t match {
    case FloatType | DoubleType => true; case _ => false
  }
  private def timestampLike(t: DataType): Boolean = t match {
    case TimestampType | TimestampNTZType => true; case _ => false
  }
  private def rank(t: DataType): Int = t match {
    case ByteType => 1; case ShortType => 2; case IntegerType => 3; case LongType => 4
    case _ => 0
  }
}
