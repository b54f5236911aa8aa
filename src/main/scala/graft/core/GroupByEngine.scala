package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's single analytical verb, Spark-first.
  *
  * Reference shape (parqueryd/controller.py:599-646 scatter,
  * parqueryd/worker.py:367-408 per-shard kernel,
  * parqueryd/controller.py:277-294 concat-gather):
  *
  * {{{
  * groupby(filenames, groupby_col_list, agg_list, where_terms_list, aggregate)
  * }}}
  *
  * Here the whole scatter/gather topology collapses into one declarative plan:
  * `spark.read.parquet(shards).where(filter).groupBy(keys).agg(aggs)`.
  * Spark's FileSourceScanExec is the scatter (one task per split, with
  * locality), partial HashAggregateExec is the per-shard kernel, the shuffle
  * is the gather, and final HashAggregateExec is the merge the reference
  * pushes onto its caller.
  *
  * Scale notes (100 TB):
  *  - filter + projection reach the Parquet scan (PushedFilters/ReadSchema),
  *    so row-group and page pruning happen before any bytes are decoded;
  *  - aggregation is map-side partial → shuffle only carries one row per
  *    (partition, group), not raw data;
  *  - missing-file tolerance uses one batched listing per parent directory,
  *    not a per-file RPC, so pruning 100k shards costs O(dirs) namenode/S3
  *    LIST calls, not O(files).
  */
object GroupByEngine {

  /** Missing shards are silently dropped; an all-missing query yields None —
    * the reference's empty-result protocol (parqueryd/controller.py:617-622,
    * RELEASE_NOTES.rst:64-65, rpc.py:151-153). Shard schemas may drift
    * (schema-on-read, parqueryd/worker.py:381-397): added columns read as
    * null where absent, and int-width drift widens — see
    * [[SchemaDrift.readSharded]]. */
  def groupby(
      spark: SparkSession,
      filenames: Seq[String],
      keys: Seq[String],
      aggs: Seq[AggSpec],
      where: Seq[FilterTerm] = Nil,
      aggregate: Boolean = true,
      combine: CombineMode = CombineMode.Merged): Option[DataFrame] = {
    val existing = pruneMissing(spark, filenames)
    if (existing.isEmpty) None
    else Some(groupbyDf(SchemaDrift.readSharded(spark, existing), keys, aggs, where, aggregate, combine))
  }

  /** Same semantics over an already-loaded DataFrame (e.g. a registered
    * table, a stream, or a derived view). */
  def groupbyDf(
      df: DataFrame,
      keys: Seq[String],
      aggs: Seq[AggSpec],
      where: Seq[FilterTerm] = Nil,
      aggregate: Boolean = true,
      combine: CombineMode = CombineMode.Merged): DataFrame = {
    val filtered = Translator.filterColumn(where).map(df.filter).getOrElse(df)
    if (!aggregate) {
      // aggregate=false: scan→filter→project passthrough, no grouping
      // (reference flag at parqueryd/worker.py:385; full-file call path
      // rpc.py:173). Only the named columns are materialized — Catalyst
      // prunes the scan schema to exactly this projection.
      val cols = (keys ++ aggs.map(_.input)).distinct
      filtered.select(cols.map(col): _*)
    } else {
      require(aggs.nonEmpty, "agg_list must be non-empty when aggregate=true")
      val aggCols = Translator.aggColumns(aggs)
      combine match {
        case CombineMode.Merged =>
          filtered
            .groupBy(keys.map(col): _*)
            .agg(aggCols.head, aggCols.tail: _*)
        case CombineMode.Concat =>
          // Reference fidelity: per-shard aggregates, concatenated, shard
          // column dropped — duplicate keys across shards survive
          // (pa.concat_tables, parqueryd/controller.py:294).
          val shard = "__graft_shard"
          filtered
            .withColumn(shard, input_file_name())
            .groupBy((shard +: keys).map(col): _*)
            .agg(aggCols.head, aggCols.tail: _*)
            .drop(shard)
      }
    }
  }

  /** Concat-mode fidelity over an explicit shard expression (for tables that
    * are one physical file but logically sharded, and for tests). */
  def groupbyDfSharded(
      df: DataFrame,
      shardExpr: org.apache.spark.sql.Column,
      keys: Seq[String],
      aggs: Seq[AggSpec],
      where: Seq[FilterTerm] = Nil): DataFrame = {
    val filtered = Translator.filterColumn(where).map(df.filter).getOrElse(df)
    val aggCols = Translator.aggColumns(aggs)
    val shard = "__graft_shard"
    filtered
      .withColumn(shard, shardExpr)
      .groupBy((shard +: keys).map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
      .drop(shard)
  }

  /** Batched existence check: one FileSystem.listStatus per distinct parent
    * directory instead of one exists() RPC per file. At reference scale the
    * "catalog" is just the file list (files_map, parqueryd/controller.py:107);
    * at 100 TB the listing is the only driver-side O(files) step, so keep it
    * to bulk LIST calls. */
  private[graft] def pruneMissing(spark: SparkSession, filenames: Seq[String]): Seq[String] = {
    if (filenames.isEmpty) return Nil
    val conf = spark.sparkContext.hadoopConfiguration
    val byDir = filenames.distinct.groupBy(f => new Path(f).getParent)
    val present = byDir.iterator.flatMap { case (dir, files) =>
      val fs = dir.getFileSystem(conf)
      val listed: Set[String] =
        try fs.listStatus(dir).iterator.map(_.getPath.getName).toSet
        catch { case _: java.io.FileNotFoundException => Set.empty[String] }
      files.filter(f => listed.contains(new Path(f).getName))
    }.toSet
    filenames.filter(present.contains) // preserve caller order
  }
}
