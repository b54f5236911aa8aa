package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Takedown EXECUTION across the gates' on-disk stores — the piece that
  * completes the governance loop the repo built up over r17/r18:
  * [[TakedownStream]] BILLS the blast radius,
  * [[graft.ops.Chunking.repackDirty]] REBUILDS the dirty training
  * windows, [[TextStream.forgetDocs]]/[[EmbedStream.forgetDocs]]/
  * [[MediaStream.forgetDocs]] erase the DERIVED index evidence — but the
  * gates' ADMITTED outputs (`admittedDir/batch=<id>` parquet, the rows a
  * training pipeline actually reads) still held the removed documents.
  * [[forgetRows]] rewrites them in place, and [[erasureAudit]] certifies
  * the result: one row per store with its residual count — the erasure
  * certificate a data-protection officer files next to the request.
  * [[Governance.execute]] sequences the whole loop from one registry.
  *
  * Crash safety: each batch directory rewrites through the
  * [[IncrementStore]] transaction protocol, adapted to an IN-PLACE
  * target (`_rw-<name>.tmp` + `_source.txt` manifest commit point →
  * delete original → rename tmp onto the original name).
  * [[IncrementStore.recoverStore]] rolls both tmp families forward/back,
  * and runs here before every listing — a crash mid-erasure leaves every
  * directory either original or fully rewritten, never half.
  *
  * Unattributable rows: a row whose id is NULL cannot be matched to any
  * takedown id, so the rewrite KEEPS it (the gates' pass-through
  * principle — the r18 ADVICE found the old `!isin` filter silently
  * deleting null-id rows, destroying rows it could not attribute), and
  * the dirty-directory detection never counts it.
  *
  * Scale shape: `ids` is the takedown list — legal-process-sized by
  * contract, but a DSAR batch can reach 10⁵, so every membership test
  * switches from literal `isin` to a broadcast join past
  * [[broadcastIdThreshold]] (identical semantics, pinned by spec). The
  * dirty-directory set is computed in ONE job over the whole store
  * (`input_file_name()` carries the directory), not one probe job per
  * directory (the r18 verdict finding: a long-lived gate holds thousands
  * of `batch=` dirs, and 2·B serial driver jobs per takedown is a
  * job-count scale killer even when zero dirs are dirty); only dirty
  * directories then rewrite, untouched directories keep their bytes,
  * mtimes and downstream cache validity. */
object Erasure {

  /** Above this many takedown ids, membership tests run as a broadcast
    * join on a distinct id frame instead of an `isin` literal list — an
    * In-expression with 10⁵ literals bloats the plan and evaluates
    * linearly per row. Below it, the literal list wins (no join, stays
    * inside whole-stage codegen). Results are identical across the
    * switch (spec-pinned). */
  val broadcastIdThreshold: Int = 1000

  /** Drop the rows of `df` whose `idc` is in `ids`; rows with NULL `idc`
    * are KEPT (unattributable — pass-through). Literal filter below the
    * threshold, broadcast LEFT ANTI join above it (null ids never match
    * a join key, so the anti join keeps them for free). */
  private[streaming] def dropIds(df: DataFrame, idc: Column,
      ids: Seq[Long]): DataFrame = {
    val distinctIds = ids.distinct
    if (distinctIds.size <= broadcastIdThreshold)
      df.filter(idc.isNull || !idc.isin(distinctIds: _*))
    else {
      import df.sparkSession.implicits._
      df.join(broadcast(distinctIds.toDF("__rid")),
        idc === col("__rid"), "left_anti")
    }
  }

  /** TRUE iff `idc` holds one of `ids` — NULL-safe (null → false), used
    * where the membership must be a Column (aggregations). For the
    * large-list regime callers join instead ([[residualOf]]). */
  private def isRemoved(idc: Column, ids: Seq[Long]): Column =
    coalesce(idc.isin(ids.distinct: _*), lit(false))

  /** `df` plus a boolean `__rm` column marking rows whose `idc` is in
    * `ids` (NULL id → false) — the takedown flag
    * [[graft.ops.Chunking.repackDirty]] consumes. Literal membership
    * below the threshold, broadcast left join above it. */
  private[streaming] def removedFlagged(df: DataFrame, idc: Column,
      ids: Seq[Long]): DataFrame = {
    val distinctIds = ids.distinct
    if (distinctIds.size <= broadcastIdThreshold)
      df.withColumn("__rm", isRemoved(idc, distinctIds))
    else {
      import df.sparkSession.implicits._
      df.join(broadcast(distinctIds.toDF("__rid")),
          idc === col("__rid"), "left")
        .withColumn("__rm", col("__rid").isNotNull)
        .drop("__rid")
    }
  }

  /** One certificate row for an arbitrary store FRAME:
    * `(store, n_rows, n_residual)` where `n_residual` counts rows still
    * carrying a removed id. The building block [[erasureAudit]] and
    * [[Governance.execute]] compose — path-shaped stores read
    * recursively, manifest-published tables read through their pointer,
    * both land here. Broadcast-join regime above the threshold. */
  def residualOf(name: String, df: DataFrame, idc: Column,
      ids: Seq[Long]): DataFrame = {
    val distinctIds = ids.distinct
    val counted =
      if (distinctIds.size <= broadcastIdThreshold)
        df.agg(count(lit(1)).as("n_rows"),
          sum(when(isRemoved(idc, distinctIds), 1L).otherwise(0L))
            .as("n_residual"))
      else {
        import df.sparkSession.implicits._
        df.join(broadcast(distinctIds.toDF("__rid")),
            idc === col("__rid"), "left")
          .agg(count(lit(1)).as("n_rows"),
            sum(when(col("__rid").isNotNull, 1L).otherwise(0L))
              .as("n_residual"))
      }
    counted.select(lit(name).as("store"), col("n_rows"),
      coalesce(col("n_residual"), lit(0L)).as("n_residual"))
  }

  /** Rewrite every `<prefix>*` child directory of `root` that holds a
    * row with `idCol` in `ids`, dropping those rows — in place, one
    * transaction per directory. NULL-id rows are kept and never mark a
    * directory dirty. Returns the number of directories rewritten. Run
    * with the owning gate STOPPED (the store is maintenance-owned, the
    * compaction contract). The store's schema is uniform by that same
    * contract (one gate writes every batch); a store with NO `idCol`
    * anywhere raises, and each dirty directory's own read re-checks the
    * column before its rewrite. */
  def forgetRows(spark: SparkSession, root: String, idCol: String,
      ids: Seq[Long], prefix: String = "batch="): Int = {
    require(ids.nonEmpty, "forgetRows: empty takedown list")
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return 0
    IncrementStore.recoverStore(spark, root)
    val dirs = fs.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .map(_.getPath)
    if (dirs.isEmpty) return 0
    // ONE job over the whole store computes the dirty-directory set:
    // every row carries its containing directory via input_file_name()
    // (the path segment above the file), removed rows group to their
    // dirs, and the result is takedown-sized — never one probe job per
    // directory (the r18 verdict finding).
    val all = spark.read.parquet(dirs.map(_.toString): _*)
    require(all.columns.contains(idCol),
      s"forgetRows: $root has no column '$idCol' — wrong store?")
    val dirOf = element_at(split(input_file_name(), "/"), -2)
    val removedDirs = {
      val rows = all.select(dirOf.as("__dir"), col(idCol).as("__id"))
      val matched =
        if (ids.distinct.size <= broadcastIdThreshold)
          rows.filter(isRemoved(col("__id"), ids))
        else {
          import spark.implicits._
          rows.join(broadcast(ids.distinct.toDF("__rid")),
            col("__id") === col("__rid"), "left_semi")
        }
      matched.select("__dir").distinct().collect().map(_.getString(0)).toSet
    }
    var rewritten = 0
    dirs.filter(d => removedDirs.contains(d.getName)).foreach { d =>
      val df = spark.read.parquet(d.toString)
      require(df.columns.contains(idCol),
        s"forgetRows: $d has no column '$idCol' — wrong store?")
      val tmp = new Path(rootPath, s"_rw-${d.getName}.tmp")
      if (fs.exists(tmp)) fs.delete(tmp, true)
      dropIds(df, col(idCol), ids)
        .write.mode("overwrite").parquet(tmp.toString)
      // manifest = COMMIT POINT (the IncrementStore protocol): a tmp
      // without it is an uncommitted write whose source is intact
      val mf = fs.create(new Path(tmp, "_source.txt"), true)
      try mf.write(d.getName.getBytes("UTF-8")) finally mf.close()
      require(fs.delete(d, true),
        s"forgetRows: failed to delete $d — aborting before the " +
          "rename (recovery would roll the manifested tmp forward)")
      require(fs.rename(tmp, d),
        s"forgetRows: rename $tmp -> $d failed — the manifested tmp " +
          "is the only copy; the next listing's recover() publishes it")
      rewritten += 1
    }
    rewritten
  }

  /** The ERASURE CERTIFICATE: for each (store, path, idCol), the total
    * row count and the residual count of rows still carrying a removed
    * id — all zeros in the `n_residual` column is the filed evidence
    * that the request executed across every store (admitted outputs,
    * index increments, anything parquet-shaped). Missing/empty stores
    * report (0, 0) rather than erroring — a store legitimately absent
    * on this deployment must not block the certificate. Recovery runs
    * per store first, so a crashed rewrite is published before it is
    * audited. */
  def erasureAudit(spark: SparkSession, ids: Seq[Long],
      stores: Seq[(String, String, String)],
      recover: Boolean = true): DataFrame = {
    require(ids.nonEmpty, "erasureAudit: empty takedown list")
    require(stores.nonEmpty, "erasureAudit: no stores to audit")
    stores.map { case (name, path, idCol) =>
      // `recover = false` is for callers that already ran recoverStore
      // serially over the whole registry (Governance.audit): recovery
      // MUTATES the store dir (deletes folded sources, renames .tmp), so
      // it must never run concurrently from fan-out futures.
      if (recover) IncrementStore.recoverStore(spark, path)
      val p = new Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val hasData = fs.exists(p) && fs.listStatus(p).nonEmpty
      if (!hasData)
        spark.range(1).select(lit(name).as("store"),
          lit(0L).as("n_rows"), lit(0L).as("n_residual"))
      else {
        // recursive: the stores are directories of batch=/inc= children
        val df = spark.read
          .option("recursiveFileLookup", "true").parquet(path)
        residualOf(name, df, col(idCol), ids)
      }
    }.reduce(_.unionByName(_))
  }
}
