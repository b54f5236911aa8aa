package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  *
  * Crash safety: each batch directory rewrites through the
  * [[IncrementStore]] transaction protocol, adapted to an IN-PLACE
  * target (`_rw-<name>.tmp` + `_source.txt` manifest commit point →
  * delete original → rename tmp onto the original name).
  * [[IncrementStore.recoverStore]] rolls both tmp families forward/back,
  * and runs here before every listing — a crash mid-erasure leaves every
  * directory either original or fully rewritten, never half.
  *
  * Scale shape: `ids` is the takedown list — legal-process-sized, a
  * driver literal by contract. Only directories that actually HOLD a
  * removed row rewrite (one cheap filtered count decides per directory —
  * the takedownAudit dirty-bin discipline); untouched directories keep
  * their bytes, mtimes and downstream cache validity. */
object Erasure {

  /** Rewrite every `<prefix>*` child directory of `root` that holds a
    * row with `idCol` in `ids`, dropping those rows — in place, one
    * transaction per directory. Returns the number of directories
    * rewritten. Run with the owning gate STOPPED (the store is
    * maintenance-owned, the compaction contract). */
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
    var rewritten = 0
    dirs.foreach { d =>
      val df = spark.read.parquet(d.toString)
      require(df.columns.contains(idCol),
        s"forgetRows: $d has no column '$idCol' — wrong store?")
      if (df.filter(col(idCol).isin(ids: _*)).limit(1).count() > 0) {
        val tmp = new Path(rootPath, s"_rw-${d.getName}.tmp")
        if (fs.exists(tmp)) fs.delete(tmp, true)
        df.filter(!col(idCol).isin(ids: _*))
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
      stores: Seq[(String, String, String)]): DataFrame = {
    require(ids.nonEmpty, "erasureAudit: empty takedown list")
    require(stores.nonEmpty, "erasureAudit: no stores to audit")
    stores.map { case (name, path, idCol) =>
      IncrementStore.recoverStore(spark, path)
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
        df.agg(count(lit(1)).as("n_rows"),
            sum(when(col(idCol).isin(ids: _*), 1L).otherwise(0L))
              .as("n_residual"))
          .select(lit(name).as("store"), col("n_rows"),
            coalesce(col("n_residual"), lit(0L)).as("n_residual"))
      }
    }.reduce(_.unionByName(_))
  }
}
