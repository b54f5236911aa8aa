package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.{FileSystem, Path}

/** Shared TRANSACTIONAL compaction for the parquet increment stores the
  * streaming layer accumulates (`inc=<batchId>` directories next to
  * non-numeric seeds — [[TextStream.evolvingGate]]'s MinHash index,
  * [[EmbedStream.evolvingGate]]'s (bucket, vec) index,
  * [[PreferenceStream.evolvingRank]]'s additive pair counts): merge every
  * increment STRICTLY below `upToBatchId` — numeric batch increments AND
  * prior `compact-<M>` seeds with M < upToBatchId (so successive
  * compactions collapse to one seed instead of accumulating an immortal
  * directory per invocation — the r16 ADVICE finding) — into one new
  * seed `inc=compact-<upToBatchId>`, then delete the merged originals.
  *
  * Crash safety is a tiny filesystem TRANSACTION, not an argument about
  * row semantics (kill-evidence rows tolerate duplication, additive
  * counts do NOT — one protocol must serve both):
  *
  *  1. the merged frame is written to `_compact-<upTo>.tmp` — invisible
  *     to readers, which list only `inc=`-prefixed directories;
  *  2. a `_sources.txt` manifest naming the merged directories lands
  *     INSIDE the tmp — this is the COMMIT POINT: a tmp without it is an
  *     uncommitted write whose sources are all intact;
  *  3. the sources are deleted, and the tmp RENAMES to its `inc=` tag.
  *
  * [[recover]] runs first on every call: a manifest-less tmp rolls BACK
  * (delete — its sources never moved); a manifested tmp rolls FORWARD
  * (delete any listed source still present, publish the rename). So a
  * crash anywhere leaves either the old increments or the compacted seed
  * readable — never both (no double count), never neither beyond the
  * repairable delete-vs-rename window the next call closes.
  *
  * Call with `upToBatchId` ≤ the checkpoint's last COMMITTED batch + 1
  * and monotonically nondecreasing across calls (the gates' own
  * contract: committed increments are immutable, and a replayed batch's
  * id is above the last committed so it never sees a compact seed that
  * contains itself). Run between triggers or with the query stopped —
  * the store is maintenance-owned, not trigger-owned. */
private[streaming] object IncrementStore {

  /** An increment FOLDED by a compaction up to `upTo`: a numeric batch
    * id strictly below it, or a prior compact seed strictly below it. */
  private def foldable(tag: String, upTo: Long): Boolean =
    tag.toLongOption.exists(_ < upTo) ||
      (tag.startsWith("compact-") &&
        tag.stripPrefix("compact-").toLongOption.exists(_ < upTo))

  /** Compact `dir` up to `upToBatchId`, merging with `merge` (identity
    * for kill-evidence indexes, a sum-groupBy for additive counts).
    * Returns the number of increments folded (0 = nothing to do). */
  def compact(spark: SparkSession, dir: String, upToBatchId: Long,
      merge: DataFrame => DataFrame): Int = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    recover(fs, root)
    val sources = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("inc="))
      .filter(s => foldable(s.getPath.getName.stripPrefix("inc="),
        upToBatchId))
      .map(_.getPath)
    if (sources.isEmpty) return 0
    val tmp = new Path(root, s"_compact-$upToBatchId.tmp")
    // any tmp surviving recover() is uncommitted leftover — roll back
    if (fs.exists(tmp)) fs.delete(tmp, true)
    merge(spark.read.parquet(sources.map(_.toString): _*))
      .write.mode("overwrite").parquet(tmp.toString)
    val mf = fs.create(new Path(tmp, "_sources.txt"), true)
    try mf.write(sources.map(_.getName).mkString("\n").getBytes("UTF-8"))
    finally mf.close()
    sources.foreach(p => fs.delete(p, true))
    val target = new Path(root, s"inc=compact-$upToBatchId")
    require(!fs.exists(target),
      s"compaction target $target already exists — upToBatchId must be " +
        "monotonically nondecreasing across calls")
    fs.rename(tmp, target)
    sources.size
  }

  /** Finish (roll forward) or undo (roll back) an interrupted
    * compaction transaction — see the object scaladoc's protocol. */
  private def recover(fs: FileSystem, root: Path): Unit =
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith("_compact-") &&
        s.getPath.getName.endsWith(".tmp"))
      .foreach { s =>
        val tmp = s.getPath
        val manifest = new Path(tmp, "_sources.txt")
        if (!fs.exists(manifest)) { fs.delete(tmp, true); () }
        else {
          val in = fs.open(manifest)
          val names =
            try scala.io.Source.fromInputStream(in, "UTF-8")
              .getLines().toList.filter(_.nonEmpty)
            finally in.close()
          names.foreach { n =>
            val p = new Path(root, n)
            if (fs.exists(p)) { fs.delete(p, true); () }
          }
          val tag = tmp.getName.stripPrefix("_compact-")
            .stripSuffix(".tmp")
          fs.rename(tmp, new Path(root, s"inc=compact-$tag"))
          ()
        }
      }
}
