package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation, PartitioningAwareFileIndex}

/** Shared plumbing for the session-scoped DataFrame memos
  * ([[graft.queries.VectorQueries]]' walk memo, [[TextAnalysis]]' n-gram
  * count-table memo): canonicalized-plan keys alone leave a staleness
  * window — the SAME path rewritten in place canonicalizes equal — so memo
  * keys fold in a fingerprint of the underlying FILES. */
object SessionMemo {

  /** File-level fingerprint of every file-sourced relation in the plan:
    * sorted `(path, length, modificationTime)` triples. A rewrite of the
    * same directory changes lengths/mtimes (and usually the part-file
    * names), so a memo keyed on this is invalidated instead of serving the
    * stale result. Plan-time metadata only (the listing Spark already
    * holds) — no filesystem I/O beyond what planning did. */
  def fileFingerprint(df: DataFrame): Seq[(String, Long, Long)] =
    df.queryExecution.analyzed.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location match {
          case p: PartitioningAwareFileIndex =>
            p.allFiles().map(f =>
              (f.getPath.toString, f.getLen, f.getModificationTime))
          case other =>
            other.inputFiles.toSeq.map(path => (path, -1L, -1L))
        }
        case _ => Seq.empty[(String, Long, Long)]
      }
    }.flatten.sorted
}
