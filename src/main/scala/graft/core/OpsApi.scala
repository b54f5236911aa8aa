package graft.core

import org.apache.spark.sql.SparkSession

/** Cluster-ops verb surface (reference §2.11) on Spark-native status APIs.
  * The reference's controller answers these from in-memory registries fed by
  * worker heartbeats (parqueryd/controller.py:511-512,683-701); here the
  * Spark scheduler already tracks all of it.
  *
  * Deliberate omissions (documented deviations, SURVEY.md §7.4):
  * `execute_code` / `readfile` are arbitrary-remote-code/file-read verbs the
  * reference itself flags as security holes (README.md:119-125) — not
  * reproduced.
  */
object OpsApi {

  /** Liveness probe (reference: controller.py:496-497). */
  def ping(spark: SparkSession): String =
    if (!spark.sparkContext.isStopped) "pong" else "stopped"

  final case class ClusterInfo(
      appId: String,
      appName: String,
      master: String,
      uptimeMs: Long,
      defaultParallelism: Int,
      activeJobs: Int,
      executors: Map[String, (Long, Long)]) // id -> (maxMem, remainingMem)

  /** Cluster snapshot (reference `info` verb: controller.py:683-701). */
  def info(spark: SparkSession): ClusterInfo = {
    val sc = spark.sparkContext
    ClusterInfo(
      appId = sc.applicationId,
      appName = sc.appName,
      master = sc.master,
      uptimeMs = System.currentTimeMillis() - sc.startTime,
      defaultParallelism = sc.defaultParallelism,
      activeJobs = sc.statusTracker.getActiveJobIds().length,
      executors = sc.getExecutorMemoryStatus.map { case (k, v) => k -> v }.toMap)
  }

  /** Broadcast log level (reference `loglevel` verb: controller.py:498-510). */
  def logLevel(spark: SparkSession, level: String): Unit =
    spark.sparkContext.setLogLevel(level.toUpperCase)

  /** Cancel a running query group (reference `delete_download`/kill verbs). */
  def cancelJobGroup(spark: SparkSession, group: String): Unit =
    spark.sparkContext.cancelJobGroup(group)

  /** Shutdown (reference `kill`/`killall`: controller.py:513-518,648-681). */
  def shutdown(spark: SparkSession): Unit = spark.stop()
}
