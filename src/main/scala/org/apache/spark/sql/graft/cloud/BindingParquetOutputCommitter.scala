package org.apache.spark.sql.graft.cloud

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{JobContext, JobStatus, TaskAttemptContext}
import org.apache.hadoop.mapreduce.lib.output.BindingPathOutputCommitter
import org.apache.parquet.hadoop.ParquetOutputCommitter
import org.apache.spark.internal.Logging

/** A [[ParquetOutputCommitter]] whose entire lifecycle is delegated to a
  * [[BindingPathOutputCommitter]], which in turn instantiates whatever
  * committer the Hadoop `mapreduce.outputcommitter.factory.*`
  * configuration selects (S3A magic committer, manifest committer, …).
  *
  * Needed because Spark's parquet path validates that the committer IS a
  * ParquetOutputCommitter when `parquet.enable.summary-metadata` is set —
  * this class satisfies the type while still committing through the
  * factory-selected implementation (capability of the reference's
  * internal/io/cloud/BindingParquetOutputCommitter.scala:40-125).
  *
  * Usage:
  * {{{
  * spark.conf.set("spark.sql.parquet.output.committer.class",
  *   "org.apache.spark.sql.graft.cloud.BindingParquetOutputCommitter")
  * }}}
  */
class BindingParquetOutputCommitter(path: Path, context: TaskAttemptContext)
  extends ParquetOutputCommitter(path, context) with Logging {

  private val delegate = new BindingPathOutputCommitter(path, context)

  override def getWorkPath: Path = delegate.getWorkPath

  override def setupJob(jobContext: JobContext): Unit = delegate.setupJob(jobContext)
  override def setupTask(taskContext: TaskAttemptContext): Unit =
    delegate.setupTask(taskContext)
  override def needsTaskCommit(taskContext: TaskAttemptContext): Boolean =
    delegate.needsTaskCommit(taskContext)
  override def commitTask(taskContext: TaskAttemptContext): Unit =
    delegate.commitTask(taskContext)
  override def abortTask(taskContext: TaskAttemptContext): Unit =
    delegate.abortTask(taskContext)
  override def commitJob(jobContext: JobContext): Unit = delegate.commitJob(jobContext)

  override def abortJob(jobContext: JobContext, state: JobStatus.State): Unit =
    try delegate.abortJob(jobContext, state)
    catch {
      // abort is best-effort cleanup; a failed abort must not mask the
      // original job failure
      case e: java.io.IOException => logWarning(s"abortJob failed: ${e.getMessage}")
    }

  override def isCommitJobRepeatable(jobContext: JobContext): Boolean =
    delegate.isCommitJobRepeatable(jobContext)
  override def isRecoverySupported: Boolean = delegate.isRecoverySupported
  override def recoverTask(taskContext: TaskAttemptContext): Unit =
    delegate.recoverTask(taskContext)
}
