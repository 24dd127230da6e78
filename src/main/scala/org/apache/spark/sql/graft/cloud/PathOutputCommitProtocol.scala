package org.apache.spark.sql.graft.cloud

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{JobContext, TaskAttemptContext}
import org.apache.hadoop.mapreduce.lib.output.{FileOutputCommitter, FileOutputFormat, PathOutputCommitter, PathOutputCommitterFactory}
import org.apache.spark.internal.io.{FileNameSpec, HadoopMapReduceCommitProtocol}

/** Commit protocol for object stores without atomic rename: committer
  * selection is delegated to Hadoop's [[PathOutputCommitterFactory]]
  * (e.g. the S3A magic committer or manifest committer configured via
  * `mapreduce.outputcommitter.factory.scheme.s3a=…`), instead of the
  * rename-based FileOutputCommitter whose job-commit is O(data) on S3.
  *
  * Capability port of the reference's cloud committers
  * (reference: internal/io/cloud/PathOutputCommitProtocol.scala:53-146,
  * itself derived from apache/spark hadoop-cloud). Differences: Spark 4
  * signature, and dynamic-partition-overwrite is refused up-front — path
  * committers can't do the staged-rename dance it requires.
  *
  * Usage:
  * {{{
  * spark.conf.set("spark.sql.sources.commitProtocolClass",
  *   "org.apache.spark.sql.graft.cloud.PathOutputCommitProtocol")
  * }}}
  */
class PathOutputCommitProtocol(
    jobId: String,
    dest: String,
    dynamicPartitionOverwrite: Boolean = false)
  extends HadoopMapReduceCommitProtocol(jobId, dest, dynamicPartitionOverwrite)
  with Serializable {

  if (dynamicPartitionOverwrite) {
    throw new java.io.IOException(
      "PathOutputCommitProtocol does not support dynamic partition overwrite")
  }

  @transient private var committer: PathOutputCommitter = _

  override protected def setupCommitter(context: TaskAttemptContext): PathOutputCommitter = {
    val output = new Path(dest)
    val factory = PathOutputCommitterFactory.getCommitterFactory(
      output, context.getConfiguration)
    committer = factory.createOutputCommitter(output, context)
    // Safety valve (reference :94-118): on a misconfigured bucket the
    // factory silently hands back the rename-based FileOutputCommitter,
    // whose job commit is O(data) on object stores — the exact failure
    // this protocol exists to prevent. With the reject flag set, fail
    // fast instead of committing slowly.
    val rejectFileOutput = context.getConfiguration.getBoolean(
      PathOutputCommitProtocol.RejectFileOutput,
      PathOutputCommitProtocol.RejectFileOutputDefault)
    committer match {
      case f: FileOutputCommitter =>
        if (rejectFileOutput) {
          throw new java.io.IOException(
            s"Committer for '$dest' resolved to rename-based ${f.getClass.getName} " +
              s"but ${PathOutputCommitProtocol.RejectFileOutput}=true — configure a " +
              "path committer factory (e.g. mapreduce.outputcommitter.factory.scheme.<fs>)")
        }
        if (f.isCommitJobRepeatable(context)) {
          // v2 algorithm: repeatable job commit == not tolerant of task
          // commit failure; surface it rather than fail silently later
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"Committer $f has repeatable job commit (v2 algorithm) — " +
              "not safe against task-commit failures")
        }
      case _ =>
    }
    committer
  }

  override def newTaskTempFile(
      taskContext: TaskAttemptContext,
      dir: Option[String],
      spec: FileNameSpec): String = {
    val filename = getFilename(taskContext, spec)
    val parent = Option(committer)
      .map(c => c.getWorkPath)
      .filter(_ != null)
      .getOrElse(FileOutputFormat.getOutputPath(
        taskContext.asInstanceOf[JobContext]))
    val file = dir.map(d => new Path(new Path(parent, d), filename))
      .getOrElse(new Path(parent, filename))
    file.toString
  }

  override protected def getFilename(taskContext: TaskAttemptContext,
      spec: FileNameSpec): String = {
    val split = taskContext.getTaskAttemptID.getTaskID.getId
    f"${spec.prefix}part-$split%05d-$jobId${spec.suffix}"
  }

  override def commitJob(jobContext: JobContext,
      taskCommits: Seq[org.apache.spark.internal.io.FileCommitProtocol.TaskCommitMessage])
      : Unit = {
    super.commitJob(jobContext, taskCommits)
    PathOutputCommitProtocol.jobsCommitted.incrementAndGet()
  }
}

object PathOutputCommitProtocol {
  /** Hadoop conf flag: refuse to run with a rename-based
    * FileOutputCommitter (catch committer-binding misconfiguration
    * early instead of discovering it in an O(data) job commit). */
  val RejectFileOutput = "pathoutputcommit.reject.fileoutput"
  val RejectFileOutputDefault = false

  /** Process-wide count of job commits completed through this protocol.
    * Pure observability: lets the write-path gate
    * (`t_pack_write_commit`) ASSERT its write really committed here
    * rather than through a silently-defaulted protocol. */
  val jobsCommitted = new java.util.concurrent.atomic.AtomicLong(0)
}
