package org.apache.spark.sql.graft.cloud

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{JobContext, TaskAttemptContext}
import org.apache.hadoop.mapreduce.lib.output.{FileOutputFormat, PathOutputCommitter, PathOutputCommitterFactory}
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
}
