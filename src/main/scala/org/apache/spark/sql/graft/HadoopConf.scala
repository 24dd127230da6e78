package org.apache.spark.sql.graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.SparkConf
import org.apache.spark.deploy.SparkHadoopUtil

/** Builds a Hadoop [[Configuration]] from a plain property map, applying
  * Spark's own conf-translation rules (`spark.hadoop.*` prefix handling,
  * credential propagation) via the Spark-private [[SparkHadoopUtil]]
  * (reference: util/PrivateAccessor.scala:24-28). */
object HadoopConf {
  def fromProperties(properties: Map[String, String]): Configuration = {
    val sparkConf = new SparkConf(loadDefaults = false)
    properties.foreach { case (k, v) => sparkConf.set(s"spark.hadoop.$k", v) }
    SparkHadoopUtil.get.newConfiguration(sparkConf)
  }
}
