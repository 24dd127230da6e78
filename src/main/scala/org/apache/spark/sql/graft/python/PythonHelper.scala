package org.apache.spark.sql.graft.python

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.SparkUserAppException
import org.apache.spark.api.java.JavaSparkContext
import org.apache.spark.sql.SparkSession
import py4j.GatewayServer

import graft.util.PortUtils

/** Embeds Python execution in a running Scala SparkSession
  * (reference: python/PythonHelper.scala:42-134): write the code to a
  * temp .py, start an authenticated py4j [[GatewayServer]] exposing an
  * entry point with the live session, launch the interpreter with the
  * gateway coordinates in the environment, wait, fail on non-zero exit.
  *
  * The Python side connects back into the *same* JVM, so Spark jobs
  * submitted from Python run on the same (cluster-attached) context:
  *
  * {{{
  * from py4j.java_gateway import JavaGateway, GatewayParameters
  * gw = JavaGateway(gateway_parameters=GatewayParameters(
  *   port=int(os.environ["GRAFT_GATEWAY_PORT"]),
  *   auth_token=os.environ["GRAFT_GATEWAY_SECRET"], auto_convert=True))
  * entry = gw.entry_point            # SparkEntryPoint below
  * jdf = entry.sql("SELECT 1")       # runs on the JVM's SparkSession
  * }}}
  */
object PythonHelper {

  /** Exposed to Python as the py4j entry point. */
  class SparkEntryPoint(val session: SparkSession) {
    def sql(query: String): org.apache.spark.sql.DataFrame = session.sql(query)
    def getJavaSparkContext: JavaSparkContext =
      new JavaSparkContext(session.sparkContext)
    def version: String = session.version
  }

  /** Resolve py-files into PYTHONPATH entries. Loose `.py` files can't go
    * on PYTHONPATH directly (it expects directories/archives), so they
    * are copied into one temp directory which is added instead; zips,
    * eggs, and directories pass through as-is. Missing/unreadable
    * entries are skipped. (Reference: python/PythonHelper.scala:141-161.) */
  private[python] def resolvePyFiles(pyFiles: Seq[String]): Seq[String] = {
    lazy val dest = {
      val d = Files.createTempDirectory("graft_pyfiles_").toFile
      // dir registered BEFORE its children: deleteOnExit runs in reverse
      // registration order, so files are removed first, then the dir
      d.deleteOnExit()
      d
    }
    pyFiles.distinct.flatMap { pyFile =>
      if (pyFile.endsWith(".py")) {
        val source = new File(pyFile)
        if (source.isFile && source.canRead) {
          // all loose .py files share one directory, so with duplicate
          // basenames the LAST listed entry wins (REPLACE_EXISTING) —
          // unlike real PYTHONPATH precedence where the first wins; keep
          // basenames distinct for predictable imports
          val target = new File(dest, source.getName)
          Files.copy(source.toPath, target.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          target.deleteOnExit()
          Some(dest.getAbsolutePath)
        } else None
      } else Some(pyFile)
    }.distinct
  }

  def exec(session: SparkSession, pythonCode: String,
      pythonExec: String = "python3", pyFiles: Seq[String] = Nil): Unit = {
    val entryPoint = new SparkEntryPoint(session)
    // auth token must come from a CSPRNG — the gateway executes
    // arbitrary JVM calls for whoever presents it
    val secretBytes = new Array[Byte](32)
    new java.security.SecureRandom().nextBytes(secretBytes)
    val secret = java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(secretBytes)
    val codeFile = Files.createTempFile("graft_py_", ".py")
    Files.write(codeFile, pythonCode.getBytes(StandardCharsets.UTF_8))

    val server = new GatewayServer.GatewayServerBuilder()
      .entryPoint(entryPoint)
      .javaPort(0) // ephemeral
      .authToken(secret)
      .build()
    try {
      val port = PortUtils.startOnPort(
        { p => server.start(); server.getListeningPort },
        "graft-py4j-gateway", 0, 3)

      val pb = new ProcessBuilder((Seq(pythonExec, codeFile.toString)).asJava)
      val env = pb.environment()
      env.put("GRAFT_GATEWAY_PORT", port.toString)
      env.put("GRAFT_GATEWAY_SECRET", secret)
      // PYTHONPATH = user py-files, then spark's bundled python libs,
      // then whatever the environment already had
      val sparkPython = Some(new File("/opt/spark/python"))
        .filter(_.isDirectory).map(_.getAbsolutePath).toSeq
      val existing = Option(env.get("PYTHONPATH")).filter(_.nonEmpty).toSeq
      val pythonPath = (resolvePyFiles(pyFiles) ++ sparkPython ++ existing)
        .mkString(File.pathSeparator)
      if (pythonPath.nonEmpty) env.put("PYTHONPATH", pythonPath)
      pb.inheritIO()
      val process = pb.start()
      val exit = process.waitFor()
      if (exit != 0) throw SparkUserAppException(exit)
    } finally {
      server.shutdown()
      Files.deleteIfExists(codeFile)
    }
  }
}
