package graft.util

import java.io.{File, FileOutputStream}
import java.net.URI
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.SparkSession
import graft.sources.ArchiveSource

/** Artifact shipping + cluster selftests + download.
  *
  * JVM analog of the reference's signature egg machinery
  * (ref: oarphpy/spark.py:472-791): resolve the jar that contains the
  * caller's code, attach it to the session fail-fast, and verify on
  * every executor that the class actually loads from the shipped
  * artifact (ref: test_egg, oarphpy/spark.py:269-314). Notebook-style
  * hot-reload (ref: NBSpark, oarphpy/spark.py:839-923) is a documented
  * NON-GOAL: JVM executors cannot safely reload classes — the Spark
  * Connect `addArtifact` session mechanism is the supported analog.
  */
object Artifacts {

  /** Locate the jar/classes dir a class was loaded from
    * (analog of the reference's caller-module resolution,
    * ref: oarphpy/spark.py:541-576). */
  def codeSourceOf(cls: Class[_]): Option[String] =
    Option(cls.getProtectionDomain.getCodeSource)
      .map(_.getLocation.toURI)
      .map(Paths.get(_).toString)

  /** Attach this library's jar to a running session (no-op when running
    * from a classes directory, e.g. sbt dev mode — already on the
    * driver/executor classpath in local mode). */
  def attachSelf(spark: SparkSession): Option[String] = {
    codeSourceOf(classOf[graft.codec.Tensor]).flatMap { path =>
      if (path.endsWith(".jar")) {
        spark.sparkContext.addJar(path)
        Some(path)
      } else None
    }
  }

  /** Selftest: assert `className` is loadable on every executor
    * (ref: oarphpy/spark.py:269-314 test_egg). Returns per-executor
    * classloader locations. */
  def selftestClassLoads(
      spark: SparkSession,
      className: String = "graft.codec.Tensor"): Seq[String] = {
    val results = ExecutorOps.forEachExecutor(spark) {
      val cls = Class.forName(className)
      Option(cls.getProtectionDomain.getCodeSource)
        .map(_.getLocation.toString).getOrElse("bootstrap")
    }
    require(results.nonEmpty, "no executors responded")
    results
  }

  /** Fetch a URI to a local file/dir, auto-extracting archives
    * (ref: oarphpy/util/misc.py:475-543 download). Zero-egress
    * environments: file:// URIs and local paths only; http(s) attempts
    * fail with the transport's own error. */
  def download(uri: String, destDir: String, tryExpand: Boolean = true): String = {
    Misc.mkdirP(destDir)
    val src = if (uri.contains("://")) Paths.get(new URI(uri)) else Paths.get(uri)
    val fname = src.getFileName.toString
    val dest = Paths.get(destDir, fname)
    Files.copy(src, dest, StandardCopyOption.REPLACE_EXISTING)
    val isArchive = Seq(".zip", ".tar", ".tar.gz", ".tgz").exists(fname.endsWith)
    if (tryExpand && isArchive) {
      val outDir = Paths.get(destDir, "extracted")
      Misc.mkdirP(outDir.toString)
      ArchiveSource.withArchive(dest.toString) { a =>
        a.entryNames.foreach { name =>
          val target = outDir.resolve(name)
          Files.createDirectories(target.getParent)
          val fos = new FileOutputStream(target.toFile)
          try fos.write(a.read(name)) finally fos.close()
        }
      }
      outDir.toString
    } else dest.toString
  }
}
