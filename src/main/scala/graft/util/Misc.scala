package graft.util

import java.nio.file.{Files, Path, Paths}
import java.time.format.DateTimeFormatter
import java.time.{ZoneOffset, ZonedDateTime}
import scala.jdk.CollectionConverters._
import scala.util.Random

/** Miscellaneous utilities mirroring the reference's util surface
  * (SURVEY §2.8 F3-F13): chunking, interleaving, constants-row
  * reflection, filesystem helpers, command runner, timestamped names. */
object Misc {

  /** Lazy fixed-size chunking of an iterator
    * (ref: oarphpy/util/misc.py:125-136 ichunked). */
  def ichunked[T](it: Iterator[T], n: Int): Iterator[Seq[T]] = {
    require(n > 0)
    it.grouped(n).map(_.toSeq)
  }

  /** Interleave iterators round-robin, skipping exhausted ones
    * (ref: oarphpy/util/misc.py:139-155 roundrobin). */
  def roundrobin[T](its: Iterator[T]*): Iterator[T] = new Iterator[T] {
    private val queue = scala.collection.mutable.Queue(its.filter(_.hasNext): _*)
    def hasNext: Boolean = queue.nonEmpty
    def next(): T = {
      val it = queue.dequeue()
      val v = it.next()
      if (it.hasNext) queue.enqueue(it)
      v
    }
  }

  /** Object → flat map of UPPERCASE constant fields, recursing into
    * nested objects with PARENT_CHILD name flattening
    * (ref: oarphpy/util/misc.py:158-191 as_row_of_constants). */
  def asRowOfConstants(obj: AnyRef, prefix: String = ""): Map[String, Any] = {
    val out = Map.newBuilder[String, Any]
    val cls = obj.getClass
    cls.getMethods
      .filter(m => m.getParameterCount == 0 &&
        m.getName.toUpperCase == m.getName &&
        m.getName.exists(_.isLetter) &&
        m.getDeclaringClass != classOf[Object])
      .foreach { m =>
        val name = if (prefix.isEmpty) m.getName else s"${prefix}_${m.getName}"
        m.invoke(obj) match {
          case v: String => out += name -> v
          case v: java.lang.Number => out += name -> v
          case v: java.lang.Boolean => out += name -> v
          case null => ()
          case nested: AnyRef =>
            out ++= asRowOfConstants(nested, name)
        }
      }
    out.result()
  }

  /** Deep in-memory size estimate — delegate to Spark's production
    * estimator (ref: oarphpy/util/misc.py:47-86 get_size_of_deep). */
  def getSizeOfDeep(obj: AnyRef): Long =
    org.apache.spark.util.SizeEstimator.estimate(obj)

  /** Sortable timestamp + random suffix for collision-free filenames
    * (ref: oarphpy/util/misc.py:194-207 fname_timestamp). */
  def fnameTimestamp(
      now: ZonedDateTime = ZonedDateTime.now(ZoneOffset.UTC)): String = {
    val ts = now.format(DateTimeFormatter.ofPattern("yyyy-MM-dd-HH_mm_ss"))
    val suffix = Random.alphanumeric.take(6).mkString
    s"$ts.$suffix"
  }

  // Filesystem helpers (ref: oarphpy/util/misc.py:416-472).
  def mkdirP(p: String): Unit = Files.createDirectories(Paths.get(p))
  def rmRf(p: String): Unit = {
    val path = Paths.get(p)
    if (Files.exists(path)) {
      Files.walk(path).iterator().asScala.toSeq.reverse
        .foreach(Files.delete)
    }
  }
  def cleanDir(p: String): Unit = { rmRf(p); mkdirP(p) }
  def allFilesRecursive(root: String): Seq[String] = {
    val path = Paths.get(root)
    if (!Files.exists(path)) Seq.empty
    else Files.walk(path).iterator().asScala
      .filter(Files.isRegularFile(_)).map(_.toString).toSeq
  }
  def missingOrEmpty(p: String): Boolean = {
    val path = Paths.get(p)
    !Files.exists(path) ||
      (Files.isRegularFile(path) && Files.size(path) == 0) ||
      (Files.isDirectory(path) && allFilesRecursive(p).isEmpty)
  }

  /** macOS resource-fork / Finder turds that pollute archive listings
    * (ref: oarphpy/util/misc.py:470-472). */
  def isStupidMacFile(p: String): Boolean = {
    val name = Paths.get(p).getFileName.toString
    name.startsWith("._") || name == ".DS_Store"
  }

  /** Copy the first `n` entries (sorted by name) of a zip into a new
    * zip — the reference's fixture-thinning helper (ref:
    * oarphpy/util/misc.py:416-427). */
  def copyNFromZip(src: String, dest: String, n: Int): Unit = {
    Option(Paths.get(dest).getParent).foreach(Files.createDirectories(_))
    val zin = new java.util.zip.ZipFile(src)
    try {
      val out = new java.util.zip.ZipOutputStream(
        Files.newOutputStream(Paths.get(dest)))
      try {
        zin.entries().asScala.toSeq
          .filterNot(_.isDirectory).sortBy(_.getName).take(n)
          .foreach { e =>
            out.putNextEntry(new java.util.zip.ZipEntry(e.getName))
            val in = zin.getInputStream(e)
            try in.transferTo(out) finally in.close()
            out.closeEntry()
          }
      } finally out.close()
    } finally zin.close()
  }

  /** Shell out with captured output (ref: oarphpy/util/misc.py:332-350).
    * A missing binary returns (127, message) rather than throwing, so
    * graceful-degradation callers (getGpuInfos on GPU-less hosts) work. */
  def runCmd(cmd: Seq[String]): (Int, String) = {
    import scala.sys.process._
    val out = new StringBuilder
    try {
      val code = cmd ! ProcessLogger(l => out.append(l).append('\n'),
        l => out.append(l).append('\n'))
      (code, out.toString)
    } catch {
      case e: java.io.IOException => (127, e.getMessage)
    }
  }

  /** nvidia-smi CSV → typed GPU rows (ref: oarphpy/util/misc.py:550-621
    * GPUInfo; parse kept separate from invocation for mock-fixture
    * testing as the reference does). */
  case class GpuInfo(index: Int, name: String, memTotalMb: Long,
      memUsedMb: Long, memFreeMb: Long)
  def parseGpuCsv(csv: String): Seq[GpuInfo] =
    csv.linesIterator.filter(_.trim.nonEmpty).map { line =>
      val f = line.split(",").map(_.trim.replaceAll("(?i) mib$", ""))
      GpuInfo(f(0).toInt, f(1), f(2).toLong, f(3).toLong, f(4).toLong)
    }.toSeq
  def getGpuInfos: Seq[GpuInfo] = {
    val (code, out) = runCmd(Seq("nvidia-smi",
      "--query-gpu=index,name,memory.total,memory.used,memory.free",
      "--format=csv,noheader"))
    if (code == 0) parseGpuCsv(out) else Seq.empty
  }
}
