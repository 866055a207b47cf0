package graft.util

import java.util.UUID
import org.apache.spark.sql.SparkSession

/** Cluster-wide code execution + per-executor introspection.
  *
  * Capabilities from the reference's executor utilities:
  *   - `runCallables` (ref: oarphpy/spark.py:126-146): run arbitrary
  *     serializable thunks cluster-wide, one per task slice.
  *   - `forEachExecutor` (ref: oarphpy/spark.py:88-113): run a thunk
  *     at-most-once per executor JVM, dedup by a per-JVM lazy uuid.
  *   - `clusterCpuCount` (ref: oarphpy/spark.py:116-123),
  *     `clusterGetInfo` (ref: oarphpy/spark.py:218-243).
  *   - Monte-Carlo π self-test (ref: oarphpy/spark.py:246-260).
  */
object ExecutorOps {

  /** Per-JVM lazy value: computed once per executor process
    * (the reference's LazyFunc-per-process pattern, oarphpy/spark.py:88-99). */
  object PerJvm {
    lazy val uuid: String = UUID.randomUUID().toString
  }

  def runCallables[T: scala.reflect.ClassTag](
      spark: SparkSession, thunks: Seq[() => T],
      parallel: Int = -1): Seq[T] = {
    val sc = spark.sparkContext
    val n = if (parallel > 0) parallel else thunks.size
    sc.parallelize(thunks, math.max(1, n)).map(f => f()).collect().toSeq
  }

  /** Run `thunk` on every executor JVM at most once; returns one result
    * per distinct JVM. Oversubscribes tasks (4× defaultParallelism) so
    * every executor gets at least one task with high probability. */
  def forEachExecutor[T](spark: SparkSession)(thunk: => T): Seq[T] = {
    val sc = spark.sparkContext
    val slices = math.max(1, sc.defaultParallelism * 4)
    val fn = () => thunk // capture once; must be serializable
    sc.parallelize(1 to slices, slices)
      .map(_ => (PerJvm.uuid, fn()))
      .collect()
      .groupBy(_._1).map(_._2.head._2).toSeq
  }

  def clusterCpuCount(spark: SparkSession): Int =
    forEachExecutor(spark)(Runtime.getRuntime.availableProcessors()).sum

  case class SysInfo(
      hostname: String, cpus: Int, maxMemBytes: Long,
      javaVersion: String, sparkVersion: String)

  def clusterGetInfo(spark: SparkSession): Seq[SysInfo] = {
    val ver = spark.version
    forEachExecutor(spark) {
      SysInfo(
        java.net.InetAddress.getLocalHost.getHostName,
        Runtime.getRuntime.availableProcessors(),
        Runtime.getRuntime.maxMemory(),
        System.getProperty("java.version"),
        ver)
    }
  }

  /** Monte-Carlo π cluster self-test (ref: oarphpy/spark.py:246-260):
    * draws `n` uniform points, asserts |π̂ − 3.14| < 0.1. */
  def testPi(spark: SparkSession, n: Int = 1000000): Double = {
    val sc = spark.sparkContext
    val slices = math.max(2, sc.defaultParallelism)
    val inside = sc.parallelize(1 to n, slices).mapPartitionsWithIndex {
      (i, it) =>
        val rng = new java.util.Random(1337L + i)
        Iterator.single(it.count { _ =>
          val x = rng.nextDouble() * 2 - 1; val y = rng.nextDouble() * 2 - 1
          x * x + y * y <= 1
        }.toLong)
    }.sum()
    val piEst = 4.0 * inside / n
    require(math.abs(piEst - 3.14) < 0.1, s"pi estimate off: $piEst")
    piEst
  }
}
