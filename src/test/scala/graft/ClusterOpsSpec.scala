package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.util.{ExecutorOps, CounterCollection}

class ClusterOpsSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  test("runCallables executes thunks cluster-wide") {
    val thunks: Seq[() => Int] = (1 to 8).map(i => () => i * i)
    val got = ExecutorOps.runCallables(spark, thunks).sorted
    assert(got == (1 to 8).map(i => i * i))
  }

  test("forEachExecutor runs at most once per JVM (local: exactly one)") {
    val got = ExecutorOps.forEachExecutor(spark)("probe")
    assert(got == Seq("probe")) // local mode = single JVM
  }

  test("clusterCpuCount sums executor cpus") {
    assert(ExecutorOps.clusterCpuCount(spark) ==
      Runtime.getRuntime.availableProcessors())
  }

  test("clusterGetInfo reports executor system info") {
    val infos = ExecutorOps.clusterGetInfo(spark)
    assert(infos.nonEmpty)
    assert(infos.head.cpus > 0 && infos.head.maxMemBytes > 0)
    assert(infos.head.sparkVersion == spark.version)
  }

  test("Monte-Carlo pi self-test within reference tolerance") {
    val pi = ExecutorOps.testPi(spark, 1000000)
    assert(math.abs(pi - 3.14) < 0.1) // ref: oarphpy/spark.py:252-260
  }

  test("CounterCollection tallies from executors, kv namespacing") {
    import spark.implicits._
    val counters = new CounterCollection(spark, "test-counters")
    (1 to 100).toDF("v").as[Int].foreach { v =>
      counters.tally("rows")
      counters.kvTally("parity", if (v % 2 == 0) "even" else "odd")
    }
    assert(counters.counters("rows") == 100L)
    val kv = counters.kvCounters("parity")
    assert(kv("even") == 50L && kv("odd") == 50L)
    assert(!counters.counters.contains("__graft_kv.parity.even"))
    assert(counters.toString.contains("rows"))
  }

  test("CounterCollection.logProgress logs periodically and at exit") {
    val counters = new CounterCollection(spark, "progress-counters")
    val lines = scala.collection.mutable.ListBuffer[String]()
    val r = counters.logProgress(freqSec = 1, log = s =>
      lines.synchronized { lines += s }) {
      counters.tally("work", 7)
      Thread.sleep(1500) // at least one periodic tick
      42
    }
    assert(r == 42)
    val snap = lines.synchronized(lines.toList)
    assert(snap.nonEmpty && snap.last.contains("final"))
    assert(snap.exists(_.contains("work")))
    assert(snap.size >= 2) // >=1 periodic + the final report
  }
}
