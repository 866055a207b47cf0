package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Degenerate-input robustness: every driver query must behave
  * DELIBERATELY on zero-row tables — either produce a (possibly empty)
  * result, or refuse with IllegalArgumentException and a clear message
  * (for operators whose contract genuinely needs data, e.g. IVF
  * training). Crashes (NPE, head-of-empty, schema-inference failures)
  * are bugs: at 100 TB an empty partition/table is an everyday event,
  * and a pipeline stage must not die on it. */
class EmptyInputSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  /** Zero-row copies of every testdata table, same schemas. */
  lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft_empty_").toString
    val src = SparkFixture.sf0001
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      df.limit(0).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    // events needs the raw ns-long schema (Tables.events converts).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$src/events.parquet")
    ev.limit(0).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("every driver query is deliberate on zero-row input") {
    val failures = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        fn(spark, emptyDir).count() // any row count is fine, incl. 0
      } catch {
        // Only KNOWN contract refusals count as deliberate — a blanket
        // IllegalArgumentException pass would also bless regressions
        // that surface through some other require().
        case e: IllegalArgumentException
            if Option(e.getMessage).exists(m =>
              m.contains("no non-empty vectors") ||
                m.contains("require local mode")) =>
        case e: Throwable =>
          failures += s"$name: ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}"
      }
    }
    assert(failures.isEmpty,
      "queries that crash (not refuse) on empty input:\n" +
        failures.mkString("\n"))
  }
}
