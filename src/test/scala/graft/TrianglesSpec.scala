package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Triangles

class TrianglesSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def edges(es: (Long, Long)*) = es.toDF("src", "dst")
  private def nTri(df: org.apache.spark.sql.DataFrame): Long =
    Triangles.count(df).head.getLong(0)

  test("golden counts: triangle, K4, path, star") {
    assert(nTri(edges((1, 2), (2, 3), (1, 3))) == 1)
    // K4 has C(4,3) = 4 triangles
    assert(nTri(edges((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))) == 4)
    assert(nTri(edges((1, 2), (2, 3), (3, 4))) == 0)
    // a star is triangle-free no matter the hub degree
    assert(nTri(edges((0, 1), (0, 2), (0, 3), (0, 4), (0, 5))) == 0)
  }

  test("direction, duplicates, and self-loops are canonicalized away") {
    val messy = edges(
      (1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (1, 3), (2, 2), (3, 3))
    assert(nTri(messy) == 1)
  }

  test("two disjoint triangles sharing no vertex") {
    assert(nTri(edges((1, 2), (2, 3), (1, 3), (7, 8), (8, 9), (7, 9))) == 2)
  }

  test("perNode credits all three corners; totals = 3 × count") {
    val k4 = edges((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))
    val per = Triangles.perNode(k4)
      .as[(Long, Long)].collect().toMap
    // every K4 vertex sits in exactly C(3,2) = 3 triangles
    assert(per == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(per.values.sum == 3 * nTri(k4))
  }

  test("orientation degree cap: hub fan-out never enumerated") {
    // hub 0 connected to 1..20, plus one triangle through the hub.
    // Orientation sends every hub edge TOWARD the hub (its degree is
    // highest), so the hub's out-degree in the oriented graph is 0 and
    // wedge enumeration at the hub is empty — the count still works.
    val hub = (1L to 20L).map(i => (0L, i)) ++ Seq((1L, 2L))
    val df = hub.toDF("src", "dst")
    assert(nTri(df) == 1)
    val oriented = Triangles.orient(Triangles.canonical(df))
    val outDeg = oriented.groupBy("lo").agg(count(lit(1)).as("d"))
      .agg(max("d")).head.getLong(0)
    // max out-degree stays O(sqrt(E)) — here far below the hub's 21
    assert(outDeg <= 3, s"oriented out-degree $outDeg leaks hub fan-out")
  }

  test("matches the ordered-triple SQL formulation on a random graph") {
    val r = new scala.util.Random(7)
    val es = Seq.fill(300)((r.nextInt(40).toLong, r.nextInt(40).toLong))
    val df = es.toDF("src", "dst")
    df.createOrReplaceTempView("raw_edges")
    val want = spark.sql(
      """WITH e AS (SELECT DISTINCT least(src, dst) AS u,
        |    greatest(src, dst) AS v FROM raw_edges WHERE src <> dst)
        |SELECT count(*) FROM e e1
        |JOIN e e2 ON e2.u = e1.v
        |JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v""".stripMargin)
      .head.getLong(0)
    assert(nTri(df) == want)
  }
}
