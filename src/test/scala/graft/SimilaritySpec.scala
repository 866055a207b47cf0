package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, SimilaritySearch}

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  def emb(s: org.apache.spark.sql.SparkSession) =
    s.read.parquet(s"${SparkFixture.sf0001}/embeddings.parquet")

  test("cosineCol: unit vectors, orthogonal vectors") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(1.0, 0.0)),
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(1.0, 1.0), Seq(1.0, 1.0))).toDF("a", "b")
    val got = df.select(Dedup.cosineCol(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
    assert(math.abs(got(2) - 1.0) < 1e-12)
  }

  test("bruteForceTopK: k results per query, self excluded, rank ordered") {
    val e = emb(spark)
    val q = e.where(col("vec_id") < 5)
    val got = SimilaritySearch.bruteForceTopK(e, q, "vec_id", "embedding", k = 7)
    val byQuery = got.collect().groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 5)
    byQuery.foreach { case (qid, rows) =>
      assert(rows.length == 7)
      assert(!rows.exists(_.getAs[Long]("cand_id") == qid))
      val ranked = rows.sortBy(_.getAs[Int]("rank"))
      val cosines = ranked.map(_.getAs[Double]("cosine"))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    }
  }

  test("lshTopK recall vs exact baseline at matched params") {
    val e = emb(spark)
    val q = e.where(col("vec_id") < 10)
    val exact = SimilaritySearch.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    val ann = SimilaritySearch.lshTopK(e, q, "vec_id", "embedding", 5,
      numPlanes = 4, numTables = 12)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    // Random 64-dim corpus: top-5 neighbors sit near cosine 0.3-0.5
    // (θ≈60-70°) → per-table collision ~(1-θ/π)^4; 12 tables lift
    // recall well above half. A hard floor guards against regressions.
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("ivfTopK: recall vs exact baseline with nProbe cells") {
    val e = emb(spark)
    val q = e.where(col("vec_id") < 10)
    val exact = SimilaritySearch.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    val ivf = SimilaritySearch.ivfTopK(e, q, "vec_id", "embedding", 5,
      nCentroids = 8, nProbe = 4, iters = 2)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall=$recall")
    // probing ALL cells must reproduce the exact result
    val full = SimilaritySearch.ivfTopK(e, q, "vec_id", "embedding", 5,
      nCentroids = 8, nProbe = 8, iters = 2)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    assert(full == exact, "nProbe=nCentroids must equal brute force")
  }

  test("ivfRadiusSearch: full probe == brute radius; selective is a subset") {
    val e = emb(spark)
    val q = e.where(col("vec_id") < 10)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"),
        r.getAs[Double]("cosine"))).toSet
    val exact = rows(SimilaritySearch.radiusSearch(
      e, q, "vec_id", "embedding", minCosine = 0.35))
    assert(exact.nonEmpty, "fixture should yield radius hits at 0.35")
    val full = rows(SimilaritySearch.ivfRadiusSearch(
      e, q, "vec_id", "embedding", minCosine = 0.35,
      nCentroids = 8, nProbe = 8, iters = 2))
    assert(full == exact, "nProbe=nCentroids must equal brute radius")
    // selective probing: a STRICT SUBSET contract (scored pairs pass
    // the same threshold — missed cells are pure recall, never wrong
    // rows) with a recall floor
    val sel = rows(SimilaritySearch.ivfRadiusSearch(
      e, q, "vec_id", "embedding", minCosine = 0.35,
      nCentroids = 8, nProbe = 4, iters = 2))
    assert(sel.subsetOf(exact), s"extra=${(sel -- exact).take(5)}")
    val recall = (exact & sel).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall=$recall")
  }

  test("ivfKnnMutual: full probe == exact mutual graph; selective recall") {
    val e = emb(spark)
    def edges(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val exact = edges(graft.queries.Ext.simKnnMutual(
      spark, SparkFixture.sf0001))
    assert(exact.nonEmpty)
    val full = edges(SimilaritySearch.ivfKnnMutual(
      e, "vec_id", "embedding", k = 10, nCentroids = 8, nProbe = 8,
      iters = 2))
    assert(full == exact,
      s"missing=${(exact -- full).take(5)} extra=${(full -- exact).take(5)}")
    val sel = edges(SimilaritySearch.ivfKnnMutual(
      e, "vec_id", "embedding", k = 10, nCentroids = 8, nProbe = 4,
      iters = 2))
    val recall = (exact & sel).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall=$recall")
  }

  test("blocked embeddingNearDupPairs == all-pairs anchor (exact)") {
    val e = emb(spark)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("cosine"))).toSet
    // low threshold → many pairs; cell pruning must still lose nothing
    val anchor = rows(Dedup.embeddingNearDupPairsAllPairs(
      e, "vec_id", "embedding", threshold = 0.4))
    val blocked = rows(Dedup.embeddingNearDupPairs(
      e, "vec_id", "embedding", threshold = 0.4, nCells = 8))
    assert(anchor.nonEmpty, "fixture should yield pairs at 0.4")
    assert(blocked == anchor,
      s"missing=${(anchor -- blocked).take(5)} extra=${(blocked -- anchor).take(5)}")
  }

  test("image helpers: png round-trip, data uri, viewport fit") {
    import graft.functions.ImageFunctions
    val png = ImageFunctions.grayToPng(Array.tabulate(64)(_ / 63.0f), 8, 8)
    assert(png.take(8).map(_ & 0xff).toSeq ==
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)) // PNG magic
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(back.getWidth == 8 && back.getHeight == 8)
    assert(ImageFunctions.toDataUri(png).startsWith("data:image/png;base64,"))
    assert(ImageFunctions.toImgTag(png).startsWith("<img src=\"data:image"))
    assert(ImageFunctions.hwInViewport(1000, 500, 100, 100) == (100, 50))
    assert(ImageFunctions.hwInViewport(50, 40, 100, 100) == (50, 40))
    assert(ImageFunctions.hwInViewport(500, 1000, 100, 100) == (50, 100))
  }

  test("upsertQuantizedIndex: cell moves, idempotent replay, one file per cell") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath
    val e = emb(spark)
    val base = e.where(col("vec_id") % 5 =!= 4)
    val (scale, cs) = SimilaritySearch.writeQuantizedIndex(
      base, "vec_id", "embedding", path, nCentroids = 4, iters = 2)
    val changes = base.where(col("vec_id") % 13 === 0)
      .select(col("vec_id"), col("embedding"), lit("D").as("op"))
      .unionByName(base.where(col("vec_id") % 13 =!= 0 &&
          col("vec_id") % 7 === 0)
        .select(col("vec_id"), reverse(col("embedding")).as("embedding"),
          lit("U").as("op")))
      .unionByName(e.where(col("vec_id") % 5 === 4)
        .select(col("vec_id"), col("embedding"), lit("I").as("op")))
    SimilaritySearch.upsertQuantizedIndex(
      changes, "vec_id", "embedding", "op", path, scale, cs)
    def snapshot() = spark.read.parquet(path)
      .select("cand_id", "n", "cell")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
      .toSet
    val after1 = snapshot()
    val ids1 = after1.map(_._1)
    // deletes gone, inserts present
    val deleted = base.where(col("vec_id") % 13 === 0)
      .select("vec_id").as[Long].collect().toSet
    val inserted = e.where(col("vec_id") % 5 === 4)
      .select("vec_id").as[Long].collect().toSet
    assert(deleted.forall(id => !ids1.contains(id)))
    assert(inserted.subsetOf(ids1))
    // every id appears in exactly ONE cell (a moved update leaves no
    // stale copy behind)
    assert(after1.groupBy(_._1).forall(_._2.size == 1))
    // idempotent replay
    SimilaritySearch.upsertQuantizedIndex(
      changes, "vec_id", "embedding", "op", path, scale, cs)
    assert(snapshot() == after1)
    // one data file per cell directory (the at-rest layout survives)
    val cellDirs = dir.listFiles().filter(f =>
      f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty)
    cellDirs.foreach { cd =>
      val files = cd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${cd.getName}: ${files.length} files")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("upsert keymap: pruned discovery == legacy full-scan fallback") {
    def build(tag: String) = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_km_$tag").toFile
      dir.deleteOnExit()
      val e = emb(spark).limit(120)
      val (scale, cs) = SimilaritySearch.writeQuantizedIndex(
        e, "vec_id", "embedding", dir.getAbsolutePath,
        nCentroids = 4, iters = 2, keyBuckets = 8)
      (dir, e, scale, cs)
    }
    val changesOf = (e: org.apache.spark.sql.DataFrame) =>
      e.where(col("vec_id") % 11 === 0)
        .select(col("vec_id"), col("embedding"), lit("D").as("op"))
        .unionByName(e.where(col("vec_id") % 11 === 1)
          .select(col("vec_id"), reverse(col("embedding")).as("embedding"),
            lit("U").as("op")))
    // keymap path
    val (d1, e1, s1, c1) = build("a")
    // the sidecar must be invisible to a plain index read
    val visible = spark.read.parquet(d1.getAbsolutePath).columns.toSet
    assert(visible == Set("cand_id", "q", "n", "cell"))
    SimilaritySearch.upsertQuantizedIndex(
      changesOf(e1), "vec_id", "embedding", "op", d1.getAbsolutePath, s1, c1)
    // legacy path: same build, sidecar deleted -> full-scan fallback
    val (d2, e2, s2, c2) = build("b")
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(d2, "_keymap"))
    SimilaritySearch.upsertQuantizedIndex(
      changesOf(e2), "vec_id", "embedding", "op", d2.getAbsolutePath, s2, c2)
    def snap(d: java.io.File) = spark.read.parquet(d.getAbsolutePath)
      .select("cand_id", "n", "cell").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
    assert(snap(d1) == snap(d2), "keymap and fallback paths must agree")
    // keymap reflects the post-CDC state: one row per surviving key,
    // cell matches the index
    val km = spark.read.parquet(d1.getAbsolutePath + "/_keymap")
      .select("cand_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val idx = snap(d1).map(t => t._1 -> t._3).toMap
    assert(km == idx, "keymap must mirror the index after upsert")
    Seq(d1, d2).foreach(org.apache.commons.io.FileUtils.deleteQuietly)
  }

  test("keyBuckets=0: no sidecar written; upsert falls back; rebuild migrates") {
    val dir = java.nio.file.Files.createTempDirectory("graft_km_off_").toFile
    dir.deleteOnExit()
    val e = emb(spark).limit(100)
    val (scale, cs) = SimilaritySearch.writeQuantizedIndex(
      e, "vec_id", "embedding", dir.getAbsolutePath,
      nCentroids = 4, iters = 2, keyBuckets = 0)
    // read-only serving build: no CDC sidecar at all
    assert(!new java.io.File(dir, "_keymap").exists())
    // upsert against the sidecar-less index works via full-scan fallback
    val changes = e.where(col("vec_id") % 7 === 0)
      .select(col("vec_id"), col("embedding"), lit("D").as("op"))
    SimilaritySearch.upsertQuantizedIndex(
      changes, "vec_id", "embedding", "op", dir.getAbsolutePath, scale, cs)
    val ids = spark.read.parquet(dir.getAbsolutePath)
      .select("cand_id").as[Long].collect().toSet
    val want = e.where(col("vec_id") % 7 =!= 0)
      .select("vec_id").as[Long].collect().toSet
    assert(ids == want)
    // migration: rebuildKeymap adds the sidecar from the index itself
    SimilaritySearch.rebuildKeymap(spark, dir.getAbsolutePath, keyBuckets = 8)
    val km = spark.read.parquet(dir.getAbsolutePath + "/_keymap")
      .select("cand_id").as[Long].collect().toSet
    assert(km == want, "rebuilt keymap must mirror the index")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("upsert: emptying a cell deletes its directory (no stale vectors)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_cell_").toFile
    dir.deleteOnExit()
    val e = emb(spark).limit(100)
    val (scale, cs) = SimilaritySearch.writeQuantizedIndex(
      e, "vec_id", "embedding", dir.getAbsolutePath, nCentroids = 4, iters = 2)
    // pick one whole cell and delete every key in it
    val idx0 = spark.read.parquet(dir.getAbsolutePath)
      .select("cand_id", "cell").collect().map(r => (r.getLong(0), r.getInt(1)))
    val victim = idx0.groupBy(_._2).minBy(_._2.length)._1
    val victimIds = idx0.filter(_._2 == victim).map(_._1).toSet
    val changes = e.where(col("vec_id").isin(victimIds.toSeq.map(x => x: Any): _*))
      .select(col("vec_id"), col("embedding"), lit("D").as("op"))
    SimilaritySearch.upsertQuantizedIndex(
      changes, "vec_id", "embedding", "op", dir.getAbsolutePath, scale, cs)
    // stale partition dir gone, vectors unreadable, keymap clean
    assert(!new java.io.File(dir, s"cell=$victim").exists(),
      "emptied cell directory must be deleted, not left stale")
    val after = spark.read.parquet(dir.getAbsolutePath)
      .select("cand_id").as[Long].collect().toSet
    assert(victimIds.forall(id => !after.contains(id)))
    val km = spark.read.parquet(dir.getAbsolutePath + "/_keymap")
      .select("cand_id").as[Long].collect().toSet
    assert(victimIds.forall(id => !km.contains(id)))
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("upsert: duplicate key in the change set fails loud") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dupkey_").toFile
    dir.deleteOnExit()
    val e = emb(spark).limit(60)
    val (scale, cs) = SimilaritySearch.writeQuantizedIndex(
      e, "vec_id", "embedding", dir.getAbsolutePath, nCentroids = 2, iters = 1)
    val dup = e.where(col("vec_id") === 0)
      .select(col("vec_id"), col("embedding"), lit("U").as("op"))
    val ex = intercept[Exception] {
      SimilaritySearch.upsertQuantizedIndex(
        dup.unionByName(dup), "vec_id", "embedding", "op",
        dir.getAbsolutePath, scale, cs)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("duplicate key")),
      s"expected the duplicate-key guard, got: $ex")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("withBuckets: deterministic bucket assignment") {
    val e = emb(spark).limit(50).cache()
    val b1 = SimilaritySearch.withBuckets(e, "embedding", 8, 2)
      .select("vec_id", "__bucket_0", "__bucket_1").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b2 = SimilaritySearch.withBuckets(e, "embedding", 8, 2)
      .select("vec_id", "__bucket_0", "__bucket_1").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(b1 == b2)
    // buckets within range [0, 2^8)
    assert(b1.forall { case (_, x, y) => x >= 0 && x < 256 && y >= 0 && y < 256 })
  }

  test("mutual-kNN graph: edges are exactly the symmetric top-k intersections") {
    import org.apache.spark.sql.functions._
    val edges = graft.queries.Ext.queries("sim_knn_mutual")(
      spark, SparkFixture.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges.nonEmpty)
    assert(edges.forall { case (a, b) => a < b }, "canonical orientation")
    // independent check from the raw top-k lists: an (a, b) edge exists
    // iff b ∈ topk(a) AND a ∈ topk(b)
    val e = emb(spark)
    val topk = SimilaritySearch.bruteForceTopK(
        e, e, "vec_id", "embedding", k = 10)
      .select("query_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = topk.collect {
      case (a, b) if a < b && topk.contains((b, a)) => (a, b)
    }
    assert(edges == expect)
  }

  test("nearestAnchor: argmax parity with driver replay; ties to smaller id") {
    val e = emb(spark)
    val anchors = e.where(col("vec_id") < 6)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toVector))
      .sortBy(_._1).toSeq
    val got = SimilaritySearch.nearestAnchor(e, "vec_id", "embedding", anchors)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent driver-side replay (same det6 pin)
    def det6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      det6(dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum)))
    }
    val vecs = e.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toVector))
    vecs.foreach { case (id, v) =>
      val best = anchors.map { case (aid, av) => (cos(av, v), aid) }
        .minBy { case (c, aid) => (-c, aid) }._2
      assert(got(id) == best, s"vec $id")
    }
    // anchors label themselves (cosine 1.0 to their own vector)
    anchors.foreach { case (aid, _) => assert(got(aid) == aid) }
    // exact tie (duplicated anchor vector under two ids) → smaller id
    val dup = Seq((10L, anchors.head._2), (11L, anchors.head._2))
    val tied = SimilaritySearch.nearestAnchor(
      e.where(col("vec_id") === anchors.head._1), "vec_id", "embedding", dup)
      .collect()
    assert(tied.head.getLong(1) == 10L)
  }

  test("kmeansStep: partitioning-invariant; equals sequential Lloyd update") {
    val e = emb(spark)
    val anchors = e.where(col("vec_id") < 4)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toVector))
      .sortBy(_._1).toSeq
    def run(df: org.apache.spark.sql.DataFrame) =
      SimilaritySearch.kmeansStep(df, "vec_id", "embedding", anchors)
        .collect()
        .map(r => ((r.getLong(0), r.getInt(1)), r.getDouble(2))).toMap
    val a = run(e)
    val b = run(e.repartition(13))
    assert(a == b, "fixed-point mean must not depend on partitioning")
    // sequential replay: same det6-component fixed-point mean
    def det6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def cos(p: Seq[Double], q: Seq[Double]) = {
      val dot = p.zip(q).map { case (x, y) => x * y }.sum
      det6(dot / (math.sqrt(p.map(x => x * x).sum) *
        math.sqrt(q.map(x => x * x).sum)))
    }
    val vecs = e.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toVector))
    val byCluster = vecs.groupBy { case (_, v) =>
      anchors.map { case (aid, av) => (cos(av, v), aid) }
        .minBy { case (c, aid) => (-c, aid) }._2
    }
    byCluster.foreach { case (cid, members) =>
      val dim = members.head._2.length
      (0 until dim).foreach { i =>
        // exact integer micro-units replay of the decimal(18,6) sum
        val sumMicros = members.map { case (_, v) =>
          math.floor(v(i) * 1e6 + 0.5).toLong }.sum
        val want = det6(sumMicros / 1e6 / members.size)
        assert(a((cid, i)) == want, s"cluster $cid dim $i")
      }
    }
  }
}
