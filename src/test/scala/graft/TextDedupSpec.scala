package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.{TextFunctions => TF, Dedup}

class TextDedupSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  def textDf(texts: (Long, String)*) = texts.toDF("doc_id", "text")

  test("tokens: lowercase, punctuation split, empties dropped") {
    val got = textDf((1L, "Hello, World!  foo-bar 42"))
      .select(TF.tokens(col("text"))).as[Seq[String]].head()
    assert(got == Seq("hello", "world", "foo", "bar", "42"))
    val empty = textDf((1L, "!!!")).select(TF.tokens(col("text")))
      .as[Seq[String]].head()
    assert(empty.isEmpty)
  }

  test("shingles: 3-grams over tokens, distinct, short docs -> empty") {
    val got = textDf((1L, "a b c d"))
      .select(TF.shingles(TF.tokens(col("text")), 3)).as[Seq[String]].head()
    assert(got == Seq("a b c", "b c d"))
    val short = textDf((1L, "a b"))
      .select(TF.shingles(TF.tokens(col("text")), 3)).as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("langId votes marker words with priority tiebreak") {
    val df = textDf(
      (1L, "the cat and the dog of it"),
      (2L, "der hund und die katze ist"),
      (3L, "le chat et la maison est dans"),
      (4L, "xyzzy plugh"))
    val got = df.select(col("doc_id"), TF.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en" && got(2L) == "de" && got(3L) == "fr")
    assert(got(4L) == "und")
  }

  test("exactDedup keeps min id per identical content") {
    val df = textDf((1L, "same text"), (2L, "same text"), (3L, "other"))
    val kept = Dedup.exactDedup(df, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L))
    val groups = Dedup.exactGroups(df, "doc_id", "text")
      .where(col("n_copies") > 1).collect()
    assert(groups.length == 1 && groups(0).getAs[Long]("keep_id") == 1L)
  }

  test("jaccardPairs finds planted near-dup, minhash LSH agrees exactly") {
    val base = "spark engine scale data shuffle partition join filter " +
      "aggregate window broadcast catalyst tungsten codegen parquet " +
      "column row batch stream state watermark session checkpoint"
    val nearDup = base.replace("codegen", "compiled") // 1-2 shingle diff
    val other = "completely different words about cooking pasta sauce " +
      "tomato basil garlic olive oil parmesan fresh grated delicious " +
      "recipe kitchen dinner family table wine evening candle light"
    val df = textDf((1L, base), (2L, nearDup), (3L, other), (4L, base))
    val exact = Dedup.jaccardPairs(df, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    // (1,2) near-dup, (1,4)+(2,4) exact dup; 3 matches nothing.
    assert(exact.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L), (1L, 4L), (2L, 4L)))
    assert(exact.find(p => (p._1, p._2) == (1L, 4L)).get._3 == 1.0)
    val lsh = Dedup.minhashLshPairs(df, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    assert(lsh.toSeq == exact.toSeq) // verified candidates == exact result
  }

  test("jaccardPairs maxShingleDf drops stop-shingles (skew guard)") {
    // 'common words here' appears in all docs; with a df cap of 2 the
    // shared stop-shingle is dropped and only the true dup pair remains.
    val df = textDf(
      (1L, "common words here alpha beta gamma delta"),
      (2L, "common words here alpha beta gamma delta"),
      (3L, "common words here totally different content now"),
      (4L, "common words here unrelated text about other things"))
    val unfiltered = Dedup.jaccardPairs(df, "doc_id", "text", 0.1)
    val filtered = Dedup.jaccardPairs(df, "doc_id", "text", 0.1,
      maxShingleDf = Some(2))
    // the cap can only REMOVE candidate pairs, never add
    val uf = unfiltered.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val f = filtered.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(f.subsetOf(uf))
    assert(f.contains((1L, 2L))) // exact dups survive (their shingles df=2)
  }

  test("simhash: identical docs hamming 0, near-dups small, distinct large") {
    val h = Dedup.simhash64Fn
    val a = h(Seq("spark", "data", "engine", "scale", "join", "filter"))
    val b = h(Seq("spark", "data", "engine", "scale", "join", "shuffle"))
    val c = h(Seq("pasta", "sauce", "tomato", "basil", "garlic", "wine"))
    assert(h(Seq("spark", "data", "engine", "scale", "join", "filter")) == a)
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(hamming(a, b) < hamming(a, c))
  }

  test("simhashPairs surfaces duplicate docs") {
    val df = textDf(
      (1L, "spark data engine scale join filter window batch"),
      (2L, "spark data engine scale join filter window batch"),
      (3L, "pasta sauce tomato basil garlic wine dinner family"))
    val pairs = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("dedup pipeline: exact copies collapse, near-dups cluster, keep-set canonical") {
    val base = "spark engine scale data shuffle partition join filter " +
      "aggregate window broadcast catalyst tungsten codegen parquet"
    val near = base.replace("codegen", "compiled")
    val other = "entirely different cooking pasta sauce tomato basil " +
      "garlic olive oil parmesan fresh grated delicious recipe kitchen"
    val df = textDf(
      (1L, base), (2L, base), (3L, base), // exact copies
      (4L, near), //                         near-dup of the base group
      (5L, other), (6L, other)) //           second exact group
    val labeled = Dedup.pipeline(df, "doc_id", "text", threshold = 0.5)
    val m = labeled.select("doc_id", "exact_rep", "cluster_rep").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m(1L) == (1L, 1L) && m(2L) == (1L, 1L) && m(3L) == (1L, 1L))
    assert(m(4L)._2 == 1L) // near-dup joins base's cluster
    assert(m(5L) == (5L, 5L) && m(6L) == (5L, 5L))
    val keep = Dedup.pipelineKeep(df, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted
    assert(keep.toSeq == Seq(1L, 5L))
  }

  test("connectedComponents: transitive chains collapse to min label") {
    // chain 1-2, 2-3 (1 and 3 never paired directly) + isolated pair 7-9
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(1L) == 1L && comps(2L) == 1L && comps(3L) == 1L)
    assert(comps(7L) == 7L && comps(9L) == 7L)
    // singletons via nearDedupClusters
    val all = Seq(1L, 2L, 3L, 5L, 7L, 9L).toDF("doc_id")
    val clustered = Dedup.nearDedupClusters(all, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clustered(5L) == 5L)
    assert(clustered(3L) == 1L)
    // RELIABLE checkpointing (executor-loss survival on real
    // clusters): value-identical to the localCheckpoint default
    val ckDir = java.nio.file.Files
      .createTempDirectory("graft_ccck_").toFile
    ckDir.deleteOnExit()
    val reliable = Dedup.connectedComponents(pairs,
      checkpointDir = Some(ckDir.getAbsolutePath))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable == comps,
      "checkpointDir must not change a single label")
  }

  test("quality score rewards length and structure") {
    val df = textDf(
      (1L, "a good document with many meaningful words that continues " +
        "for a while and has reasonable structure and flow to it overall"),
      (2L, "x! y. z?"))
    val got = df.select(col("doc_id"), TF.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) > got(2L))
    assert(got(1L) <= 1.0 && got(2L) >= 0.0)
  }

  test("winnowing: guarantee, normalization, short-text windows") {
    val fn = TF.winnowFn(k = 8, w = 4)
    // deterministic: same text, same set
    val a = fn("the quick brown fox jumps over the lazy dog")
    assert(java.util.Arrays.equals(a,
      fn("the quick brown fox jumps over the lazy dog")))
    assert(a.sameElements(a.sorted) && a.distinct.length == a.length)
    // normalization: case + whitespace runs don't change the set
    assert(java.util.Arrays.equals(a,
      fn("The  QUICK brown\tfox jumps  over the LAZY dog")))
    // winnowing guarantee: a shared run of >= w+k-1 chars (here 11)
    // inside otherwise-different docs yields a shared fingerprint
    val shared = "zqxjkvbwpyfmarker" // >= 11 distinctive chars
    val d1 = fn("AAAA left context " + shared + " RIGHT tail one")
    val d2 = fn("completely other prefix " + shared + " different end")
    assert(d1.toSet.intersect(d2.toSet).nonEmpty)
    // fewer grams than w -> one whole-text window -> exactly 1 fp
    assert(fn("abcdefghij").length == 1) // 3 grams < w=4
    // shorter than k -> no grams -> empty
    assert(fn("abc").isEmpty)
    assert(fn(null) == null)
  }

  test("leakage-safe split: no near-dup cluster straddles splits; all docs covered") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.Ext.queries("t_leakage_split")(
      spark, SparkFixture.sf0001)
    val rows = out.collect()
    val nDocs = graft.queries.Tables.documents(spark, SparkFixture.sf0001).count()
    assert(rows.length == nDocs) // total: every doc gets exactly one split
    // the invariant the operator exists for: a cluster is atomic w.r.t.
    // the split — near-dups can never land on both sides of train/test
    val straddlers = out.groupBy(col("cluster_id"))
      .agg(countDistinct(col("split")).as("k"))
      .where(col("k") > 1).count()
    assert(straddlers == 0)
    // and the draw actually stratifies (all three splits non-empty at
    // 100 docs; deterministic fixture, deterministic draw)
    val splits = rows.map(_.getAs[String]("split")).toSet
    assert(splits == Set("train", "val", "test"))
  }

  test("spanDedup: first occurrence survives, later spans excised, order kept") {
    // chunkSize=4 spans: doc1=[aaaa,bbbb] doc2=[aaaa,cccc] doc3=[aaaa]
    // doc4=[dddd,aaaa] doc5=[bbbb] — 'aaaa' first at (1,0), 'bbbb'
    // first at (1,1); everything else unique.
    val df = textDf(
      (1L, "aaaabbbb"), (2L, "aaaacccc"), (3L, "aaaa"),
      (4L, "ddddaaaa"), (5L, "bbbb"))
    val got = Dedup.spanDedup(df, "doc_id", "text", chunkSize = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_chunks"), r.getAs[Int]("n_kept"),
          r.getAs[String]("clean_text")))).toMap
    assert(got(1L) == ((2, 2, "aaaabbbb"))) // first occurrences keep all
    assert(got(2L) == ((2, 1, "cccc")))     // later 'aaaa' excised
    assert(got(3L) == ((1, 0, "")))         // every span a later dup
    assert(got(4L) == ((2, 1, "dddd")))     // order: surviving span only
    assert(got(5L) == ((1, 0, "")))         // 'bbbb' first seen at (1,1)
    // empty text is total: one empty span, which IS the corpus-first
    // empty span for doc 0 (sorts before all) — self-consistency only
    val e = Dedup.spanDedup(textDf((7L, "")), "doc_id", "text", 4)
      .collect()(0)
    assert(e.getAs[Int]("n_chunks") == 1 && e.getAs[Int]("n_kept") == 1)
  }

  test("bandedProbeRows: stream-static banding == batch minhashLshPairs pairs") {
    // The stream-static composition (probe side banded independently of
    // the index side) must find exactly the pairs the batch self-join
    // pipeline finds across the parity split — this pins the band-key
    // derivation of bandedProbeRows to minhashLshPairs' (a drifted key
    // scheme would silently miss every pair).
    import org.apache.spark.sql.functions._
    val docs = graft.queries.Tables.documents(spark, SparkFixture.sf0001)
    val index = Dedup.bandedProbeRows(
        docs.where(col("doc_id") % 2 === 0), "doc_id", "text")
      .select(col("__band"), col("__key"), col("doc_id").as("old_id"),
        col("__shs").as("__so"))
    val probes = Dedup.bandedProbeRows(
        docs.where(col("doc_id") % 2 === 1), "doc_id", "text")
      .select(col("__band"), col("__key"), col("doc_id").as("new_id"),
        col("__shs").as("__sn"))
    val got = probes.join(index, Seq("__band", "__key"))
      .withColumn("j",
        size(array_intersect(col("__sn"), col("__so"))).cast("double") /
          size(array_union(col("__sn"), col("__so"))))
      .where(col("j") >= 0.5)
      .select(col("new_id"), col("old_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Dedup.minhashLshPairs(docs, "doc_id", "text", 0.5)
      .where(col("id_a") % 2 =!= col("id_b") % 2)
      .collect().map { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        if (a % 2 == 1) (a, b) else (b, a)
      }.toSet
    assert(got == batch && got.nonEmpty)
  }

  test("fuzzyPairs: planted typo pair found, verify prunes gram-similar far pairs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps ovre the lazy dog tonight"), // 2 edits
      (3L, "the quick brown fox jumps over the lazy dog tonight"), // exact dup of 1
      (4L, "zzz completely unrelated content qqq xxx yyy www vvv"),
      // shares many grams with 1 (same vocabulary, reshuffled order) but
      // far in edit distance -> must be BLOCKED in, then verify-pruned
      (5L, "dog lazy the over jumps fox brown quick the tonightz"))
      .toDF("doc_id", "text")
    val got = Dedup.fuzzyPairs(docs, "doc_id", "text",
      keyLen = 80, gram = 3, maxGramDf = 100, minShared = 4, maxDist = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(3))).toMap
    assert(got.contains((1L, 2L)) && got((1L, 2L)) == 2,
      s"typo pair with exact distance, got $got")
    assert(got.contains((1L, 3L)) && got((1L, 3L)) == 0)
    assert(got.contains((2L, 3L)) && got((2L, 3L)) == 2)
    assert(!got.keySet.exists(p => p._1 == 4L || p._2 == 4L), "unrelated")
    assert(!got.keySet.exists(p => p._1 == 5L || p._2 == 5L),
      "gram-similar but edit-far pair must fail the exact verify")
    // the reshuffled doc 5 WAS a blocking candidate (shared grams >= 4):
    // raising maxDist shows verify, not blocking, excluded it
    val loose = Dedup.fuzzyPairs(docs, "doc_id", "text",
      keyLen = 80, gram = 3, maxGramDf = 100, minShared = 4, maxDist = 80)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("fuzzyPairs df cap is corpus-relative: duplication-invariant blocking") {
    import spark.implicits._
    // The round-8 SCALE.md footgun: an absolute cap tuned at one corpus
    // size blocks EVERYTHING once the corpus (and with it every gram's
    // df) grows. The corpus-relative default must find the planted typo
    // pair at 1× AND at 8× duplication, where the old absolute cap
    // (pro-rated for 1×) blocks every gram.
    // 2 near-dups + 10 distinct fillers: the pair's shared grams have
    // df=2 of n=12 (under the 0.2 default); at 8× duplication df=16 of
    // n=96 — the RATIO is invariant, so the relative cap keeps passing.
    val base = Seq(
      1L -> "the quick brown fox jumps over the lazy dog tonight",
      2L -> "the quick brown fox jumps ovre the lazy dog tonight") ++
      (3L to 12L).map(i =>
        i -> s"memo$i entry$i item$i alpha$i beta$i gamma$i delta$i")
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      Dedup.fuzzyPairs(df, "doc_id", "text", maxDist = 5)
        .collect().map(r => (r.getLong(0) % 100, r.getLong(1) % 100)).toSet
    val one = pairsOf(base.toDF("doc_id", "text"))
    assert(one.contains((1L, 2L)), s"1x: $one")
    val eight = (0 until 8).flatMap(c =>
      base.map { case (id, t) => (c * 100L + id, t) })
      .toDF("doc_id", "text")
    // default (fraction) cap: still finds the clones' typo pairs
    assert(pairsOf(eight).contains((1L, 2L)), "8x under the relative cap")
    // the 1×-tuned ABSOLUTE cap (df <= 2, what the pair needed at 1×)
    // blocks every shared gram at 8× where each repeats 16 times
    val absolute = Dedup.fuzzyPairs(eight, "doc_id", "text",
      maxGramDf = 2, maxDist = 5).count()
    assert(absolute == 0L,
      "a size-tuned absolute cap must demonstrate the 10x footgun")
  }
}
