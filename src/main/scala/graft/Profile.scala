package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). */
object Profile {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val which = args.headOption.getOrElse("all")

    if (which == "all" || which == "ntile") {
      // q_ntile decomposition
      val cust = graft.queries.Tables.customer(spark, sfDir)
      t("customer count")(cust.count())
      val v = cust
      t("repartitionByRange+ckpt") {
        v.repartitionByRange(32, col("c_acctbal"), col("c_custkey"))
          .withColumn("__pid", spark_partition_id())
          .localCheckpoint().count()
      }
      (1 to 2).foreach { i =>
        t(s"q_ntile full run$i") {
          graft.queries.Relational.queries("q_ntile")(spark, sfDir).count()
        }
        spark.catalog.clearCache()
      }
    }

    if (which == "all" || which == "emb") {
      val emb = graft.queries.Tables.embeddings(spark, sfDir)
      t("embeddings count")(emb.count())
      println("dim = " + emb.selectExpr("size(embedding)").head())
      t("kmeans train") {
        graft.ext.SimilaritySearch.trainIvfCentroids(emb, "embedding", 16, iters = 3)
      }
      (1 to 2).foreach { i =>
        t(s"dedup_embedding full run$i") {
          graft.queries.Ext.queries("dedup_embedding")(spark, sfDir).count()
        }
        spark.catalog.clearCache()
      }
    }

    if (which == "all" || which == "minhash") {
      val docs = graft.queries.Tables.documents(spark, sfDir)
      t("documents count")(docs.count())
      val p = spark.sparkContext.defaultParallelism
      val shf: String => Seq[String] = { text =>
        val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        if (toks.length < 3) Seq.empty
        else toks.sliding(3).map(_.mkString(" ")).distinct.toSeq
      }
      val sh = udf(shf)
      t("shingle+sig scan") {
        val sigUdf = udf(graft.ext.Dedup.minhashSignature(128))
        docs.select(col("doc_id"), sh(col("text")).as("__shs"))
          .repartition(p)
          .withColumn("__sig", sigUdf(col("__shs")))
          .select(sum(size(col("__sig")))).head()
      }
      (1 to 2).foreach { i =>
        t(s"dedup_minhash full run$i") {
          graft.queries.Ext.queries("dedup_minhash")(spark, sfDir).count()
        }
        spark.catalog.clearCache()
      }
    }

    if (which == "prof") {
      // op_profile decomposition: job 1 (plain agg) vs job 2 (melt dedup)
      val li = graft.queries.Tables.lineitem(spark, sfDir)
      t("lineitem count")(li.count())
      (1 to 2).foreach { i =>
        t(s"job1 agg-only (approx mode) run$i") {
          graft.operators.ColumnProfiler.profile(li, exactDistinct = false)
            .count()
        }
        t(s"full exact profile run$i") {
          graft.operators.ColumnProfiler.profile(li).count()
        }
      }
      // melt variants: string-cast vs string-cast-free for numerics
      val names = li.schema.fieldNames.toSeq
      t("melt string-cast dedup") {
        val kvs = names.map(c =>
          struct(lit(c).as("c"), col(c).cast("string").as("v")))
        li.select(explode(array(kvs: _*)).as("kv"))
          .select(col("kv.c").as("__c"), col("kv.v").as("__v"))
          .where(col("__v").isNotNull)
          .groupBy(col("__c")).agg(countDistinct(col("__v"))).count()
      }
      t("melt xxhash64 dedup (lower bound, not exact-safe)") {
        val kvs = names.map(c =>
          struct(lit(c).as("c"), xxhash64(col(c)).as("v")))
        li.select(explode(array(kvs: _*)).as("kv"))
          .select(col("kv.c").as("__c"), col("kv.v").as("__v"))
          .groupBy(col("__c")).agg(countDistinct(col("__v"))).count()
      }
    }

    if (which == "rj") {
      val ev = graft.queries.Tables.events(spark, sfDir)
      val sixH = 6L * 3600 * 1000000
      val errors = ev.where(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("e_ts"), col("event_id").as("e_id"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
      (1 to 2).foreach { i =>
        t(s"RangeJoin bucketed run$i") {
          graft.operators.RangeJoin(errors, purchases, Seq("user_id"),
            ("e_ts", "p_ts"), -sixH, sixH).count()
        }
      }
      (1 to 2).foreach { i =>
        t(s"naive BNLJ range join run$i") {
          errors.join(purchases,
            errors("user_id") === purchases("user_id") &&
              unix_micros(col("p_ts")).between(
                unix_micros(col("e_ts")) - sixH,
                unix_micros(col("e_ts")) + sixH)).count()
        }
      }
      println(graft.queries.Events.queries("ev_range_join")(spark, sfDir)
        .queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange"))
        .mkString("\n"))
      // KEYLESS (pure temporal) join: the case Spark can only plan as a
      // nested loop.
      val halfH = 30L * 60 * 1000000
      (1 to 2).foreach { i =>
        t(s"KEYLESS bucketed run$i") {
          graft.operators.RangeJoin(errors, purchases, Seq.empty,
            ("e_ts", "p_ts"), -halfH, halfH).count()
        }
      }
      (1 to 2).foreach { i =>
        t(s"KEYLESS naive BNLJ run$i") {
          errors.join(purchases,
            unix_micros(col("p_ts")).between(
              unix_micros(col("e_ts")) - halfH,
              unix_micros(col("e_ts")) + halfH)).count()
        }
      }
    }

    if (which == "res") {
      import graft.operators.{BalancedSample, TopKPerKey}
      val li = graft.queries.Tables.lineitem(spark, sfDir)
      val withDraw = li
        .withColumn("__rowid",
          (col("l_orderkey") * 10 + col("l_linenumber")).cast("long"))
        .withColumn("__draw", BalancedSample.hash60(
          Seq(col("l_orderkey"), col("l_linenumber")), 7L))
      t("plain count")(li.count())
      t("md5 only")(li.select(count(md5(concat_ws(":",
        col("l_orderkey").cast("string"), col("l_linenumber").cast("string"),
        lit("7")))).as("c")).head())
      t("md5+substr+conv")(li.select(count(conv(substring(md5(concat_ws(":",
        col("l_orderkey").cast("string"), col("l_linenumber").cast("string"),
        lit("7"))), 1, 15), 16, 10)).as("c")).head())
      t("draw-only scan")(withDraw.select(sum(col("__draw"))).head())
      (1 to 2).foreach { i =>
        t(s"TopKPerKey k=5 3keys run$i")(
          TopKPerKey(withDraw, Seq("l_returnflag"), "__draw", "__rowid", 5).count())
      }
      (1 to 2).foreach { i =>
        t(s"full query run$i")(
          SparkEntry.queries("op_reservoir_per_key")(spark, sfDir).count())
      }
    }

    if (which == "plans") {
      Seq("t_seq_pack", "t_shuffle_rank", "q_window_range", "st_hourly")
        .foreach { q =>
          println(s"===== $q")
          println(SparkEntry.queries(q)(spark, sfDir)
            .queryExecution.executedPlan.toString.linesIterator
            .filter(l => l.contains("Exchange") || l.contains("Join") ||
              l.contains("Window") || l.contains("Sort") || l.contains("Scan"))
            .take(20).mkString("\n"))
        }
    }

    if (which == "all" || which == "cc") {
      (1 to 2).foreach { i =>
        t(s"dedup_clusters full run$i") {
          graft.queries.Ext.queries("dedup_clusters")(spark, sfDir).count()
        }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
