package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
/** Scratch harness: dump the PageRank ITERATION plan (the returned-DF
  * plan is just the final checkpoint scan) for plans/r18 audit. */
object PRDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def edges: DataFrame = {
      val li = graft.queries.Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
        .select(col("a.pk").as("src"), col("b.pk").as("dst"))
    }
    def iterPlan(e2: DataFrame, n: Long, hint: Boolean): String = {
      val scale = 1000000000000L
      val init = scale / n; val base = (15L * scale / 100L) / n
      val ranks0 = e2.select(col("src")).distinct()
        .select(col("src").as("node"), lit(init).as("r")).localCheckpoint()
      val rr = if (hint) ranks0.hint("SHUFFLE_HASH") else ranks0
      val it = e2.join(rr, e2("src") === ranks0("node"))
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("insum"))
        .select(col("dst").as("node"), (lit(base) + expr("(85 * insum) div 100")).as("r"))
      it.write.format("noop").mode("overwrite").save() // force AQE final plan
      it.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    }
    // BEFORE shape: old structure (join+repartition at shuffle width, no hint)
    val e = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst")).distinct()
    val degB = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val e2b = e.join(degB, "src").repartition(col("src")).persist()
    val nB = degB.count()
    java.nio.file.Files.write(java.nio.file.Paths.get("plans/r18/op_pagerank_iteration_before.txt"),
      iterPlan(e2b, nB, hint = false).getBytes("UTF-8"))
    e2b.unpersist(true)
    // AFTER shape: current PageRank.run layout
    val er = e.repartition(col("src"))
    val degA = er.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val e2x = er.join(degA, "src").persist()
    val nA = e2x.select(col("src")).distinct().count()
    val bytes = e2x.queryExecution.optimizedPlan.stats.sizeInBytes
    val adv = math.max(8L, spark.sessionState.conf.getConf(
      org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES)) / 8
    val maxP = spark.sessionState.conf.numShufflePartitions
    val p = BigInt(1).max((bytes + adv - 1) / adv).min(BigInt(maxP)).toInt
    val e2a = if (p >= maxP) e2x else {
      val r = e2x.repartition(p, col("src")).persist(); r.count(); e2x.unpersist(); r }
    println(s"[dbg] after width p=$p")
    java.nio.file.Files.write(java.nio.file.Paths.get("plans/r18/op_pagerank_iteration_after.txt"),
      iterPlan(e2a, nA, hint = true).getBytes("UTF-8"))
    spark.stop()
  }
}
