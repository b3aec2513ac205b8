package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the driver contract). */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("PROF_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("PROF_MIN_PART", "1m"))
      .config("spark.sql.codegen.wholeStage",
        sys.env.getOrElse("PROF_CODEGEN", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskNanos = 0L
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages += 1
          tasks += sc.stageInfo.numTasks
          taskNanos += sc.stageInfo.taskMetrics.executorRunTime * 1000000L
        }
      })

    def time[T](name: String)(f: => T): T = {
      val s0 = stages; val k0 = tasks; val n0 = taskNanos
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(50) // let listener drain
      println(f"[prof] $name%-28s $wall%.2fs  stages=${stages - s0} " +
        f"tasks=${tasks - k0} taskTime=${(taskNanos - n0) / 1e9}%.2fs")
      r
    }

    import org.apache.spark.sql.functions._
    import graft.operators.{BenchmarkRunner, Chunking, IrMetrics}
    import graft.search.Ingest

    for (pass <- 1 to 2) {
      println(s"--- pass $pass ---")
      val chunks = time("buildChunks+cache") {
        val c = Ingest.buildChunks(Tables.load(spark, sfDir, "documents"),
          "docs", "doc_id", "text", "recursive",
          Chunking.ChunkConfig(minTokens = 5, maxTokens = 40), dim = 32).cache()
        c.count()
        c
      }
      val spark2 = spark
      import spark2.implicits._
      val queries = Seq((1, "spark hash join"), (2, "window sort batch"),
        (3, "customer order line")).toDF("query_id", "query_text")
      val qrels = Tables.load(spark, sfDir, "documents")
        .select(col("doc_id").cast("string").as("doc_id"),
          (col("doc_id") % 3 + 1).cast("int").as("query_id"),
          (col("doc_id") % 4).cast("int").as("grade"))
        .select("query_id", "doc_id", "grade")
      val d = time("denseRuns") {
        val r = BenchmarkRunner.denseRuns(chunks, queries, 20, 32)
        r.count(); r
      }
      val s = time("sparseRuns") {
        val r = BenchmarkRunner.sparseRuns(chunks, queries, 20)
        r.count(); r
      }
      // sparse internals
      val idx = graft.operators.Bm25.buildIndex(chunks, "chunk_id", "content")
      time("  bm25 docWeights") { idx.docWeights.count() }
      time("  bm25 docWeights AGAIN") { idx.docWeights.count() }
      time("  nchunks") { println("[prof] nchunks=" + chunks.count()) }
      time("  tokens explode only") {
        chunks.select(explode(
          graft.functions.TextFunctions.tokensCol(col("content"))).as("t"))
          .count()
      }
      time("  tokens noStopFilter") {
        chunks.select(explode(
          graft.functions.TextFunctions.tokensCol(col("content"),
            removeStopwords = false)).as("t")).count()
      }
      time("  tf only") {
        chunks.select(col("chunk_id").as("id"), explode(
          graft.functions.TextFunctions.tokensCol(col("content"))).as("term"))
          .groupBy("id", "term").count().count()
      }
      time("  bm25 stats") { idx.stats.count() }
      val qT = queries.select(col("query_id"),
          explode(graft.functions.TextFunctions.tokensCol(col("query_text"))).as("term"))
        .groupBy("query_id", "term").agg(count("*").as("q_tf"))
        .join(idx.stats.select("term", "idf"), "term")
        .filter(col("idf") > 0.0)
        .withColumn("q_weight", col("q_tf").cast("double") * col("idf"))
      time("  qTerms") { qT.count() }
      val scoredS = idx.docWeights
        .join(broadcast(qT.select("query_id", "term", "q_weight")), "term")
        .groupBy("query_id", "id")
        .agg(sum(col("weight") * col("q_weight")).as("score"))
      time("  scored agg") { scoredS.count() }
      val h = time("hybridRuns") {
        val r = BenchmarkRunner.hybridRuns(chunks, queries, 20, 32)
        r.count(); r
      }
      time("evaluate(full)") {
        BenchmarkRunner.evaluate(chunks, queries, qrels,
          mode = "hybrid", k = 20, dim = 32).count()
      }
      time("collapse+metrics only") {
        val docRuns = IrMetrics.collapseToDocs(
          h.select("query_id", "rank", "doc_id")).cache()
        IrMetrics.macroAveraged(docRuns, qrels).count()
      }
      chunks.unpersist()

      // --- minhash dedup stage breakdown (the bench's slowest family)
      val docs = Tables.load(spark, sfDir, "documents")
      import graft.operators.Dedup
      val sh = time("dedup shingles+cache") {
        val x = Dedup.shingles(docs, "doc_id", "text", 3).cache()
        x.count(); x
      }
      val sigs = time("dedup sha signatures") {
        val x = Dedup.minhashSignaturesFrom(sh, 16, Dedup.shaHashFamily)
        x.count(); x
      }
      val cands = time("dedup banding cands") {
        val x = Dedup.minhashCandidates(sigs, 16, 8)
        println("[prof] cands=" + x.count()); x
      }
      time("dedup verify (jaccard)") {
        graft.operators.Dedup.ngramJaccardFrom(sh,
          cands.coalesce(32).cache())
          .filter(col("jaccard") >= 0.2).count()
      }
      time("dedup xxhash signatures") {
        Dedup.minhashSignaturesFrom(sh, 16).count()
      }
      sh.unpersist()
    }
    spark.stop()
  }
}
