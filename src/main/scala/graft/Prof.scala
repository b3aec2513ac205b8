package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the driver contract): runs the
  * queries named in PROF_QUERIES (comma-separated) N times each and
  * prints per-run wall + stage/task counts, so once-per-dir standing
  * builds are visible separately from the steady-state serve cost. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("PROF_QUERIES", "search_collapse")
      .split(',').toSeq
    val runs = sys.env.getOrElse("PROF_RUNS", "4").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
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
      println(f"[prof] $name%-34s $wall%.2fs  stages=${stages - s0} " +
        f"tasks=${tasks - k0} taskTime=${(taskNanos - n0) / 1e9}%.2fs")
      r
    }

    if (sys.env.get("PROF_COLLAPSE_BREAKDOWN").contains("1")) {
      import org.apache.spark.sql.functions._
      import graft.operators.{Bm25, Dedup}
      // replicate search_collapse's pieces with bench-like count()
      // actions, twice (run 2 = steady state, standing caches warm)
      for (pass <- 1 to 2) {
        println(s"--- collapse pass $pass ---")
        val full = SparkEntry.queries("search_collapse")
        time("collapse full (count)") { full(spark, sfDir).count() }
      }
      val docs = Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      val shadows = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + lit(1L << 41)).as("doc_id"),
          concat(col("text"),
            lit(" collapsed duplicate variant")).as("text"))
      val corpus = docs.unionByName(shadows).cache()
      time("corpus count") { corpus.count() }
      val idx = Bm25.buildIndex(corpus, "doc_id", "text", pinStats = true)
      val pinned = idx.copy(docWeights = idx.docWeights.cache())
      time("index build") { pinned.docWeights.count() }
      for (pass <- 1 to 3) {
        println(s"--- piece pass $pass ---")
        val top = time("searchTopK+ckpt") {
          Bm25.searchTopK(corpus, "doc_id", "text",
            "spark data table", 50, index = Some(pinned))
          .select(col("id").as("doc_id"),
            round(col("score"), 6).as("score"))
          .localCheckpoint()
        }
        val candIds = broadcast(top.select(col("doc_id").as("id")))
        val candDocs = corpus.join(
          candIds.select(col("id").as("doc_id")), "doc_id")
        val shCand = Dedup.shingles(candDocs, "doc_id", "text", 3)
        time("shingles(cand) count") { shCand.count() }
        val sigs = Dedup.minhashSignaturesFrom(
          Dedup.shingles(corpus, "doc_id", "text", 3), 16,
          Dedup.shaHashFamily).cache()
        time("standing sigs count") { sigs.count() }
        val pairs = time("neardups from sigs") {
          val p = Dedup.minhashNearDupsFromSigs(shCand,
            sigs.join(candIds, "id"), 16, 8, 0.5)
            .select(col("id_a"), col("id_b"))
          p.count(); p
        }
      }
      spark.stop(); return
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      for (i <- 1 to runs)
        time(s"$name run$i") { fn(spark, sfDir).count() }
    }
    spark.stop()
  }
}
