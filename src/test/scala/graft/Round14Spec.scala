package graft

import org.apache.spark.sql.functions._

import graft.streaming.Sync

/** Round-14 pins.
  *
  * 1. Streaming checkpoint RECOVERY (VERDICT r13 #1): the
  *    `streaming_restart_resume` row's shared oracle proves
  *    resumed-output == single-run-output; this spec pins the two
  *    properties the output hash alone can't separate —
  *    (a) state is RESTORED, not recomputed: a duplicate arriving
  *        AFTER the stop is attributed to a canonical that arrived
  *        BEFORE it (an empty rebuilt store would make the late copy a
  *        fresh canonical and emit nothing), and
  *    (b) exactly-once across the restart: the resumed query emits
  *        only the post-stop rows — nothing from batches 1–2 is
  *        re-emitted into the file sink.
  *
  * 2. Tuned-fit sidecar round-trip (VERDICT r13 #2): the
  *    `*_fit_persist` rows — served from READ-BACK picks + codebook /
  *    centroids — are row-for-row equal to their session-cached twins
  *    in one JVM, without the DuckDB oracle in the loop (the shared
  *    oracles prove the same thing cross-engine at the driver gate).
  */
class Round14Spec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix)

  test("restart-resume: a post-stop duplicate is attributed to its " +
      "pre-stop canonical (state restored), and the resumed query " +
      "re-emits nothing (exactly-once sink)") {
    val root = tmp("graft-r14-restart")
    val in = root.resolve("in"); val out = root.resolve("out")
    val ck = root.resolve("ck")
    java.nio.file.Files.createDirectories(in)
    // ts = doc_id seconds (the staged-fixture contract). Batch 1 holds
    // the canonical of hash "dup A" at id 10; batch 2 an in-horizon
    // copy at id 30; batch 3 (post-stop) another in-horizon copy at
    // id 55 — attributable to id 10 ONLY if the store survived the
    // restart — and an out-of-horizon copy at id 95 that must
    // silently become the new canonical (not be reported).
    val b1 = Seq((10L, "dup A"), (11L, "unique b1")).toDF("doc_id", "text")
    val b2 = Seq((30L, "dup A"), (31L, "unique b2")).toDF("doc_id", "text")
    val b3 = Seq((55L, "dup A"), (95L, "dup A")).toDF("doc_id", "text")
    var stamp = 1700000000000L
    def stage(df: org.apache.spark.sql.DataFrame): Unit = {
      df.coalesce(1).write.mode("append").parquet(in.toString)
      stamp += 60000
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.list(in)) {
        _.iterator().asScala.toSeq
      }.filter(_.getFileName.toString.endsWith(".parquet"))
        .sortBy(p => java.nio.file.Files.getLastModifiedTime(p).toMillis)
        .lastOption.foreach(p => java.nio.file.Files.setLastModifiedTime(
          p, java.nio.file.attribute.FileTime.fromMillis(stamp)))
    }
    def runOnce(): Unit = {
      val stream = spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1).parquet(in.toString)
        .withColumn("ts_utc", timestamp_micros(col("doc_id") * 1000000L))
        .withWatermark("ts_utc", "10 seconds")
      val o = Sync.streamingDupReportsTtl(stream, "doc_id", "text",
        "ts_utc", horizonUs = 50L * 1000000L)
      val q = o.writeStream.outputMode("append").format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ck.toString).start()
      q.processAllAvailable(); q.stop()
    }
    stage(b1); stage(b2)
    runOnce()
    val afterStop = spark.read.parquet(out.toString)
      .as[(Long, Long)].collect().toSet
    assert(afterStop == Set((30L, 10L)),
      s"pre-stop emissions wrong: $afterStop")
    stage(b3)
    runOnce() // NEW query, SAME checkpoint
    val finalRows = spark.read.parquet(out.toString)
      .as[(Long, Long)].collect().toList
    // exactly-once: (30,10) appears ONCE; state restored: (55,10) is
    // attributed across the restart (55−10 = 45 ≤ 50). The chain
    // rule's canonical only advances on an OUT-of-horizon arrival, so
    // 55 stays a dup of 10, and 95 (95−10 = 85 > 50) silently becomes
    // the new canonical — unreported.
    assert(finalRows.sorted == List((30L, 10L), (55L, 10L)),
      s"resumed emissions wrong: $finalRows")
  }

  test("restart-resume twin: resumed final table equals the " +
      "uninterrupted single-run table on the same batches") {
    // single uninterrupted run over the same three batches
    val root = tmp("graft-r14-single")
    val in = root.resolve("in"); val out = root.resolve("out")
    val ck = root.resolve("ck")
    java.nio.file.Files.createDirectories(in)
    val all = Seq(
      Seq((10L, "dup A"), (11L, "unique b1")),
      Seq((30L, "dup A"), (31L, "unique b2")),
      Seq((55L, "dup A"), (95L, "dup A")))
    var stamp = 1700000000000L
    all.foreach { rows =>
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(in.toString)
      stamp += 60000
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.list(in)) {
        _.iterator().asScala.toSeq
      }.filter(_.getFileName.toString.endsWith(".parquet"))
        .sortBy(p => java.nio.file.Files.getLastModifiedTime(p).toMillis)
        .lastOption.foreach(p => java.nio.file.Files.setLastModifiedTime(
          p, java.nio.file.attribute.FileTime.fromMillis(stamp)))
    }
    val stream = spark.readStream.schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1).parquet(in.toString)
      .withColumn("ts_utc", timestamp_micros(col("doc_id") * 1000000L))
      .withWatermark("ts_utc", "10 seconds")
    val o = Sync.streamingDupReportsTtl(stream, "doc_id", "text",
      "ts_utc", horizonUs = 50L * 1000000L)
    val q = o.writeStream.outputMode("append").format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ck.toString).start()
    q.processAllAvailable(); q.stop()
    val single = spark.read.parquet(out.toString)
      .as[(Long, Long)].collect().toList.sorted
    assert(single == List((30L, 10L), (55L, 10L)),
      s"single-run emissions wrong: $single")
    // == the resumed run's final set from the previous test's scenario
  }

  test("fit-persist twins: read-back sidecar serving is row-for-row " +
      "equal to the session-cached fits") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    for ((persist, cached) <- Seq(
        "ann_pq_fit_persist" -> "ann_pq_tuned",
        "ivf_fit_persist" -> "ivf_tuned",
        "ann_fit_persist" -> "ann_tuned",
        "hybrid_fit_persist" -> "hybrid_tuned",
        "dedup_fit_persist" -> "dedup_tuned")) {
      val a = SparkEntry.queries(persist)(spark, dir)
      val b = SparkEntry.queries(cached)(spark, dir)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$persist diverges from $cached")
    }
  }
}
