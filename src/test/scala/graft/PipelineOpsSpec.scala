package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Maintenance, Rake}
import graft.sources.Sources
import graft.streaming.Sync

class RakeSpec extends SparkSpec {
  import spark.implicits._

  test("RAKE golden: the classic Diophantine abstract") {
    val text = "Compatibility of systems of linear constraints over the " +
      "set of natural numbers. Criteria of compatibility of a system of " +
      "linear Diophantine equations, strict inequations, and nonstrict " +
      "inequations are considered."
    val got = Rake.extract(text, topK = 5)
    // 5-word run "linear diophantine equations strict inequations" is
    // dropped by max_words=4 BEFORE scoring (keyword_extractor.py:295)
    assert(got.map(_._1) == Seq("linear constraints", "natural numbers",
      "nonstrict inequations", "compatibility", "considered"))
    assert(got.take(3).forall(_._2 == 4.0))
    assert(got(3)._2 == 1.0)
  }

  test("RAKE edge cases") {
    assert(Rake.extract("").isEmpty)
    assert(Rake.extract("the of and").isEmpty) // all stopwords
    assert(Rake.extract("ab").isEmpty) // below min_chars
    // apostrophes stay within words; stopword contractions split
    val g = Rake.extract("don't panic about spark's optimizer")
    assert(g.exists(_._1 == "panic"))
  }

  test("DataFrame RAKE emits ranked keywords per doc") {
    val docs = Seq((1L, "spark query optimizer. spark shuffle service."),
      (2L, "")).toDF("doc_id", "text")
    val got = Rake.extractKeywords(docs, "doc_id", "text", topK = 3).collect()
    assert(got.forall(_.getString(0) == "1"))
    // two candidate phrases exist -> two ranked keywords
    assert(got.map(_.getInt(3)).sorted.toSeq == Seq(1, 2))
    assert(got.map(_.getString(1)).toSet ==
      Set("spark query optimizer", "spark shuffle service"))
  }
}

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("orphan vectors via left-anti (J5)") {
    val vectors = Seq((1L, "v1"), (2L, "v2"), (9L, "v9"))
      .toDF("doc_id", "payload")
    val docs = Seq(1L, 2L).toDF("doc_id")
    val got = Maintenance.orphanVectors(vectors, docs).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("collection counters and chunk stats (A6/A7)") {
    val chunks = Seq(
      ("c1", "d1", "hello", 5, Some(Seq(1.0f))),
      ("c1", "d1", "world!", 6, Some(Seq(1.0f))),
      ("c1", "d2", "x", 1, None),
      ("c2", "d3", "yy", 2, Some(Seq(0.5f))))
      .toDF("collection_id", "doc_id", "content", "token_count", "vector")
    val counters = Maintenance.collectionCounters(chunks).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(counters("c1") == ((2L, 3L, 12L, 2L)))
    assert(counters("c2") == ((1L, 1L, 2L, 1L)))
    val stats = Maintenance.chunkStats(chunks).head()
    assert(stats.getAs[Int]("min_tokens") == 1)
    assert(stats.getAs[Int]("max_tokens") == 6)
    assert(stats.getAs[Long]("total_tokens") == 14L)
  }

  test("doc_ref resolution tags matches (J8)") {
    val refs = Seq("u1", "u404").toDF("doc_ref")
    val docs = Seq(("u1", "d1")).toDF("uri", "doc_id")
    val got = Maintenance.resolveDocRefs(refs, docs).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(got == Map("u1" -> "matched", "u404" -> "unmatched"))
  }
}

class SourcesSpec extends SparkSpec {

  test("S1 scan + S7 decode + S9 sniff over a real directory") {
    val dir = Files.createTempDirectory("scan").toFile
    def write(name: String, body: String): Unit = {
      val f = new java.io.File(dir, name)
      f.getParentFile.mkdirs()
      Files.write(f.toPath, body.getBytes("UTF-8"))
    }
    write("a.md", "# Title\nplain words here")
    write("sub/b.json", """{"k": 1}""")
    write("c.py", "import os\ndef main():\n  pass\nclass X:\n  pass")
    write("skip.log", "noise")

    val got = Sources.loadFiles(spark, dir.toString,
        excludePattern = Some("\\.log$"))
      .collect().map(r => r.getAs[String]("filename") -> r).toMap
    assert(got.keySet == Set("a.md", "b.json", "c.py"))
    assert(got("a.md").getAs[String]("mime_type") == "text/markdown")
    assert(got("b.json").getAs[String]("extension") == ".json")
    val det = got("b.json").getStruct(got("b.json").fieldIndex("detected"))
    assert(det.getAs[Boolean]("is_structured_data"))
    assert(det.getAs[String]("structured_format") == "json")
    val code = got("c.py").getStruct(got("c.py").fieldIndex("detected"))
    assert(code.getAs[Boolean]("is_code"))
    assert(got("a.md").getAs[String]("content_hash").length == 64)
    assert(got("a.md").getAs[String]("text").startsWith("# Title"))
  }

  test("include glob prunes at listing time") {
    val dir = Files.createTempDirectory("scan2").toFile
    Files.write(new java.io.File(dir, "x.txt").toPath, "a".getBytes)
    Files.write(new java.io.File(dir, "y.bin").toPath, "b".getBytes)
    val got = Sources.scanDirectory(spark, dir.toString,
      includeGlob = Some("*.txt")).collect()
    assert(got.map(_.getAs[String]("filename")).toSeq == Seq("x.txt"))
  }
}

class SyncSpec extends SparkSpec {
  import spark.implicits._

  private def state(rows: (Long, String, String, String, Long, Boolean)*) =
    rows.toDF("doc_id", "uri", "content_hash", "status", "last_seen_at",
      "is_stale")
  private def batch(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "uri", "content_hash")

  test("mergeBatch: new / updated / unchanged / stale (T2)") {
    val s = state(
      (1L, "u1", "h1", "unchanged", 0L, false),
      (2L, "u2", "h2", "unchanged", 0L, false),
      (3L, "u3", "h3", "unchanged", 0L, false))
    val b = batch((1L, "u1", "h1"), (2L, "u2", "h2x"), (4L, "u4", "h4"))
    val m = Sync.mergeBatch(s, b, syncId = 7L).collect()
      .map(r => r.getLong(0) -> (r.getString(3), r.getLong(4), r.getBoolean(5)))
      .toMap
    assert(m(1L) == (("unchanged", 7L, false)))
    assert(m(2L) == (("updated", 7L, false)))
    assert(m(3L) == (("unchanged", 0L, true))) // not seen -> stale
    assert(m(4L) == (("new", 7L, false)))
    val proc = Sync.toProcess(Sync.mergeBatch(s, b, 7L))
      .select("doc_id").as[Long].collect().toSet
    assert(proc == Set(2L, 4L))
  }

  test("continuousSync drives merges through a file stream (T1)") {
    val inDir = Files.createTempDirectory("sync-in").toString
    val ckpt = Files.createTempDirectory("sync-ck").toString
    val stateRef = new java.util.concurrent.atomic.AtomicReference(
      state().toDF())
    batch((1L, "u1", "h1")).write.mode("append").parquet(inDir)
    val q = Sync.continuousSync(spark, inDir,
      batch().schema,
      () => stateRef.get(),
      df => stateRef.set(df.cache()),
      ckpt)
    q.awaitTermination(60000)
    val got = stateRef.get().collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got == Map(1L -> "new"))
  }

  test("error classification and backoff (T5)") {
    assert(Sync.classifyError("Connection timed out") == "transient")
    assert(Sync.classifyError("HTTP 429 Too Many Requests") == "transient")
    assert(Sync.classifyError("schema mismatch") == "permanent")
    assert(Sync.retryBackoffSeconds(0) == 1.0)
    assert(Sync.retryBackoffSeconds(3) == 8.0)
    assert(Sync.retryBackoffSeconds(20) == 300.0) // capped
    assert(Sync.shouldHalt(Seq(false, false, true, false, false), 3) == false)
    assert(Sync.shouldHalt(Seq(true, false, false, false), 3) == true)
  }

  test("classifyErrorCol agrees with the driver-side classifier (T5)") {
    import spark.implicits._
    val msgs = Seq("Connection timed out", "HTTP 429 Too Many Requests",
      "schema mismatch", "Service Unavailable", "rate limit exceeded",
      "disk full", "gateway returned 502", "TEMPORARILY offline", "", null)
    val got = msgs.toDF("msg")
      .select(Sync.classifyErrorCol(org.apache.spark.sql.functions.col("msg")))
      .as[String].collect()
    assert(got.toSeq == msgs.map(Sync.classifyError),
      "column twin diverges from Sync.classifyError")
  }
}

/** T4 counter semantics (ref executor_types.py:200-246): the
  * ExecutionResult aggregation and its outcome-partition invariant. */
class ExecutorStatsSpec extends SparkSpec {
  import spark.implicits._
  import graft.pipeline.Executor

  test("executionStats partitions outcomes and counts chunks for successes only") {
    val files = Seq(
      ("c1", "succeeded", 5L), ("c1", "succeeded", 3L),
      ("c1", "failed", 7L), // chunks from a failed file must NOT count
      ("c1", "skipped", 0L),
      ("c2", "succeeded", 2L))
      .toDF("collection_id", "status", "chunks")
    val got = Executor.executionStats(files).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got("c1") == ((4L, 2L, 1L, 1L, 8L)))
    assert(got("c2") == ((1L, 1L, 0L, 0L, 2L)))
    // the reference's post-init invariant holds by construction
    got.values.foreach { case (p, s, f, k, _) => assert(s + f + k <= p) }
  }

  test("invalidOutcomes surfaces rows outside the outcome partition") {
    val files = Seq(("c1", "succeeded", 1L), ("c1", "exploded", 1L))
      .toDF("collection_id", "status", "chunks")
    val bad = Executor.invalidOutcomes(files).collect()
    assert(bad.length == 1 && bad.head.getString(1) == "exploded")
  }
}
