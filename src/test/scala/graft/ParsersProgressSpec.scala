package graft

import org.apache.spark.sql.functions._

import graft.sources.Parsers
import graft.streaming.Progress

class ParsersProgressSpec extends SparkSpec {
  import spark.implicits._

  test("parser registry: first-match dispatch and stub handling (S8)") {
    val files = Seq(
      ("a", "# md doc", ".md"),
      ("b", "print('hi')", ".py"),
      ("c", "<html><script>x=1</script><p>hello world</p></html>", ".html"),
      ("d", "plain", ".txt"),
      ("e", "%PDF-1.4 ...", ".pdf"),
      ("f", "unknown ext", ".xyz"),
      ("g", "old word binary", ".doc"),
      ("h", "not a zip", ".docx"))
      .map { case (id, body, ext) => (id, body.getBytes("UTF-8"), ext) }
      .toDF("doc_id", "content", "extension")
    val got = Parsers.parse(files).collect()
      .map(r => r.getString(0) ->
        (r.getAs[String]("parser"), r.getAs[String]("text"),
          r.getAs[String]("parse_status"))).toMap
    assert(got("a")._1 == "markdown" && got("a")._2 == "# md doc")
    assert(got("b")._1 == "code")
    assert(got("c")._1 == "html")
    assert(got("c")._2.contains("hello world") && !got("c")._2.contains("<p>") &&
      !got("c")._2.contains("x=1")) // scripts and tags stripped
    assert(got("d")._1 == "text")
    // a PDF header with no content streams parses to empty, not stub
    assert(got("e")._1 == "pdf" && got("e")._2 == "" &&
      got("e")._3 == "empty")
    assert(got("f")._1 == "text") // fallback parser
    // non-CFB bytes under a legacy OLE extension: typed magic failure
    assert(got("g")._1 == "doc" && got("g")._2 == "" &&
      got("g")._3 == "error:not_ole")
    assert(got("h")._1 == "docx" && got("h")._2 == "" &&
      got("h")._3 == "error:not_docx")
  }

  test("eml parser: body after first blank line; bad .msg typed error") {
    val files = Seq(
      ("a", "Subject: hi\r\nFrom: x@y\r\n\r\nbody line 1\n\nbody line 2",
        ".eml"),
      ("b", "Subject: only headers\r\nFrom: x@y", ".eml"), // no blank line
      ("c", "Subject: bare lf\nFrom: x@y\n\nunix body", ".eml"),
      ("d", "outlook ole blob", ".msg"))
      .map { case (id, body, ext) => (id, body.getBytes("UTF-8"), ext) }
      .toDF("doc_id", "content", "extension")
    val got = Parsers.parse(files).collect()
      .map(r => r.getString(0) ->
        (r.getAs[String]("parser"), r.getAs[String]("text"),
          r.getAs[String]("parse_status"))).toMap
    // body preserved exactly, including its own internal blank line
    assert(got("a") == (("eml", "body line 1\n\nbody line 2", "ok")))
    assert(got("b") == (("eml", "", "ok"))) // headers-only -> empty body
    assert(got("c") == (("eml", "unix body", "ok"))) // bare-LF separator
    assert(got("d") == (("msg", "", "error:not_ole")))
  }

  test("progress listener records started/batch/terminated (T4)") {
    val rec = Progress.attach(spark)
    try {
      val dir = java.nio.file.Files.createTempDirectory("pg").toString + "/in"
      val ck = java.nio.file.Files.createTempDirectory("pg").toString + "/ck"
      val rows = Seq((1L, "x")).toDF("id", "v")
      rows.write.parquet(dir)
      val q = spark.readStream.schema(rows.schema).parquet(dir)
        .writeStream.format("memory").queryName("pgq")
        .option("checkpointLocation", ck).start()
      q.processAllAvailable(); q.stop(); q.awaitTermination(30000)
      // listener delivery is async; give the bus a moment
      var tries = 0
      while (tries < 50 && !rec.events.exists(_.isInstanceOf[Progress.Terminated])) {
        Thread.sleep(100); tries += 1
      }
      val ev = rec.events
      assert(ev.exists(_.isInstanceOf[Progress.Started]))
      assert(ev.collect { case b: Progress.BatchCompleted => b.numInputRows }.sum >= 1)
      assert(ev.exists(_.isInstanceOf[Progress.Terminated]))
    } finally spark.streams.removeListener(rec)
  }

  test("J2 remap: sparse hits re-key to original_chunk_id") {
    import graft.search.SearchEngine
    val chunks = Seq(
      // derived sparse row indexed under its own id, pointing at c1
      ("c1_sparse", "c1", "d1", "tomato tomato recipe", 0, 1),
      ("c1", "c1", "d1", "tomato tomato recipe", 0, 1))
      .toDF("chunk_id", "original_chunk_id", "doc_id", "content",
        "chunk_index", "total_chunks")
      .withColumn("path", col("doc_id"))
      .withColumn("path_id", lit(null).cast("string"))
      .withColumn("vector", array(lit(1.0), lit(0.0)))
    val got = SearchEngine.sparseLeg(chunks,
      SearchEngine.SearchRequest(query = "tomato", searchMode = "sparse"),
      limit = 10)
    // every surviving hit carries an original id as its chunk_id
    assert(got.select("chunk_id").collect().map(_.getString(0)).toSet == Set("c1"))
  }
}
