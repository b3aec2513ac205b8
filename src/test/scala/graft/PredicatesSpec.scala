package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Predicates

/** Predicate-language cases from FIXTURES.md §4 /
  * packages/shared/pipeline/predicates.py:7-18,203-244. */
class PredicatesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val refs = Seq(
    // (uri, mime_type, extension, size_bytes, is_code, lang)
    ("f1", "application/pdf", ".pdf", 20000000L, false, "en"),
    ("f2", "text/markdown", ".md", 1000L, false, "zh"),
    ("f3", "image/png", ".png", 5000L, false, "en"),
    ("f4", "text/x-python", ".py", 300L, true, "en"),
    ("f5", null, ".txt", 99L, false, null))
    .toDF("uri", "mime_type", "extension", "size_bytes", "is_code", "lang")
    .withColumn("metadata", struct(
      struct(col("lang").as("language")).as("source"),
      struct(col("is_code").as("is_code")).as("detected")))

  private def matchUris(pred: Map[String, Any]): Seq[String] =
    refs.filter(Predicates.compile(pred)).select("uri")
      .as[String].collect().toSeq.sorted

  test("exact match") {
    assert(matchUris(Map("mime_type" -> "application/pdf")) == Seq("f1"))
  }
  test("glob pattern") {
    assert(matchUris(Map("mime_type" -> "application/*")) == Seq("f1"))
    assert(matchUris(Map("mime_type" -> "text/*")) == Seq("f2", "f4"))
    assert(matchUris(Map("extension" -> ".p?")) == Seq("f4"))
  }
  test("negation (null never matches)") {
    // f5 has null mime_type -> excluded even under negation
    assert(matchUris(Map("mime_type" -> "!image/*")) == Seq("f1", "f2", "f4"))
  }
  test("numeric comparison") {
    assert(matchUris(Map("size_bytes" -> ">10000000")) == Seq("f1"))
    assert(matchUris(Map("size_bytes" -> "<=1000")) == Seq("f2", "f4", "f5"))
    assert(matchUris(Map("size_bytes" -> "!=1000")) ==
      Seq("f1", "f3", "f4", "f5"))
  }
  test("array is OR") {
    assert(matchUris(Map("extension" -> Seq(".md", ".txt"))) == Seq("f2", "f5"))
  }
  test("nested dot-path and legacy translation") {
    assert(matchUris(Map("metadata.source.language" -> "zh")) == Seq("f2"))
    assert(matchUris(Map("source_metadata.language" -> "zh")) == Seq("f2"))
    assert(matchUris(Map("metadata.detected.is_code" -> true)) == Seq("f4"))
  }
  test("catch-all and AND of fields") {
    assert(matchUris(Map.empty) == Seq("f1", "f2", "f3", "f4", "f5"))
    assert(matchUris(Map("mime_type" -> "text/*", "size_bytes" -> "<500")) ==
      Seq("f4"))
  }
  test("first-match-wins routing") {
    val route = Predicates.firstMatchRoute(Seq(
      "pdf" -> Map("mime_type" -> "application/pdf"),
      "text" -> Map("mime_type" -> "text/*"),
      "rest" -> Map.empty))
    val got = refs.select(col("uri"), route.as("route"))
      .as[(String, String)].collect().toMap
    assert(got == Map("f1" -> "pdf", "f2" -> "text", "f3" -> "rest",
      "f4" -> "text", "f5" -> "rest"))
  }
  test("parallel fan-out routing returns all matches") {
    val routes = Predicates.allMatchesRoute(Seq(
      "big" -> Map("size_bytes" -> ">4000"),
      "img" -> Map("mime_type" -> "image/*")))
    val got = refs.select(col("uri"), routes.as("r"))
      .as[(String, Seq[String])].collect().toMap
    assert(got("f1") == Seq("big"))
    assert(got("f3") == Seq("big", "img"))
    assert(got("f4") == Seq.empty)
  }
}
