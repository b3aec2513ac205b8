package graft

import graft.operators.BenchmarkDatasets

class BenchmarkDatasetsSpec extends SparkSpec {
  import spark.implicits._

  test("judgment parsing: string/object refs, default grade, clamping") {
    val uploads = Seq(
      (1, "q one",
        """[{"doc_ref": "u1", "relevance_grade": 3},
          | {"doc_ref": {"uri": "u2"}},
          | {"doc_ref": "u3", "relevance_grade": 9},
          | {"doc_ref": "u4", "relevance_grade": -2}]""".stripMargin),
      (2, "q two", """[{"doc_ref": "v1", "relevance_grade": 0}]"""))
      .toDF("query_id", "query_text", "judgments_json")
    val got = BenchmarkDatasets.parseJudgments(uploads).collect()
      .map(r => (r.getInt(0), r.getString(2)) -> r.getInt(3)).toMap
    assert(got((1, "u1")) == 3)
    assert(got((1, "u2")) == 2) // object ref + default grade
    assert(got((1, "u3")) == 3) // clamped down
    assert(got((1, "u4")) == 0) // clamped up
    assert(got((2, "v1")) == 0)
    assert(got.size == 5)
  }

  test("parsed judgments feed the evaluator as qrels") {
    val uploads = Seq((7, "q", """[{"doc_ref": "d9", "relevance_grade": 2}]"""))
      .toDF("query_id", "query_text", "judgments_json")
    val qrels = BenchmarkDatasets.parseJudgments(uploads)
      .select($"query_id", $"doc_ref".as("doc_id"), $"grade")
    val runs = Seq((7, 1, "d9")).toDF("query_id", "rank", "doc_id")
    val m = graft.operators.IrMetrics.perQuery(runs, qrels, Seq(5))
      .collect().map(r => r.getString(1) -> r.getDouble(3)).toMap
    assert(m("recall") == 1.0 && m("mrr") == 1.0)
  }
}
