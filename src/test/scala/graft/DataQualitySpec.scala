package graft

import graft.operators.DataQuality._

/** Deequ-style expectation suite: exact metrics on a frame with known
  * defects, declaration-order output, and the one-pass plan shape. */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Some(1L), Some("a"), Some(10.0)),
    (Some(2L), Some("b"), Some(200.0)),
    (Some(2L), None, Some(30.0)),
    (Some(4L), Some("zz"), None))
    .toDF("id", "cat", "v")

  test("metrics are exact shares and verdicts honor thresholds") {
    val got = check(df, Seq(
      Completeness("cat", 0.75),       // 3/4 = 0.75 -> pass (>=)
      Completeness("v", 0.9),          // 0.75 -> fail
      Distinctness("id", 1.0),         // 3 distinct / 4 non-null -> fail
      Between("v", 0.0, 100.0, 0.5),   // 2/4 -> pass
      InSet("cat", Seq("a", "b"), 0.6) // 2/4 -> fail (nulls+zz fail)
    )).collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
      r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
    assert(got.toSeq == Seq(
      (0, "completeness", "cat", 0.75, 0.75, true),
      (1, "completeness", "v", 0.75, 0.9, false),
      (2, "distinctness", "id", 0.75, 1.0, false),
      (3, "between", "v", 0.5, 0.5, true),
      (4, "in_set", "cat", 0.5, 0.6, false)), got.toSeq)
  }

  test("a unique key column scores distinctness 1.0 and passes") {
    val got = check(df, Seq(Distinctness("cat", 1.0))).collect()(0)
    assert(got.getDouble(3) == 1.0 && got.getBoolean(5))
  }

  test("plan: one aggregation pass, no joins") {
    val p = check(df, Seq(
      Completeness("cat", 0.5), Between("v", 0.0, 100.0, 0.5),
      InSet("cat", Seq("a"), 0.1), Distinctness("id", 0.5)))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
  }

  test("empty or malformed rule sets are typed failures") {
    intercept[IllegalArgumentException](check(df, Seq.empty))
    intercept[IllegalArgumentException](
      check(df, Seq(Completeness("cat", 1.5))))
  }
}
