package graft

import org.apache.spark.sql.functions._

import graft.functions.{VectorExpressions, VectorFunctions => V}

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.0, 6.0)),
    (2L, Array(0.0f, 0.0f, 0.0f), Array(1.0, 0.0, 0.0)),
    (3L, Array(-1.5f, 2.5f, 0.5f), Array(2.0, -1.0, 3.0)))
    .toDF("id", "f", "d")

  test("codegen dot/cosine match the interpreted HOF forms") {
    val got = vecs.select($"id",
        V.dot($"f", $"d").as("dot"),
        V.dotHof($"f", $"d").as("dot_hof"),
        V.cosine($"f", $"d").as("cos"))
      .collect()
    got.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-12,
        s"id ${r.getLong(0)}")
    }
    val m = got.map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(3))).toMap
    assert(m(1L)._1 == 1.0 * 4 + 2 * 5 + 3 * 6)
    assert(m(2L)._2 == 0.0) // zero-norm guard
    // mixed float/float arrays
    val ff = vecs.select(V.dot($"f", $"f").as("x")).collect().map(_.getDouble(0))
    assert(math.abs(ff(0) - 14.0) < 1e-6)
  }

  test("null inputs propagate null") {
    val df = Seq((Some(Array(1.0f)), None: Option[Array[Float]]))
      .toDF("a", "b")
    val r = df.select(V.dot($"a", $"b")).head()
    assert(r.isNullAt(0))
  }

  test("SQL registration: vec_dot / vec_cosine") {
    VectorExpressions.register(spark)
    vecs.createOrReplaceTempView("vt")
    val r = spark.sql("SELECT vec_dot(f, d) AS x, vec_cosine(f, f) AS c FROM vt WHERE id = 1")
      .head()
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("whole-stage codegen covers the scoring projection") {
    // LocalTableScan would pre-compute; use a Range source so the
    // projection actually plans into a codegen stage
    val df = spark.range(1000).select(
      array($"id".cast("float"), lit(2.0f)).as("a"),
      array(lit(3.0f), $"id".cast("float")).as("b"))
    val scored = df.select(V.cosine($"a", $"b").as("s"))
    // '*(n)' marks a WholeStageCodegen stage in the plan string; the
    // Project carrying cosinesimilarity must sit inside one
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("cosinesimilarity"),
      s"plan:\n$plan")
    assert(scored.count() == 1000)
  }
}
