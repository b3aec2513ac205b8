package graft

import org.apache.spark.sql.functions._

import graft.functions.{VectorExpressions, VectorFunctions => V}
import graft.operators.Knn
import graft.plans.{AnnLshRewrite, GraftExtensions}

/** The opt-in ANN LSH rewrite rule: plan mutation + result equivalence
  * with the explicit bucket filter. The shared test JVM already has a
  * session, so the rule attaches via experimental.extraOptimizations
  * (the extensions class covers fresh sessions — see last test). */
class AnnRuleSpec extends SparkSpec {

  private val Dim = 16
  private val NPlanes = 4

  private lazy val installed: Unit = {
    spark.experimental.extraOptimizations ++= Seq(AnnLshRewrite(spark))
    VectorExpressions.register(spark)
  }

  private def bucketed() = {
    installed
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), slice(col("embedding"), 1, Dim).as("vec"))
    emb.withColumn("_lsh_bucket",
      Knn.lshBucket(col("vec"), Knn.hyperplanes(NPlanes, Dim)))
  }

  private def topk(df: org.apache.spark.sql.DataFrame, q: Array[Double]) =
    df.withColumn("score", V.cosine(col("vec"), array(q.map(lit): _*)))
      .orderBy(col("score").desc)
      .limit(10)

  test("rule off: plan unchanged; rule on: bucket filter injected") {
    spark.conf.set("spark.graft.ann.lshPlanes", NPlanes.toString)
    val q = graft.functions.TextFunctions.mockEmbeddingDouble("probe", Dim)
    val df = bucketed()

    spark.conf.set("spark.graft.ann.lshRewrite", "false")
    val off = topk(df, q).queryExecution.optimizedPlan.toString
    assert(!off.contains("_lsh_bucket = "), off)

    spark.conf.set("spark.graft.ann.lshRewrite", "true")
    try {
      val plan = topk(df, q).queryExecution.optimizedPlan.toString
      assert(plan.contains("Filter (_lsh_bucket"), plan)

      // equivalence: rewritten result == explicit bucket-filtered topk
      val viaRule = topk(df, q).collect().map(_.getLong(0)).toSeq
      spark.conf.set("spark.graft.ann.lshRewrite", "false")
      val planes = Knn.hyperplanes(NPlanes, Dim)
      var b = 0L
      planes.zipWithIndex.foreach { case (h, i) =>
        if (V.dotS(q, h) >= 0.0) b |= (1L << i)
      }
      val explicit = topk(df.filter(col("_lsh_bucket") === b), q)
        .collect().map(_.getLong(0)).toSeq
      assert(viaRule == explicit)
      assert(viaRule.nonEmpty)
    } finally spark.conf.set("spark.graft.ann.lshRewrite", "false")
  }

  test("SQL functions available after registration") {
    bucketed().createOrReplaceTempView("bv")
    val r = spark.sql(
      "SELECT vec_cosine(vec, vec) AS c, vec_dot(vec, vec) AS d FROM bv LIMIT 1")
      .head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
    assert(r.getDouble(1) > 0.0)
  }

  test("GraftExtensions wires into a SparkSessionExtensions instance") {
    // fresh-session path: injection itself must not throw
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
