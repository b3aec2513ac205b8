package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{BenchmarkRunner, TopK}

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def windowReference(scored: org.apache.spark.sql.DataFrame,
                              k: Int) = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("chunk_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "chunk_id", "score")
  }

  test("perGroup matches the rank-window reference exactly") {
    val rnd = new scala.util.Random(42)
    val rows = for {
      q <- 1 to 7
      i <- 1 to 500
    } yield (s"q$q", s"d${i % 60}", f"c$i%04d-$q", rnd.nextInt(50) / 10.0)
    val scored = rows.toDF("query_id", "doc_id", "chunk_id", "score")
      .repartition(13) // force many partial buffers per query
    val got = TopK.perGroup(scored, "query_id", 10)
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    val exp = windowReference(scored, 10)
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    assert(got.length == 70)
    assert(got.toSeq == exp.toSeq)
  }

  test("perGroup handles groups smaller than k and duplicate scores") {
    val scored = Seq(
      ("a", "d1", "c1", 1.0), ("a", "d1", "c2", 1.0), ("a", "d2", "c3", 1.0),
      ("b", "d3", "c9", 0.0))
      .toDF("query_id", "doc_id", "chunk_id", "score").repartition(5)
    val got = TopK.perGroup(scored, "query_id", 10)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(3)))
    // ties break on chunk_id ascending, deterministically
    assert(got.toSeq == Seq(("a", 1, "c1"), ("a", 2, "c2"), ("a", 3, "c3"),
      ("b", 1, "c9")))
  }

  test("perGroup plan keeps the partial aggregation below the exchange") {
    val scored = Seq(("a", "d1", "c1", 1.0))
      .toDF("query_id", "doc_id", "chunk_id", "score")
    val plan = TopK.perGroup(scored, "query_id", 5)
      .queryExecution.executedPlan.toString
    // the partial aggregate must sit BELOW the exchange (map-side top-k)
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning(query_id")
    assert(exchangeIdx >= 0, s"no hash exchange in:\n$plan")
    val below = plan.substring(exchangeIdx)
    assert(below.contains("ObjectHashAggregate") ||
      below.contains("SortAggregate"),
      s"no partial aggregate below the exchange in:\n$plan")
  }

  test("denseRuns/sparseRuns/hybridRuns still produce ranked runs") {
    val docs = Seq(
      (1L, "spark shuffle join performance guide"),
      (2L, "tomato sauce recipe with basil"),
      (3L, "broadcast join strategies in spark"),
      (4L, "watering tomato plants in summer"))
      .toDF("doc_id", "text")
    val chunks = search.Ingest.buildChunks(docs, "c", "doc_id", "text",
      "recursive", operators.Chunking.ChunkConfig(minTokens = 1,
        maxTokens = 50), dim = 16).cache()
    val queries = Seq((1, "spark join"), (2, "tomato plants"))
      .toDF("query_id", "query_text")
    for (mode <- Seq("dense", "sparse", "hybrid")) {
      val runs = mode match {
        case "dense" => BenchmarkRunner.denseRuns(chunks, queries, 3, 16)
        case "sparse" => BenchmarkRunner.sparseRuns(chunks, queries, 3)
        case "hybrid" => BenchmarkRunner.hybridRuns(chunks, queries, 3, 16)
      }
      val rows = runs.collect()
      assert(rows.nonEmpty, s"$mode produced no runs")
      val byQ = rows.groupBy(_.getAs[Int]("query_id"))
      byQ.foreach { case (_, rs) =>
        val ranks = rs.map(_.getAs[Int]("rank")).sorted
        assert(ranks.toSeq == (1 to ranks.length).toSeq,
          s"$mode ranks not dense: ${ranks.toSeq}")
        // ranks follow score desc
        val byRank = rs.sortBy(_.getAs[Int]("rank"))
          .map(_.getAs[Double]("score"))
        assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
      }
    }
  }
}
