package graft

import org.apache.spark.sql.functions._

import graft.search.{Ingest, SearchEngine}

class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("driver contract: entry() answers with rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registered views serve plain spark.sql analytics") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val got = spark.sql(
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY rev DESC LIMIT 3""".stripMargin)
      .collect()
    assert(got.length == 3)
    assert(got.map(_.getDouble(1)).toSeq ==
      got.map(_.getDouble(1)).sorted.reverse.toSeq)
  }

  test("multi-collection search with heterogeneous vector dims (risk 6)") {
    val cfg = graft.operators.Chunking.ChunkConfig(minTokens = 1, maxTokens = 50)
    val a = Ingest.buildChunks(
      Seq((1L, "tomato pasta recipe")).toDF("doc_id", "text"),
      "colA", "doc_id", "text", cfg = cfg, dim = 16)
    val b = Ingest.buildChunks(
      Seq((2L, "tomato garden soil")).toDF("doc_id", "text"),
      "colB", "doc_id", "text", cfg = cfg, dim = 32)
    // per-collection dims keep each sub-plan's query vector at the
    // collection's own dimension
    val req = SearchEngine.SearchRequest(query = "tomato",
      searchMode = "hybrid", k = 4, scoreThreshold = -1e9)
    val got = SearchEngine.searchMany(Seq("colA" -> a, "colB" -> b), req,
      dims = Map("colA" -> 16, "colB" -> 32)).collect()
    assert(got.map(_.getAs[String]("collection_id")).toSet ==
      Set("colA", "colB"))
  }
}
