package graft

import org.apache.spark.sql.functions._

import graft.operators.{BenchmarkRunner, Projection}
import graft.pipeline.Dag
import graft.pipeline.Dag.{Edge, Node, PipelineDag}
import graft.search.Ingest

class DagSpec extends SparkSpec {
  import spark.implicits._

  private val valid = PipelineDag("d1",
    nodes = Seq(
      Node("parse", Dag.NodeType.Parser),
      Node("chunk", Dag.NodeType.Chunker,
        Map("strategy" -> "recursive", "min_tokens" -> "1",
          "max_tokens" -> "50", "overlap_tokens" -> "0")),
      Node("embed", Dag.NodeType.Embedder, Map("dim" -> "16"))),
    edges = Seq(
      Edge(Dag.Source, "parse"),
      Edge("parse", "chunk"),
      Edge("chunk", "embed")))

  test("valid DAG passes all rules") {
    assert(Dag.validate(valid).isEmpty)
  }

  test("validation: each rule fires") {
    // no embedder
    assert(Dag.validate(valid.copy(nodes = valid.nodes.filterNot(
      _.nodeType == Dag.NodeType.Embedder),
      edges = valid.edges.take(2)))
      .exists(_.contains("exactly one embedder")))
    // two embedders
    assert(Dag.validate(valid.copy(nodes =
      valid.nodes :+ Node("embed2", Dag.NodeType.Embedder)))
      .exists(_.contains("exactly one embedder")))
    // unknown edge ref
    assert(Dag.validate(valid.copy(edges =
      valid.edges :+ Edge("ghost", "embed")))
      .exists(_.contains("unknown node")))
    // unreachable node
    assert(Dag.validate(valid.copy(nodes =
      valid.nodes :+ Node("island", Dag.NodeType.Parser)))
      .exists(_.contains("unreachable")))
    // cycle
    assert(Dag.validate(valid.copy(edges =
      valid.edges :+ Edge("embed", "parse")))
      .exists(_.contains("cycle")))
    // no catch-all from _source
    assert(Dag.validate(valid.copy(edges =
      Edge(Dag.Source, "parse", when = Map("mime_type" -> "text/*")) +:
        valid.edges.tail))
      .exists(_.contains("catch-all")))
    // duplicate ids
    assert(Dag.validate(valid.copy(nodes =
      valid.nodes :+ Node("parse", Dag.NodeType.Parser)))
      .exists(_.contains("duplicate")))
    // duplicate parallel path names
    assert(Dag.validate(valid.copy(edges = valid.edges ++ Seq(
      Edge(Dag.Source, "chunk", parallel = true, pathName = Some("p")),
      Edge(Dag.Source, "embed", parallel = true, pathName = Some("p")))))
      .exists(_.contains("duplicate path_names")))
  }

  test("execute: single path chunk+embed lineage") {
    val files = Seq(("1", "alpha beta. " * 30), ("2", "tiny"))
      .toDF("doc_id", "text")
    val out = Dag.execute(valid, files)
    assert(out.columns.toSeq == Seq("doc_id", "text", "vector", "path_id"))
    val rows = out.collect()
    assert(rows.forall(_.getString(3) == "parse"))
    assert(rows.count(_.getString(0) == "1") > 1) // doc 1 chunked
    assert(rows.forall(r => r.getSeq[Double](2).length == 16))
  }

  test("execute: parallel fan-out tags path_id per route") {
    val dag = PipelineDag("d2",
      nodes = Seq(
        Node("chunkA", Dag.NodeType.Chunker,
          Map("strategy" -> "recursive", "min_tokens" -> "1",
            "max_tokens" -> "1000")),
        Node("chunkB", Dag.NodeType.Chunker,
          Map("strategy" -> "character", "min_tokens" -> "1",
            "max_tokens" -> "1000")),
        Node("embed", Dag.NodeType.Embedder, Map("dim" -> "8"))),
      edges = Seq(
        Edge(Dag.Source, "chunkA"), // catch-all, non-parallel
        Edge(Dag.Source, "chunkB", parallel = true, pathName = Some("alt")),
        Edge("chunkA", "embed"),
        Edge("chunkB", "embed")))
    assert(Dag.validate(dag).isEmpty)
    val files = Seq(("1", "one two three")).toDF("doc_id", "text")
    val out = Dag.execute(dag, files).collect()
    assert(out.map(_.getString(3)).toSet == Set("chunkA", "alt"))
  }
}

class BenchmarkRunnerSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 16
  private lazy val chunks = Ingest.buildChunks(
    Seq((1L, "spark shuffle join tuning"),
      (2L, "tomato pasta recipe with basil"),
      (3L, "spark streaming watermark state"),
      (4L, "gardening tomato plants guide")).toDF("doc_id", "text"),
    "c1", "doc_id", "text",
    cfg = graft.operators.Chunking.ChunkConfig(minTokens = 1, maxTokens = 50),
    dim = Dim).cache()

  private lazy val queries = Seq((1, "tomato"), (2, "spark join"))
    .toDF("query_id", "query_text")
  private lazy val qrels = Seq((1, "2", 3), (1, "4", 1), (2, "1", 2))
    .toDF("query_id", "doc_id", "grade")

  test("sparse batch runs rank the term-matching docs per query") {
    val runs = BenchmarkRunner.sparseRuns(chunks, queries, k = 5).collect()
    val q1 = runs.filter(_.getInt(0) == 1).map(_.getString(2)).toSet
    assert(q1 == Set("2", "4"))
    val q2 = runs.filter(_.getInt(0) == 2).map(_.getString(2)).toSet
    assert(q2 == Set("1", "3")) // both spark docs share 'spark'
    // ranks are dense 1..n per query
    assert(runs.filter(_.getInt(0) == 1).map(_.getInt(1)).sorted.toSeq ==
      Seq(1, 2))
  }

  test("dense batch runs score all queries in one plan") {
    val runs = BenchmarkRunner.denseRuns(chunks, queries, k = 3, Dim)
    val got = runs.collect()
    assert(got.map(_.getInt(0)).toSet == Set(1, 2))
    got.groupBy(_.getInt(0)).foreach { case (_, rs) =>
      assert(rs.length == 3)
      assert(rs.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3))
    }
  }

  test("hybrid fuses per query and evaluate produces macro metrics") {
    val m = BenchmarkRunner.evaluate(chunks, queries, qrels,
        mode = "hybrid", k = 4, dim = Dim, kValues = Seq(5))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(m.keySet == Set(("precision", 5), ("recall", 5), ("ndcg", 5),
      ("mrr", 0), ("ap", 0)))
    assert(m.values.forall(_._2 == 2L)) // both queries graded
    // every relevant doc appears in the k=4 hybrid run: recall = 1
    assert(m(("recall", 5))._1 == 1.0)
    assert(m(("mrr", 0))._1 > 0.0)
  }
}

class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("PCA recovers the dominant axis of an anisotropic cloud") {
    // points along direction (3,1,0)/|.| with small orthogonal jitter
    val pts = (0 until 200).map { i =>
      val t = (i - 100) / 10.0
      val jitter = ((i * 37) % 11 - 5) / 50.0
      (i.toLong, Array((3 * t + jitter).toFloat, (t - 3 * jitter).toFloat,
        0.1f * (i % 3)))
    }.toDF("id", "vec")
    val (mean, pc1, _) = Projection.fitPca(pts, "vec", 3)
    val dir = math.sqrt(10.0)
    assert(math.abs(math.abs(pc1(0)) - 3 / dir) < 0.05, pc1.toSeq)
    assert(math.abs(math.abs(pc1(1)) - 1 / dir) < 0.05)
    assert(pc1.max > 0) // sign convention
    // projection is deterministic and centered
    val proj = Projection.project(pts, "id", "vec", mean, pc1,
      Array(0.0, 0.0, 1.0)).collect()
    val xs = proj.map(_.getDouble(1))
    assert(math.abs(xs.sum / xs.length) < 1e-6)
  }

  test("pca2d over the test embeddings table") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val got = Projection.pca2d(emb, "vec_id", "embedding", 64,
      sampleLimit = 500)
    assert(got.count() == 500)
    assert(got.columns.toSeq == Seq("vec_id", "x", "y"))
    // deterministic across runs
    val a = got.orderBy("vec_id").limit(3).collect().map(_.getDouble(1)).toSeq
    val b = Projection.pca2d(emb, "vec_id", "embedding", 64, 500)
      .orderBy("vec_id").limit(3).collect().map(_.getDouble(1)).toSeq
    assert(a == b)
  }
}
