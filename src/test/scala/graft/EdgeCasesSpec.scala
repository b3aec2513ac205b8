package graft

import org.apache.spark.sql.functions._

import graft.operators._
import graft.search.{Ingest, SearchEngine}

/** Degenerate-input sweep: empty corpora, empty queries, single rows —
  * every operator must return an empty/benign result, never throw. */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emptyDocs =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val oneDoc = Seq((1L, "solo document text")).toDF("doc_id", "text")

  test("BM25 over an empty corpus") {
    assert(Bm25.corpusStats(emptyDocs, "doc_id", "text").count() == 0)
    assert(Bm25.searchTopK(emptyDocs, "doc_id", "text", "q", 5).count() == 0)
    // stopword-only / OOV query over a real corpus
    assert(Bm25.searchTopK(oneDoc, "doc_id", "text", "the and of", 5)
      .count() == 0)
    assert(Bm25.searchTopK(oneDoc, "doc_id", "text", "", 5).count() == 0)
  }

  test("dedup family over empty and single-doc corpora") {
    assert(Dedup.exact(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.minhashNearDups(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.minhashNearDups(oneDoc, "doc_id", "text").count() == 0)
    assert(Dedup.simhashNearDups(oneDoc, "doc_id", "text").count() == 0)
    val e = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Dedup.embeddingNearDups(e, "vec_id", "embedding", 8).count() == 0)
  }

  test("round-2 operators over empty and degenerate inputs") {
    val emptyPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    // components of an empty graph
    assert(Dedup.connectedComponents(emptyPairs).count() == 0)
    // cluster resolution with no pairs: everyone is a kept singleton
    val res = Dedup.resolveClusters(oneDoc, "doc_id", emptyPairs).collect()
    assert(res.length == 1 && res.head.getBoolean(3))
    // contamination against an empty eval set / of an empty train set
    assert(Dedup.contamination(oneDoc, "doc_id", "text",
      emptyDocs, "doc_id", "text").collect()
      .forall(r => r.getLong(1) == 0 && !r.getBoolean(2)))
    assert(Dedup.contamination(emptyDocs, "doc_id", "text",
      oneDoc, "doc_id", "text").count() == 0)
    // packing an empty corpus / a corpus of empty texts
    assert(TextAnalysis.packSequences(emptyDocs, "doc_id", "text", 10)
      .count() == 0)
    val blank = Seq((1L, ""), (2L, "  ")).toDF("doc_id", "text")
    val packed = TextAnalysis.packSequences(blank, "doc_id", "text", 10)
      .collect()
    assert(packed.length == 2 &&
      packed.forall(r => r.getLong(1) == 0 && r.getLong(2) == 0))
    // hash split of an empty frame
    assert(TextAnalysis.hashSplit(emptyDocs, "doc_id",
      Seq("a" -> 0.5, "b" -> 0.5)).count() == 0)
    // incremental stats merge of an empty batch is the identity
    val st = graft.streaming.Sync.emptyBm25State(spark)
    val (t1, g1) = graft.streaming.Sync.mergeBm25Stats(st._1, st._2,
      emptyDocs, "doc_id", "text")
    assert(t1.count() == 0)
    assert(g1.head().getLong(0) == 0L)
  }

  test("r8 text/sampling operators over empty and degenerate inputs") {
    // collocations: empty corpus and a corpus with no bigrams
    assert(TextAnalysis.collocations(emptyDocs, "text").count() == 0)
    assert(TextAnalysis.collocations(
      Seq((1L, "word")).toDF("doc_id", "text"), "text").count() == 0)
    // distinctiveTerms: empty corpus
    assert(TextAnalysis.distinctiveTerms(
      Seq.empty[(String, String)].toDF("source", "text"),
      "source", "text").count() == 0)
    // driftPsi: one side empty — every share is eps-only, terms finite
    val vals = Seq(10.0, 60.0).toDF("v")
    val empt = Seq.empty[Double].toDF("v")
    val oneSided = TextAnalysis.driftPsi(vals, empt, "v", 50.0).collect()
    assert(oneSided.forall(r => !r.getDouble(3).isNaN &&
      !r.getDouble(3).isInfinity))
    // ngramCoverage: eval docs too short for any shingle -> empty
    assert(Dedup.ngramCoverage(oneDoc, "doc_id", "text",
      Seq((9L, "aa bb")).toDF("doc_id", "text"), "doc_id", "text").count() == 0)
    // deterministicShuffle / groupedRank over empty input
    assert(Sampling.deterministicShuffle(emptyDocs, "doc_id").count() == 0)
    assert(Sampling.groupedRank(
      Seq.empty[(Long, String)].toDF("doc_id", "g")
        .withColumn("k", col("doc_id").cast("string")),
      "g", "k").count() == 0)
    // temperatureResample refuses an empty corpus loudly
    val ex = intercept[IllegalArgumentException] {
      Sampling.temperatureResample(
        emptyDocs.withColumn("g", lit("a")), "g", "doc_id", 10L)
    }
    assert(ex.getMessage.contains("empty"))
  }

  test("kNN over empty vectors; k larger than corpus") {
    val e = Seq.empty[(Long, Array[Float])].toDF("id", "vec")
    assert(Knn.bruteForceTopK(e, "id", "vec", Array(1.0, 0.0), 5).count() == 0)
    val one = Seq((1L, Array(1.0f, 0.0f))).toDF("id", "vec")
    assert(Knn.bruteForceTopK(one, "id", "vec", Array(1.0, 0.0), 100)
      .count() == 1)
  }

  test("search over an empty chunks table") {
    val chunks = Ingest.buildChunks(emptyDocs, "c", "doc_id", "text",
      cfg = Chunking.ChunkConfig(minTokens = 1), dim = 8)
    for (mode <- Seq("dense", "sparse", "hybrid")) {
      val got = SearchEngine.search(chunks,
        SearchEngine.SearchRequest(query = "q", searchMode = mode,
          vectorDim = 8))
      assert(got.count() == 0, s"mode $mode")
    }
    // reranker path on empty input
    assert(SearchEngine.search(chunks,
      SearchEngine.SearchRequest(query = "q", searchMode = "hybrid",
        useReranker = true, vectorDim = 8)).count() == 0)
  }

  test("metrics with empty runs or empty qrels") {
    val emptyRuns = Seq.empty[(Int, Int, String)]
      .toDF("query_id", "rank", "doc_id")
    val qrels = Seq((1, "a", 2)).toDF("query_id", "doc_id", "grade")
    assert(IrMetrics.perQuery(emptyRuns, qrels).count() == 0)
    val runs = Seq((1, 1, "a")).toDF("query_id", "rank", "doc_id")
    val emptyQrels = Seq.empty[(Int, String, Int)]
      .toDF("query_id", "doc_id", "grade")
    val m = IrMetrics.perQuery(runs, emptyQrels).collect()
      .map(r => r.getString(1) -> r.getDouble(3)).toMap
    assert(m.values.forall(_ == 0.0)) // no ground truth -> all zeros
  }

  test("RAKE / langId / quality / chunkers over empty and whitespace") {
    assert(Rake.extract("   \n\t  ").isEmpty)
    val ws = Seq((1L, "   ")).toDF("doc_id", "text")
    assert(Rake.extractKeywords(ws, "doc_id", "text").count() == 0)
    val q = TextAnalysis.qualitySignals(ws, "doc_id", "text").head()
    assert(q.getAs[Long]("n_tokens") == 0L)
    assert(Chunking.character("   ", Chunking.ChunkConfig()).isEmpty)
    assert(Chunking.recursive("", Chunking.ChunkConfig()).isEmpty)
    assert(Chunking.markdown(null, Chunking.ChunkConfig()).isEmpty)
    assert(Chunking.semantic("", Chunking.ChunkConfig()).isEmpty)
    assert(Chunking.hierarchical("", Chunking.ChunkConfig()).isEmpty)
  }

  test("fixedWindows / PQ / int8 over empty and degenerate inputs") {
    import graft.operators.{Pq, Quant}
    // empty and whitespace-only docs
    val docs = Seq((1L, ""), (2L, " ")).toDF("doc_id", "text")
    val fw = Chunking.fixedWindows(docs, "doc_id", "text",
      Chunking.ChunkConfig(maxTokens = 10, overlapTokens = 2))
    assert(fw.count() == 1) // empty drops; whitespace is one window
    // overlap >= window is rejected, not looped
    assertThrows[IllegalArgumentException] {
      Chunking.fixedWindows(docs, "doc_id", "text",
        Chunking.ChunkConfig(maxTokens = 10, overlapTokens = 10,
          charsPerToken = 1))
    }
    // PQ/int8 over a constant corpus: codes still bounded + deterministic
    val const = (0 until 8).map(i => (i.toLong, Seq.fill(8)(0.0f)))
      .toDF("vec_id", "embedding")
    val cb = Pq.fit(const, "vec_id", "embedding", 8, m = 2, k = 2)
    val codes = Pq.encode(const, "embedding", cb)
      .select("codes").as[Seq[Int]].collect()
    assert(codes.forall(_.forall(c => c >= 0 && c < 2)))
    val scales = Quant.fitInt8(const, "embedding", 8)
    assert(scales.forall(_ == 1.0)) // all-zero dims -> neutral scale
    val enc = const.select(Quant.encodeInt8(col("embedding"), scales)
      .as("codes")).as[Seq[Int]].collect()
    assert(enc.forall(_.forall(_ == 0)))
  }

  test("RRF with both sides empty; projection guards") {
    val empty = Seq.empty[(String, Double)].toDF("id", "score")
    assert(Rrf.fuse(empty, empty, "id", "score", 10).count() == 0)
    assertThrows[IllegalArgumentException] {
      Projection.fitPca(
        Seq((1L, Array(1.0f))).toDF("id", "v"), "v", 1, 10)
    }
  }
}
