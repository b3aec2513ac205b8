package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Chunking
import graft.operators.Chunking.{ChunkConfig, ChunkOut}

class ChunkingSpec extends AnyFunSuite {

  private def invariants(content: String, chunks: Seq[ChunkOut]): Unit = {
    chunks.foreach { c =>
      assert(c.text == content.substring(c.start, c.end),
        s"substring invariant broken at chunk ${c.chunkIndex}")
      assert(c.text.trim.nonEmpty)
      assert(c.tokenCount == Chunking.countTokens(c.text))
    }
    chunks.sliding(2).foreach {
      case Seq(a, b) => assert(a.start < b.start, "offsets not monotone")
      case _ =>
    }
  }

  test("character: 1 MB doc bounds (BASELINE chunking fixture)") {
    // tests/performance/test_chunking_large_documents.py:12-28 —
    // chunk_size 1300 chars / overlap 200 chars == 325/50 tokens at 4 cpt
    val content = "This is a test sentence. " * 40000
    val cfg = ChunkConfig(minTokens = 100, maxTokens = 325, overlapTokens = 50)
    val t0 = System.nanoTime()
    val chunks = Chunking.character(content, cfg)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(chunks.size > 50, s"expected >50 chunks, got ${chunks.size}")
    chunks.foreach(c => assert(c.text.length <= 5000))
    invariants(content, chunks)
    assert(secs < 10.0, s"1MB chunking took ${secs}s")
    // overlap: consecutive chunks share text
    chunks.sliding(2).take(5).foreach {
      case Seq(a, b) => assert(b.start < a.end, "no overlap between chunks")
      case _ =>
    }
  }

  test("character: short doc below min tokens is one chunk") {
    val c = Chunking.character("tiny doc", ChunkConfig())
    assert(c.size == 1 && c.head.text == "tiny doc" && c.head.tokenCount == 2)
    assert(Chunking.character("", ChunkConfig()).isEmpty)
  }

  test("character: token cap enforced even for dense short words") {
    val content = ("a " * 5000).trim // 5000 tokens, 2 chars each
    val cfg = ChunkConfig(minTokens = 10, maxTokens = 100, overlapTokens = 10)
    val chunks = Chunking.character(content, cfg)
    chunks.foreach(c => assert(c.tokenCount <= 100))
    invariants(content, chunks)
  }

  test("character: giant single word is still split") {
    val content = "x" * 100000 // one 100k-char "word"
    val cfg = ChunkConfig(minTokens = 10, maxTokens = 100, overlapTokens = 0)
    val chunks = Chunking.character(content, cfg)
    assert(chunks.nonEmpty)
    chunks.foreach(c => assert(c.text.length <= 100 * 4 + 1))
    invariants(content, chunks)
  }

  test("recursive: splits on paragraph/sentence hierarchy and merges") {
    val para = "Sentence one. Sentence two. Sentence three."
    val content = Seq.fill(20)(para).mkString("\n\n")
    val cfg = ChunkConfig(minTokens = 1, maxTokens = 20, overlapTokens = 0)
    val chunks = Chunking.recursive(content, cfg)
    assert(chunks.size > 1)
    chunks.foreach(c => assert(c.tokenCount <= 20))
    invariants(content, chunks)
    // small doc -> single chunk
    val one = Chunking.recursive("just a few words", ChunkConfig())
    assert(one.size == 1)
  }

  test("markdown: sections keep their headers; falls back without headers") {
    val md =
      """# Title
        |intro text here
        |## Section A
        |alpha body content
        |## Section B
        |beta body content
        |""".stripMargin
    val cfg = ChunkConfig(minTokens = 1, maxTokens = 6, overlapTokens = 0)
    val chunks = Chunking.markdown(md, cfg)
    invariants(md, chunks)
    // every chunk that contains a section body starts at its header
    assert(chunks.exists(_.text.startsWith("# Title")))
    assert(chunks.exists(_.text.startsWith("## Section A")))
    // merging within budget: big budget puts everything in one chunk
    val merged = Chunking.markdown(md, ChunkConfig(minTokens = 1, maxTokens = 1000))
    assert(merged.size == 1)
    // no headers -> recursive behavior
    val plain = Chunking.markdown("no headers at all here", ChunkConfig())
    assert(plain.size == 1)
  }

  test("semantic: clusters sentences, respects max budget") {
    val content = "spark engine query plan. spark engine shuffle cost. " +
      "bananas are yellow fruit. bananas taste sweet."
    val cfg = ChunkConfig(minTokens = 4, maxTokens = 100, overlapTokens = 0,
      semanticThreshold = 0.25)
    val chunks = Chunking.semantic(content, cfg)
    invariants(content, chunks)
    // topic shift between 'shuffle cost.' and 'bananas' should break
    assert(chunks.size >= 2)
    assert(chunks.head.text.contains("spark"))
    assert(!chunks.head.text.contains("bananas"))
  }

  test("hierarchical: deterministic parent links and level sizes") {
    val content = ("word " * 5000).trim
    val cfg = ChunkConfig(hierarchicalSizes = Seq(2048, 512, 128))
    val rows = Chunking.hierarchical(content, cfg)
    val byLevel = rows.groupBy(_.level)
    assert(byLevel(0).size == 3) // ceil(5000/2048)
    assert(byLevel.keySet == Set(0, 1, 2))
    rows.filter(_.level == 0).foreach(r => assert(r.parentId == null))
    // every child's span is inside its parent's span
    val byId = rows.map(r => r.chunkId -> r).toMap
    rows.filter(_.level > 0).foreach { r =>
      val p = byId(r.parentId)
      assert(r.start >= p.start && r.end <= p.end)
      assert(p.level == r.level - 1)
    }
    // leaves obey size budget
    byLevel(2).foreach(r => assert(r.tokenCount <= 128))
  }

  test("hybrid: routes by the reference's analysis table") {
    // hybrid_strategy.py:210-340 routing semantics
    assert(Chunking.analyze("# Head\n\nplain body text").route == "markdown")
    // two signals (markdown + list structure) = mixed -> recursive
    assert(Chunking.analyze("# Head\n- a\n- b\ntext").route == "recursive")
    // code routes to markdown ("markdown handles code blocks well")
    assert(Chunking.analyze("```\ncode()\n```").route == "markdown")
    // list/table markers alone -> hierarchical
    assert(Chunking.analyze("items:\n- one\n- two").route == "hierarchical")
    // long sentences = narrative -> semantic
    val narrative = "This is a long narrative sentence that keeps going " +
      "well past fifty characters before it finally ends."
    assert(Chunking.analyze(narrative).route == "semantic")
    // short/unknown content -> character
    assert(Chunking.analyze("""{"k": 1}""").route == "character")
    assert(Chunking.analyze("plain narrative text with words").route == "character")
    val chunks = Chunking.hybrid("plain narrative text with words", ChunkConfig())
    assert(chunks.size == 1)
  }
}

/** DataFrame-surface chunking tests (flatMap wrapper). */
class ChunkingSparkSpec extends SparkSpec {
  import spark.implicits._

  test("chunkDocuments produces chunk rows for every doc") {
    val docs = Seq((1L, "one two three. " * 200), (2L, "short"))
      .toDF("doc_id", "text")
    val cfg = Chunking.ChunkConfig(minTokens = 10, maxTokens = 50,
      overlapTokens = 5)
    val rows = Chunking.chunkDocuments(docs, "doc_id", "text", "character", cfg)
    val byDoc = rows.collect().groupBy(_.getString(0))
    assert(byDoc("1").length > 1)
    assert(byDoc("2").length == 1)
    assert(rows.columns.toSeq == Seq("doc_id", "chunk_index", "text",
      "start_offset", "end_offset", "token_count"))
  }

  test("fixedWindows: exact closed-form windows, full coverage, overlap") {
    val text = ("alpha beta gamma. " * 60).trim // 1079 chars
    val docs = Seq((1L, text), (2L, ""), (3L, "tiny")).toDF("doc_id", "text")
    val cfg = Chunking.ChunkConfig(maxTokens = 40, overlapTokens = 5) // 160/140
    val rows = Chunking.fixedWindows(docs, "doc_id", "text", cfg)
      .orderBy("doc_id", "chunk_index").collect()
    val d1 = rows.filter(_.getString(0) == "1")
    // n = 1 + ceil((1079-160)/140) = 1 + 7
    assert(d1.length == 8)
    d1.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(1) == i)
      assert(r.getInt(3) == i * 140) // start
      assert(r.getInt(4) == math.min(i * 140 + 160, text.length)) // end
      assert(r.getString(2) == text.substring(r.getInt(3), r.getInt(4)))
      assert(r.getInt(5) == Chunking.countTokens(r.getString(2)))
    }
    // consecutive windows overlap by exactly 20 chars (except the tail)
    d1.sliding(2).foreach { case Array(a, b) =>
      assert(b.getInt(3) == a.getInt(3) + 140)
    }
    // empty doc drops; tiny doc is one full window
    assert(!rows.exists(_.getString(0) == "2"))
    val d3 = rows.filter(_.getString(0) == "3")
    assert(d3.length == 1 && d3.head.getString(2) == "tiny")
  }

  test("chunkHierarchical emits linked levels per doc") {
    val docs = Seq((7L, ("w " * 3000).trim)).toDF("doc_id", "text")
    val rows = Chunking.chunkHierarchical(docs, "doc_id", "text",
      Chunking.ChunkConfig(hierarchicalSizes = Seq(1024, 256)))
      .collect()
    assert(rows.exists(_.getInt(1) == 0) && rows.exists(_.getInt(1) == 1))
    val ids = rows.map(_.getString(2)).toSet
    rows.filter(_.getInt(1) == 1).foreach(r => assert(ids.contains(r.getString(3))))
    assert(rows.forall(_.getString(2).startsWith("7_")))
  }
}
