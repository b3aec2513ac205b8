package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bm25, Knn, Spell, TextRank}
import graft.search.{Ingest, QuerySyntax}

/** Round-13 durability and dispatch-gate equivalences:
  *
  *  - the four standing search artifacts (postings / gate tokens /
  *    positional postings / spell vocabulary) must survive a parquet
  *    generation round-trip and serve the query-syntax search and the
  *    did-you-mean correction IDENTICALLY to the in-memory relations
  *    (VERDICT r12 #4 — "standing" means surviving a restart)
  *  - pageRank's byte-budget gate must refuse the driver fold for
  *    long-key graphs and still produce the RDD loop's bit-identical
  *    ranks (ADVICE r12 — the 1M-edge bound alone under-protects
  *    when vertex ids are long strings)
  *  - mutualTopK must ACCEPT every declared integral id type now that
  *    the guard compares DataTypes (ADVICE r12: the old typeName list
  *    carried dead entries)
  */
class Round13Spec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark streaming data big data table"),
    (2L, "customer table error data spark"),
    (3L, "big data spark hash join table"),
    (4L, "table spark data big data hash"),
    (5L, "hash spark big data table window"),
    (6L, "spark data error table hash big data")
  ).toDF("doc_id", "text")

  test("the four search sidecars round-trip a generation bit-exactly " +
      "and serve query-syntax + spell from the restored files") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-r13-idx").toString
    val posts = Bm25.postings(corpus, "doc_id", "text")
    val gates = corpus.select(col("doc_id").as("id"),
        explode(graft.functions.TextFunctions.tokensCol(col("text"),
          removeStopwords = false)).as("tok"))
      .distinct()
    val postoks = corpus.select(col("doc_id"),
      posexplode(graft.functions.TextFunctions.tokensCol(col("text"),
        removeStopwords = false)).as(Seq("pos", "tok")))
    val vocab = Spell.vocabulary(corpus, "doc_id", "text")
    Ingest.reindexSwapRaw(spark, posts, s"$root/postings")
    Ingest.reindexSwapRaw(spark, gates, s"$root/gatetoks")
    Ingest.reindexSwapRaw(spark, postoks, s"$root/postoks")
    Ingest.reindexSwapRaw(spark, vocab, s"$root/vocab")

    val rPosts = Ingest.readCurrent(spark, s"$root/postings")
    val rGates = Ingest.readCurrent(spark, s"$root/gatetoks")
    val rPostoks = Ingest.readCurrent(spark, s"$root/postoks")
    val rVocab = Ingest.readCurrent(spark, s"$root/vocab")

    // relation-level round-trip: exact row multiset per artifact
    Seq((posts, rPosts), (gates, rGates), (postoks, rPostoks),
        (vocab, rVocab)).foreach { case (orig, restored) =>
      assert(orig.exceptAll(restored).isEmpty &&
        restored.exceptAll(orig).isEmpty)
    }

    // serving-level round-trip: the query-syntax capstone from the
    // RESTORED standing equals the in-memory standing row-for-row
    val q = "\"big data\"~3 +table -error spark^2 hash"
    def run(st: QuerySyntax.Standing) =
      QuerySyntax.search(corpus, "doc_id", "text", q, k = 5,
          standing = Some(st))
        .select(col("id"), round(col("score"), 6).as("score"))
        .orderBy(col("score").desc, col("id"))
        .collect().toSeq
    val mem = run(QuerySyntax.Standing(Bm25.Standing(posts, gates),
      postoks))
    val disk = run(QuerySyntax.Standing(Bm25.Standing(rPosts, rGates),
      rPostoks))
    assert(mem.nonEmpty && mem == disk)

    // the vocabulary sidecar serves the same correction
    val inputs = Seq("sprk").toDF("q")
    val memCorr = Spell.didYouMean(vocab, inputs, "q")
      .select("suggestion").collect().map(_.getString(0)).toSeq
    val diskCorr = Spell.didYouMean(rVocab, inputs, "q")
      .select("suggestion").collect().map(_.getString(0)).toSeq
    assert(memCorr == Seq("spark") && diskCorr == memCorr)
  }

  test("pageRank byte-budget gate: long-key graphs refuse the driver " +
      "fold and the RDD loop is bit-identical anyway") {
    val longA = "x" * 2000 + "a"
    val longB = "y" * 2000 + "b"
    val longC = "z" * 2000 + "c"
    val edges = Seq((longA, longB, 3L), (longB, longC, 1L),
      (longA, longC, 2L)).toDF("a", "b", "w")
    // 3 edges x ~4000 chars x 2 B >> 8 KiB budget -> RDD path; the
    // unconstrained call folds on the driver. The 1e-12 fixed-point
    // grid makes the two bit-identical.
    val viaRdd = TextRank.pageRank(edges, iterations = 3,
        driverFoldMaxBytes = 8L * 1024)
      .orderBy("id").collect().map(r => (r.getString(0), r.getDouble(1)))
    val viaFold = TextRank.pageRank(edges, iterations = 3)
      .orderBy("id").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(viaRdd.toSeq == viaFold.toSeq && viaRdd.length == 3)
  }

  test("gateIds fuses must/mustNot membership verdicts bit-equal to " +
      "the chained semi/anti-join gates") {
    val posts = corpus.select(col("doc_id"),
      posexplode(graft.functions.TextFunctions.tokensCol(col("text"),
        removeStopwords = false)).as(Seq("pos", "tok")))
    val phrases = Seq(Seq("big", "data"))
    val must = Seq("table")
    val mustNot = Seq("error")
    // chained form: phrase gate, then must membership, then anti-join
    val hasTok = (w: String) => posts.filter(col("tok") === w)
      .select("doc_id").distinct()
    val chained = corpus
      .join(graft.operators.Phrase
          .phraseSearch(corpus, "doc_id", "text", phrases.head)
        .select("doc_id"), Seq("doc_id"), "left_semi")
      .join(hasTok("table"), Seq("doc_id"), "left_semi")
      .join(hasTok("error"), Seq("doc_id"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val fused = graft.operators.Phrase
      .gateIds(posts, phrases, Nil, must = must, mustNot = mustNot)
      .collect().map(_.getLong(0)).toSet
    assert(fused == chained && fused.nonEmpty)
    // a positive gate is REQUIRED — pure must_not would wrongly
    // exclude docs containing none of the gate words
    intercept[IllegalArgumentException] {
      graft.operators.Phrase.gateIds(posts, Nil, Nil,
        mustNot = Seq("error"))
    }
  }

  test("searchBooleanTree's fused must+mustNot gate equals the " +
      "anti-then-semi chain, and the standing QuerySyntax path " +
      "equals the inline path") {
    // old chain replicated by hand: anti-join banned, semi-join must
    val toks = corpus.select(col("doc_id").as("id"),
      explode(graft.functions.TextFunctions.tokensCol(col("text"),
        removeStopwords = false)).as("tok"))
    val banned = toks.filter(col("tok") === "error")
      .select(col("id").as("doc_id")).distinct()
    val mustSat = toks.filter(col("tok") === "table")
      .groupBy("id").agg(countDistinct("tok").as("n"))
      .filter(col("n") === 1).select(col("id").as("doc_id"))
    val oldEligible = corpus
      .join(banned, Seq("doc_id"), "left_anti")
      .join(mustSat, Seq("doc_id"), "left_semi")
    val viaOld = Bm25.searchBooleanTree(oldEligible, "doc_id", "text",
        "spark hash", must = Nil, should = Nil, mustNot = Nil,
        shouldBoost = 0.0, k = 5)
      .select(col("id"), round(col("score"), 6).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaFused = Bm25.searchBooleanTree(corpus, "doc_id", "text",
        "spark hash", must = Seq("table"), should = Nil,
        mustNot = Seq("error"), shouldBoost = 0.0, k = 5)
      .select(col("id"), round(col("score"), 6).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaFused == viaOld && viaFused.nonEmpty)

    // end-to-end: the standing path (ALL gates in one gateIds pass)
    // equals the inline path row-for-row
    val posts = Bm25.postings(corpus, "doc_id", "text")
    val gates = toks.distinct()
    val postoks = corpus.select(col("doc_id"),
      posexplode(graft.functions.TextFunctions.tokensCol(col("text"),
        removeStopwords = false)).as(Seq("pos", "tok")))
    val q = "\"big data\"~3 +table -error spark^2 hash"
    def run(st: Option[QuerySyntax.Standing]) =
      QuerySyntax.search(corpus, "doc_id", "text", q, k = 5,
          standing = st)
        .select(col("id"), round(col("score"), 6).as("s"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val standing = run(Some(QuerySyntax.Standing(
      Bm25.Standing(posts, gates), postoks)))
    val inline = run(None)
    assert(standing == inline && standing.nonEmpty)
  }

  test("fused gateIds equals the chained gates on seeded-random " +
      "corpora and gate trees (the property form of the equivalence)") {
    val rnd = new scala.util.Random(13L)
    val vocabWords = Seq("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    (1 to 6).foreach { trial =>
      val docs = (1L to 40L).map { id =>
        val n = 3 + rnd.nextInt(12)
        (id, Seq.fill(n)(vocabWords(rnd.nextInt(vocabWords.size)))
          .mkString(" "))
      }.toDF("doc_id", "text")
      val posts = docs.select(col("doc_id"),
        posexplode(graft.functions.TextFunctions.tokensCol(col("text"),
          removeStopwords = false)).as(Seq("pos", "tok")))
      val ph = Seq(vocabWords(rnd.nextInt(4)), vocabWords(rnd.nextInt(4)))
      val must = Seq(vocabWords(4 + rnd.nextInt(2)))
      val mustNot = Seq(vocabWords(6 + rnd.nextInt(2)))
      val hasTok = (w: String) => posts.filter(col("tok") === w)
        .select("doc_id").distinct()
      val chained = docs
        .join(graft.operators.Phrase
            .phraseSearch(docs, "doc_id", "text", ph)
          .select("doc_id"), Seq("doc_id"), "left_semi")
        .join(hasTok(must.head), Seq("doc_id"), "left_semi")
        .join(hasTok(mustNot.head), Seq("doc_id"), "left_anti")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val fused = graft.operators.Phrase
        .gateIds(posts, Seq(ph), Nil, must = must, mustNot = mustNot)
        .collect().map(_.getLong(0)).toSet
      assert(fused == chained,
        s"trial $trial: phrase=$ph must=$must mustNot=$mustNot " +
          s"fused=$fused chained=$chained")
    }
  }

  test("mutualTopK accepts every declared integral id type") {
    val centroids = Seq(Array.fill(4)(0.0), Array.fill(4)(1.0))
    Seq("int", "bigint", "smallint", "tinyint").foreach { tpe =>
      val vecs = Seq((1L, Array.fill(4)(1.0f)), (2L, Array.fill(4)(1.0f)))
        .toDF("id", "vec")
        .select(col("id").cast(tpe).as("id"), col("vec"))
      val out = Knn.mutualTopK(vecs, "id", "vec", centroids, k = 1)
      assert(out.columns.contains("id_a") && out.count() >= 0)
    }
    val strIds = Seq(("a", Array.fill(4)(1.0f))).toDF("id", "vec")
    val e = intercept[IllegalArgumentException] {
      Knn.mutualTopK(strIds, "id", "vec", centroids, k = 1)
    }
    assert(e.getMessage.contains("integral id column"))
  }
}
