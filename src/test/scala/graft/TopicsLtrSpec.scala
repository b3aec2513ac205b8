package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Ltr, TextAnalysis}

/** c-TF-IDF topic labeling, asymmetric containment dedup, and the LTR
  * feature helpers — the wave-6 operator family. */
class TopicsLtrSpec extends SparkSpec {
  import spark.implicits._

  test("classTfIdf surfaces each class's characteristic terms first " +
      "and never a cross-class common term") {
    val docs = Seq(
      ("wiki", "quantum physics quantum theory common"),
      ("wiki", "quantum entanglement physics common"),
      ("forum", "gaming console gaming controller common"),
      ("forum", "gaming stream console common")).toDF("source", "text")
    val got = TextAnalysis.classTfIdf(docs, "source", "text", k = 2)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getString(2), r.getLong(3))).toMap
    // tf(quantum|wiki)=3 dominates; "common" (f=4 across classes) gets
    // the smallest ln(1+A/f) and can't outrank the class terms
    assert(got(("wiki", 1))._1 == "quantum" && got(("wiki", 1))._2 == 3L)
    assert(got(("forum", 1))._1 == "gaming" && got(("forum", 1))._2 == 3L)
    assert(!got.values.map(_._1).toSet.contains("common"))
  }

  test("classTfIdf rank ties break on term asc (the TopK contract)") {
    val docs = Seq(("a", "zebra apple")).toDF("source", "text")
    val got = TextAnalysis.classTfIdf(docs, "source", "text", k = 2)
      .collect().map(r => r.getInt(1) -> r.getString(2)).toMap
    assert(got(1) == "apple" && got(2) == "zebra")
  }

  test("containment flags the excerpt->source direction that Jaccard " +
      "misses, and only above the threshold") {
    val source = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val excerpt = "alpha beta gamma delta epsilon zeta eta"
    val docs = Seq(
      (1L, source), (2L, excerpt),
      (3L, "totally unrelated words about cooking pasta sauce"))
      .toDF("doc_id", "text")
    val got = Dedup.containment(docs, "doc_id", "text", n = 3,
        maxDf = 50L, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // excerpt (5 shingles) fully inside source (18 shingles): C(2->1)=1
    assert(got((2L, 1L)) == ((5L, 5L, 1.0)), got.toString)
    // reverse direction: 5/18 < 0.8 — absent; unrelated doc absent
    assert(!got.contains((1L, 2L)) && !got.keySet.exists(
      p => p._1 == 3L || p._2 == 3L))
  }

  test("containment: the df prune bounds candidates but the value is " +
      "computed over FULL shingle sets (a boilerplate shingle above " +
      "maxDf can't create a pair, yet still counts for matched pairs)") {
    // shared shingle "xx yy zz" has df=3 > maxDf=2 -> no pair via it;
    // docs 1/2 also share "pp qq rr" (df=2) -> candidate; intersection
    // counts BOTH shared shingles (tokens need len>=2 to survive F1)
    val docs = Seq(
      (1L, "pp qq rr ss xx yy zz"),
      (2L, "pp qq rr tt xx yy zz"),
      (3L, "uu vv ww aa xx yy zz")).toDF("doc_id", "text")
    val got = Dedup.containment(docs, "doc_id", "text", n = 3,
        maxDf = 2L, threshold = 0.1, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got.keySet == Set((1L, 2L), (2L, 1L)), got.toString)
    // doc1 shingles: pqr,qrs,rsx,sxy,xyz; doc2: pqr,qrt,rtx,txy,xyz
    // intersection = {pqr, xyz} = 2 — xyz counted despite the prune
    assert(got((1L, 2L)) == 2L)
  }

  test("Ltr.minMaxNorm maps [min,max] to [0,1]; constant column to 1.0") {
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "s")
    val got = Ltr.minMaxNorm(df, "s", "f").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got == Map(1L -> 0.0, 2L -> 0.5, 3L -> 1.0))
    val const = Ltr.minMaxNorm(Seq((1L, 5.0), (2L, 5.0)).toDF("id", "s"),
      "s", "f").collect().map(_.getDouble(2))
    assert(const.forall(_ == 1.0))
  }

  test("Ltr.linearScore sums w*f left-to-right in declared order") {
    val df = Seq((1L, 1.0, 0.5, 0.25)).toDF("id", "a", "b", "c")
    val got = Ltr.linearScore(df,
      Seq("a" -> 0.7, "b" -> 0.2, "c" -> 0.1), "s")
      .collect().head.getDouble(4)
    assert(got == 0.7 * 1.0 + 0.2 * 0.5 + 0.1 * 0.25)
  }

  test("spanCorruption: sentinels splice back to the original token " +
      "stream; span counts and noise bounds hold on a varied corpus") {
    import graft.functions.TextFunctions
    val docs = (0 until 30).map { i =>
      (i.toLong, (0 until 20 + i * 3).map(j => s"word${(j * 7 + i) % 50}")
        .mkString(" "))
    }.toDF("doc_id", "text")
    val rows = graft.operators.TextAnalysis
      .spanCorruption(docs, "doc_id", "text", every = 10, span = 3)
      .collect()
    assert(rows.length == 30)
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val sentinel = "<extra_id_(\\d+)>".r
    rows.foreach { r =>
      val (id, nTokens, nMasked, nSpans) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val (inputs, targets) = (r.getString(5), r.getString(6))
      // every run masks at least one token (overlapping anchors merge
      // runs, so a run can exceed `span`; doc-end truncation can
      // shorten it — the splice equality below is the exact check)
      assert(nMasked >= nSpans, s"doc $id")
      assert(sentinel.findAllIn(inputs).size == nSpans, s"doc $id")
      assert(sentinel.findAllIn(targets).size == nSpans, s"doc $id")
      // splice targets into inputs at each sentinel -> original stream
      val spanToks = scala.collection.mutable.Map.empty[Int, Seq[String]]
      var cur = -1
      targets.split(" ").filter(_.nonEmpty).foreach {
        case s if s.startsWith("<extra_id_") =>
          cur = sentinel.findFirstMatchIn(s).get.group(1).toInt
          spanToks(cur) = Nil
        case t => spanToks(cur) = spanToks(cur) :+ t
      }
      val spliced = inputs.split(" ").filter(_.nonEmpty).flatMap {
        case s if s.startsWith("<extra_id_") =>
          spanToks(sentinel.findFirstMatchIn(s).get.group(1).toInt)
        case t => Seq(t)
      }.toSeq
      val orig = TextFunctions.tokenize(texts(id),
        removeStopwords = false)
      assert(spliced == orig, s"doc $id splice mismatch")
      assert(nTokens == orig.size)
    }
    // the corpus-level density lands near span/every = 0.3
    val frac = rows.map(_.getLong(2)).sum.toDouble /
      rows.map(_.getLong(1)).sum
    assert(frac > 0.15 && frac < 0.45, s"density $frac")
  }

  test("CORI: the collection holding the query terms outranks the " +
      "term-free one, which sits exactly at the belief floor 0.4") {
    import graft.operators.Cori
    val docs = Seq(
      ("phys", 1L, "quantum physics experiment quantum theory"),
      ("phys", 2L, "quantum entanglement result"),
      ("cook", 3L, "pasta sauce tomato basil"),
      ("cook", 4L, "oven roast pepper salt"))
      .toDF("source", "doc_id", "text")
    val got = Cori.selectCollections(docs, "source", "doc_id", "text",
        Seq("quantum"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("phys") > got("cook"), got.toString)
    assert(got("cook") == 0.4) // df = 0 -> p = b exactly
  }
}
