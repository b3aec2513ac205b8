package graft

import graft.functions.TextFunctions
import graft.operators.TextRank

/** TextRank keyword extraction: scores must match a local power
  * iteration over the same graph, be bit-stable across partitionings,
  * and rank graph-central tokens above merely-frequent ones. */
class TextRankSpec extends SparkSpec {
  import spark.implicits._

  /** Independent local replay: same tokenize, same undirected
    * adjacency graph, same fixed-iteration update. */
  private def localTextRank(texts: Seq[String], minCount: Long,
                            iterations: Int): Map[String, Double] = {
    val pairs = texts.flatMap { t =>
      val toks = TextFunctions.tokenize(t)
      toks.sliding(2).collect {
        case Seq(a, b) if a != b =>
          (if (a < b) (a, b) else (b, a))
      }
    }
    val und = pairs.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= minCount).toMap
    val adj = und.toSeq.flatMap { case ((a, b), w) =>
      Seq((a, (b, w)), (b, (a, w)))
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = adj.view.mapValues(_.map(_._2).sum).toMap
    var s = adj.keys.map(_ -> 1.0).toMap
    for (_ <- 1 to iterations) {
      s = adj.map { case (v, nbrs) =>
        // sorted fold — the operator's pinned summation order
        var acc = 0.0
        nbrs.sortBy(_._1).foreach { case (u, w) =>
          acc += (w.toDouble / deg(u)) * s(u)
        }
        v -> (1.0 - 0.85 + 0.85 * acc)
      }
    }
    s.map { case (k, v) =>
      k -> BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
  }

  private val texts = Seq(
    "spark shuffles data across the cluster when spark joins data",
    "the cluster joins data with spark and shuffles rows",
    "rows move across the cluster when a join shuffles data",
    "a broadcast join avoids the shuffle entirely",
    "data quality matters more than data volume")

  test("scores equal the local power iteration, at every partitioning") {
    val expect = localTextRank(texts, minCount = 1L, iterations = 8)
    for (p <- Seq(1, 5)) {
      val got = TextRank.keywords(
          texts.toDF("text").repartition(p), "text",
          minCount = 1L, iterations = 8, topK = 1000)
        .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
      assert(got == expect, s"p=$p\n got=$got\n exp=$expect")
    }
  }

  test("rank order is (score desc, token asc) starting at 1") {
    val rows = TextRank.keywords(texts.toDF("text"), "text",
      minCount = 1L, iterations = 8, topK = 10).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length))
    val byScore = rows.map(r => (-r.getDouble(2), r.getString(1))).toSeq
    assert(byScore == byScore.sorted)
  }

  test("a hub token outranks an equally frequent leaf token") {
    // 'hub' is adjacent to many distinct tokens; 'leaf' repeats the
    // same neighbor — same frequency, different centrality
    val docs = (0 until 20).map(i => s"hub w$i") ++
      (0 until 20).map(_ => "leaf anchor")
    val got = TextRank.keywords(docs.toDF("text"), "text",
        minCount = 1L, iterations = 8, topK = 100)
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(got("hub") > got("leaf"), got.toString)
  }

  test("minCount prunes tail edges before the loop; empty graph is " +
      "an empty relation") {
    val got = TextRank.keywords(texts.toDF("text"), "text",
      minCount = 100L, iterations = 3, topK = 10)
    assert(got.collect().isEmpty)
  }
}
