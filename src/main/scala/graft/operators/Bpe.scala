package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained byte-pair-encoding tokenizer (Sennrich 2016; the
  * GPT-2/cl100k family is the same algorithm over a fixed vocabulary).
  *
  * The reference counts tokens with tiktoken's pre-trained cl100k_base
  * vocabulary (`shared/chunking/unified/base.py:21-24`); that 1.7 MB
  * merge table cannot exist in this zero-egress build, so [[graft.operators.TextAnalysis.tokenCounts]]
  * ships declared approximations. This operator closes the gap from the
  * other direction: it TRAINS a BPE merge table from the corpus itself —
  * no external data file — and tokenizes with it, giving an exact,
  * reproducible, oracle-checkable subword tokenizer. The cl100k drop-in
  * path is [[mergeVocab]]: given ANY ordered merge table (one parquet of
  * (rank, left, right) — trained here or pretrained elsewhere), it
  * derives the word→symbols relation for ANY corpus by replaying the
  * merge schedule per word, so [[encode]]/[[budgetChunks]] no longer
  * require the vocabulary to have been trained on the corpus being
  * encoded; [[train]] is only needed when no merge table exists yet.
  *
  * Distributed shape (the standard large-corpus BPE recipe):
  *  - training runs over the DISTINCT-WORD table weighted by frequency,
  *    never the corpus: one `groupBy(word)` shuffle up front collapses a
  *    100 TB corpus to a bounded vocabulary relation (tens of millions
  *    of rows at web scale), and every merge iteration shuffles only
  *    that relation's symbol pairs;
  *  - each iteration is pair-count → argmax (a 1-row `TakeOrdered`
  *    collect — bounded) → merge applied word-locally (narrow);
  *  - the word relation is `localCheckpoint`'ed every iteration so the
  *    per-iteration argmax scans one materialized table instead of
  *    re-evaluating the whole merge chain (the [[Dedup.connectedComponents]]
  *    lineage discipline), and the superseded checkpoint is unpersisted;
  *  - encoding joins the corpus word stream against the trained
  *    word→symbols relation — broadcastable while the vocabulary is
  *    small, a plain shuffle join (Catalyst/AQE's call) beyond that.
  *
  * Words are `[A-Za-z]+|[0-9]+` runs (ASCII, matching the documented
  * ASCII-corpus assumption of the chunker oracles); merges never cross
  * word boundaries. Pair counts follow the classic learn-bpe counting:
  * every adjacent position counts (overlapping pairs included), while
  * merge application is leftmost-greedy non-overlapping. Ties in the
  * argmax break deterministically: (count DESC, left ASC, right ASC).
  */
object Bpe {

  /** ASCII word pattern — identical semantics in Java regex (Spark) and
    * RE2 (the DuckDB oracle). */
  val WordPattern = "[A-Za-z]+|[0-9]+"

  final case class Merge(rank: Int, left: String, right: String,
      pairCount: Long)

  final case class Trained(merges: Seq[Merge], vocab: DataFrame)

  private def words(docs: DataFrame, textCol: String): Column =
    regexp_extract_all(col(textCol), lit(WordPattern), lit(0))

  /** Distinct-word frequency relation: the one corpus-wide shuffle of
    * the whole training loop. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(words(docs, textCol)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Leftmost-greedy non-overlapping application of one merge —
    * Array in/out: this runs once per word per iteration in the
    * training loop, so no Seq wrapping/copying on the hot path. */
  private[operators] def applyMergeLocal(syms: Array[String], l: String,
      r: String): Array[String] = {
    val out = Array.newBuilder[String]
    out.sizeHint(syms.length)
    var i = 0
    val n = syms.length
    while (i < n) {
      if (i + 1 < n && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private final case class WordState(word: String, cnt: Long,
      syms: Array[String])

  /** Schedule-replay encoding of one word: apply the trained merges in
    * rank order (each a single leftmost-greedy non-overlapping pass —
    * the same [[applyMergeLocal]] the trainer uses), skipping merges
    * whose pair is not present. For a word that was IN the training
    * corpus this reproduces [[train]]'s final symbols exactly, because
    * training IS rank-order application; for an unseen word it is the
    * standard BPE encode loop (GPT-2's `bpe()` applies the
    * lowest-ranked present pair first, which equals rank-order replay
    * whenever the merge table is causally consistent — every merge's
    * operands exist before its rank — as trained tables are).
    *
    * Cost is independent of merge-table size: a min-heap of the ranks
    * of pairs PRESENT in the word (each rank entering at most once —
    * pops are non-decreasing, and a pair formed by applying rank r can
    * only carry a rank > r) makes this O(applications × |word|), so a
    * 100k-entry cl100k table costs the same per word as a 40-entry
    * trained one. */
  private[operators] def replayEncodeWord(word: String,
      ranks: collection.Map[(String, String), Int],
      byRank: collection.Map[Int, (String, String)]): Array[String] = {
    var syms: Array[String] = {
      val a = new Array[String](word.length)
      var i = 0
      while (i < word.length) { a(i) = String.valueOf(word.charAt(i)); i += 1 }
      a
    }
    if (syms.length < 2) return syms
    val pq = scala.collection.mutable.PriorityQueue.empty[Int](
      Ordering.Int.reverse)
    val seen = scala.collection.mutable.HashSet.empty[Int]
    def pushPresent(floor: Int): Unit = {
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))).foreach { rk =>
          if (rk > floor && seen.add(rk)) pq.enqueue(rk)
        }
        i += 1
      }
    }
    pushPresent(-1)
    while (pq.nonEmpty && syms.length > 1) {
      val rk = pq.dequeue()
      val (l, r) = byRank(rk)
      // the pair may have been destroyed by an earlier merge — the
      // single pass is then a no-op, exactly as rank-order would skip
      syms = applyMergeLocal(syms, l, r)
      pushPresent(rk)
    }
    syms
  }

  /** Word→symbols relation derived from the merge table ALONE — the
    * [[encode]]/[[budgetChunks]] vocabulary for a corpus the table was
    * NOT trained on (the cl100k drop-in path, and cross-corpus
    * tokenization generally). One distinct-word shuffle over the
    * corpus, then a narrow mapPartitions replaying the broadcast merge
    * schedule per distinct word — the corpus itself is never touched
    * again, and the merge table rides the broadcast, so this is one
    * job regardless of table size. Returns the same (word, cnt, syms)
    * shape as [[Trained.vocab]]; wrap as `Trained(merges, mergeVocab(...))`
    * and every downstream operator works unchanged. */
  def mergeVocab(docs: DataFrame, merges: Seq[Merge],
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.map(m =>
      (m.rank, m.left, m.right)))
    wordCounts(docs, textCol).as[(String, Long)]
      .mapPartitions { it =>
        val ms = bc.value
        val ranks = ms.map { case (rk, l, r) => ((l, r), rk) }.toMap
        val byRank = ms.map { case (rk, l, r) => (rk, (l, r)) }.toMap
        it.map { case (w, c) =>
          (w, c, replayEncodeWord(w, ranks, byRank).toSeq)
        }
      }.toDF("word", "cnt", "syms")
  }

  /** Train `nMerges` merges. Returns the ordered merge table and the
    * final word→symbols vocabulary relation (`word, cnt, syms`) — which
    * IS the encoding of every distinct word, so [[encode]] needs no
    * second merge pass.
    *
    * The loop body runs on the RDD layer deliberately (the spark.ml
    * fitter pattern — DataFrames at the edges, `treeAggregate` inside):
    * a Catalyst plan per merge iteration costs more in analysis/
    * optimization time than the iteration's actual work on the bounded
    * vocabulary relation, and the pair-count is a genuine per-partition
    * imperative aggregation. Each iteration is ONE shuffle-free job
    * (partial pair-count maps merged in a tree) plus one narrow
    * checkpoint materialization; the driver holds only the merged
    * distinct-pair counts, bounded by the vocabulary's adjacent-pair
    * set, never corpus-sized.
    *
    * A vocabulary too large for that driver map flips the argmax to
    * the RELATIONAL path: one `reduceByKey` over (pair, weight) plus a
    * distributed `takeOrdered(1)` per iteration — same argmax, same
    * tie-break, the driver holds one pair instead of the pair map.
    * The flip is decided by ONE distinct-pair probe before the loop
    * against `maxDriverPairs` (default 10^8 — tens of GB of driver
    * map is the practical ceiling; merges afterwards add at most
    * O(|words|) new pairs per iteration, so the initial probe is the
    * right scale signal). The corpus never re-enters the loop on
    * either path.
    *
    * `partitions` sizes the iterated relation: small for a bounded
    * vocabulary (cuts per-iteration task overhead), larger on a real
    * cluster where the distinct-word table is wide.
    */
  def train(docs: DataFrame, nMerges: Int, textCol: String = "text",
      partitions: Int = 8,
      maxDriverPairs: Long = 100000000L): Trained = {
    val spark = docs.sparkSession
    import spark.implicits._
    var cur = wordCounts(docs, textCol).as[(String, Long)].rdd
      .map { case (w, c) => WordState(w, c, w.map(_.toString).toArray) }
      .coalesce(partitions)
    cur.localCheckpoint()
    val pairOrd =
      Ordering.by[((String, String), Long), (Long, String, String)] {
        case ((pl, pr), pc) => (-pc, pl, pr)
      }
    // the probe is ALSO the action that materializes the first
    // checkpoint generation (the treeAggregate did that before)
    val relationalArgmax = cur.flatMap { ws =>
      (0 until ws.syms.length - 1).iterator
        .map(i => (ws.syms(i), ws.syms(i + 1)))
    }.distinct().count() > maxDriverPairs
    // The previous generation's checkpoint blocks stay pinned until the
    // CURRENT one is materialized (its truncated lineage needs them);
    // each generation is freed one iteration late, after the aggregate
    // that materialized its successor.
    var toFree: Option[org.apache.spark.rdd.RDD[WordState]] = None
    val merges = ArrayBuffer.empty[Merge]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      // classic counting: one count per adjacent position (overlaps
      // included), weighted by the word's corpus frequency. This
      // aggregate is ALSO the action that materializes cur's
      // checkpoint — one job per iteration, not two.
      val best: Option[((String, String), Long)] =
        if (relationalArgmax) {
          // scale path: distributed pair sum + top-1 — the driver
          // never holds the pair map
          cur.flatMap { ws =>
            (0 until ws.syms.length - 1).iterator
              .map(i => ((ws.syms(i), ws.syms(i + 1)), ws.cnt))
          }.reduceByKey(_ + _)
            .takeOrdered(1)(pairOrd)
            .headOption
        } else {
          val counts = cur.treeAggregate(
              scala.collection.mutable.HashMap.empty[(String, String), Long])(
            seqOp = { (acc, ws) =>
              var i = 0
              while (i < ws.syms.length - 1) {
                val k = (ws.syms(i), ws.syms(i + 1))
                acc.update(k, acc.getOrElse(k, 0L) + ws.cnt)
                i += 1
              }
              acc
            },
            combOp = { (a, b) =>
              b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }
              a
            })
          if (counts.isEmpty) None else Some(counts.min(pairOrd))
        }
      toFree.foreach(_.unpersist(blocking = false))
      toFree = None
      best match {
        case None => exhausted = true
        case Some(((l, r), c)) =>
          merges += Merge(rank, l, r, c)
          toFree = Some(cur)
          cur = cur.map(ws =>
            ws.copy(syms = applyMergeLocal(ws.syms, l, r)))
          cur.localCheckpoint()
          rank += 1
      }
    }
    cur.count() // materialize the final generation, then free its parent
    toFree.foreach(_.unpersist(blocking = false))
    val vocab = cur.map(ws => (ws.word, ws.cnt, ws.syms.toSeq))
      .toDF("word", "cnt", "syms")
    Trained(merges.toSeq, vocab)
  }

  /** Typed-failure guard for the vocabulary lookup joins: a corpus
    * word the vocabulary does not cover raises at execution time
    * (the [[graft.multimodal.Multimodal]] JdkCodec discipline) instead
    * of silently counting as 0 tokens or vanishing from a chunk span.
    * Never fires when the vocabulary was trained on the corpus being
    * encoded, or built for it via [[mergeVocab]]. */
  private def coveredSyms(wordCol: Column, nSymsCol: Column): Column =
    when(wordCol.isNotNull && nSymsCol.isNull,
      raise_error(concat(lit("BPE vocabulary does not cover word '"),
        wordCol,
        lit("'; train on this corpus or build the vocabulary with " +
          "Bpe.mergeVocab"))).cast("long"))
      .otherwise(nSymsCol)

  /** Per-document subword token counts under the vocabulary. The
    * vocabulary must COVER the corpus — automatic when trained on it,
    * or when built for it via [[mergeVocab]] (the foreign-corpus /
    * cl100k drop-in path); an uncovered word is a typed execution
    * failure, never a silent zero.
    * Documents with no extractable words keep a row with zero counts —
    * a tokenizer that silently drops documents corrupts a packing or
    * budgeting pass downstream. */
  def encode(docs: DataFrame, trained: Trained, idCol: String = "doc_id",
      textCol: String = "text", broadcastVocab: Boolean = true): DataFrame = {
    val vocabSlim = trained.vocab
      .select(col("word"), size(col("syms")).cast("long").as("n_syms"))
    val vocab = if (broadcastVocab) broadcast(vocabSlim) else vocabSlim
    // explode_outer keeps a null-word row for wordless documents, so no
    // second docs-sized join is needed to preserve them — one broadcast
    // probe + one aggregate shuffle is the whole plan
    docs
      .select(col(idCol).as("doc_id"),
        explode_outer(words(docs, textCol)).as("word"))
      .join(vocab, Seq("word"), "left")
      .select(col("doc_id"), col("word"),
        coveredSyms(col("word"), col("n_syms")).as("n_syms"))
      .groupBy("doc_id")
      .agg(count(col("word")).as("n_words"),
        coalesce(sum("n_syms"), lit(0L)).as("bpe_tokens"))
  }

  /** Corpus token frequencies under the trained vocabulary: the view a
    * vocabulary-size / coverage decision reads. */
  def tokenFrequencies(trained: Trained): DataFrame =
    trained.vocab
      .select(explode(col("syms")).as("token"), col("cnt"))
      .groupBy("token").agg(sum("cnt").as("freq"))

  final case class BpeChunkRow(doc_id: Long, chunk_index: Int,
      start_word: Int, end_word: Int, n_words: Long, bpe_tokens: Long)

  /** Greedy word-atomic chunking under an EXACT subword-token budget —
    * the reference caps chunks by tiktoken counts
    * (`shared/chunking/unified/base.py:136-151`); with a trained merge
    * table the budget is exact here too, because BPE merges never cross
    * word boundaries, so a chunk's token count is the SUM of its words'
    * counts (compositionality is what makes this one broadcast join +
    * a per-doc scan, not a re-tokenization per candidate boundary).
    * Rule: accumulate words in order; if adding the next word would
    * exceed `budget` and the chunk is non-empty, cut — a single
    * over-budget word still gets its own chunk rather than vanishing.
    * Spans are word indices into the document's extracted word stream.
    * Same coverage contract as [[encode]]: the vocabulary must cover
    * the corpus (train on it, or [[mergeVocab]]); an uncovered word
    * raises instead of silently vanishing from the chunk spans and the
    * budget accounting. */
  def budgetChunks(docs: DataFrame, trained: Trained, budget: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = broadcast(trained.vocab
      .select(col("word"), size(col("syms")).cast("long").as("n_syms")))
    docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(words(docs, textCol)).as(Seq("wi", "word")))
      .join(vocab, Seq("word"), "left")
      .select(col("doc_id"), col("wi").cast("int").as("wi"),
        coveredSyms(col("word"), col("n_syms")).as("n_syms"))
      .as[(Long, Int, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (doc: Long, it: Iterator[(Long, Int, Long)]) =>
        val ws = it.toArray.sortBy(_._2)
        val out = ArrayBuffer.empty[BpeChunkRow]
        var ci = 0
        var acc = 0L
        var nw = 0L
        var startW = 0
        var lastW = 0
        ws.foreach { case (_, wi, n) =>
          if (nw > 0 && acc + n > budget) {
            out += BpeChunkRow(doc, ci, startW, lastW, nw, acc)
            ci += 1; acc = 0L; nw = 0L; startW = wi
          }
          if (nw == 0) startW = wi
          acc += n; nw += 1; lastW = wi
        }
        if (nw > 0) out += BpeChunkRow(doc, ci, startW, lastW, nw, acc)
        out
      }.toDF()
  }
}
