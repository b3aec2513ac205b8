package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sketch-first operators: a bounded approximate pass finds a small
  * candidate relation, an exact pass verifies it — so the output is
  * EXACT while the corpus-sized stream never shuffles on its raw key.
  * The same two-pass discipline as [[Dedup.decontaminateBloom]] (sketch
  * prefilter, exact verify) applied to frequency estimation.
  */
object Sketch {

  /** Per-partition Misra–Gries summary: at most `k` counters; every
    * token with local frequency > n_part/(k+1) is guaranteed to
    * survive (the classic MG undercount bound). Pure local state —
    * O(k) memory regardless of partition size. */
  private[graft] def misraGries(it: Iterator[String], k: Int)
      : (collection.mutable.HashMap[String, Long], Long) = {
    val counters = collection.mutable.HashMap.empty[String, Long]
    var n = 0L
    while (it.hasNext) {
      val tok = it.next()
      n += 1
      counters.get(tok) match {
        case Some(c) => counters.update(tok, c + 1)
        case None =>
          if (counters.size < k) counters.update(tok, 1L)
          else {
            // decrement-all; drop zeros (amortized O(1) per input)
            val dead = collection.mutable.ArrayBuffer.empty[String]
            counters.mapValuesInPlace((_, c) => c - 1)
            counters.foreach { case (t, c) => if (c <= 0) dead += t }
            dead.foreach(counters.remove)
          }
      }
    }
    (counters, n)
  }

  /** EXACT heavy hitters — every token with corpus frequency
    * >= ceil(phi * N) and its exact count — without ever shuffling the
    * corpus-sized token stream on the token key.
    *
    * Two passes (ref for the need: token_statistics-style corpus
    * reports; the method is Misra–Gries 1982 / the MG-merge result of
    * Agarwal 2013):
    *
    *  1. CANDIDATES — one scan; each partition keeps a Misra–Gries
    *     summary of k = ceil(1/phi) counters and emits only its
    *     surviving tokens plus one (null-token, n_part) row. The union
    *     of per-partition survivors is a SUPERSET of the true heavy
    *     hitters: if f >= phi*N globally then f_i >= phi*n_i on some
    *     partition (weighted pigeonhole), and MG with k counters keeps
    *     anything above n_i/(k+1) < phi*n_i. The emitted relation is
    *     bounded by P*k rows — never corpus-sized.
    *  2. VERIFY — second scan; tokens semi-joined against the
    *     BROADCAST candidate set (bounded, step 1), then counted
    *     exactly. Only candidate tokens enter the groupBy exchange, so
    *     the shuffle carries <= P * (distinct candidates) partial rows
    *     instead of the whole stream. The phi*N floor is applied with
    *     N from step 1's sentinel rows.
    *
    * At 100 TB: pass 1 is map-only with O(k) state; pass 2's exchange
    * is bounded by the candidate vocabulary, not the corpus. The
    * alternative — groupBy(token) over everything then HAVING — pays a
    * full corpus shuffle for a result that is a few dozen rows.
    *
    * Deterministic: MG survival depends on partition contents, but the
    * VERIFIED output (exact counts, exact floor) does not — any
    * candidate superset yields the same final relation, so the result
    * is partitioning-independent by construction.
    *
    * Output: (token, cnt) — exact counts, cnt desc, token asc. */
  def heavyHitters(df: DataFrame, textCol: String, phi: Double,
                   removeStopwords: Boolean = false): DataFrame = {
    require(phi > 0.0 && phi < 1.0, s"phi out of (0,1): $phi")
    val k = math.ceil(1.0 / phi).toInt
    val spark = df.sparkSession

    def tokens: DataFrame = df
      .select(explode(TextFunctions.tokensCol(col(textCol),
        removeStopwords = removeStopwords)).as("tok"))

    // pass 1: bounded per-partition summaries (P*k + P rows total)
    val sketch = tokens
      .as(Encoders.STRING)
      .mapPartitions { it =>
        val (counters, n) = misraGries(it, k)
        counters.keysIterator.map(t => (t, 0L)) ++ Iterator((null: String, n))
      }(Encoders.product[(String, Long)])
      .toDF("tok", "n_part")
      .localCheckpoint() // two consumers: N and the candidate set
    val totals = sketch.filter(col("tok").isNull)
      .agg(sum("n_part").as("n_tok"))
    val candidates = sketch.filter(col("tok").isNotNull)
      .select("tok").distinct()

    // pass 2: exact counts of candidates only; floor on exact N
    tokens
      .join(broadcast(candidates), Seq("tok"), "left_semi")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(totals))
      .filter(col("cnt") >= ceil(lit(phi) * col("n_tok")))
      .select(col("tok").as("token"), col("cnt"))
      .orderBy(col("cnt").desc, col("token"))
  }
}
