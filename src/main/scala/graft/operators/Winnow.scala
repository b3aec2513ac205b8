package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003
  * — the MOSS algorithm): from each document's stream of token k-gram
  * hashes, select the minimum of every w-long window (rightmost wins
  * ties). The guarantee: any match of at least w+k-1 consecutive
  * tokens between two documents shares at least one SELECTED
  * fingerprint, at an expected density of only 2/(w+1) of all k-grams
  * — the local-algorithm sweet spot between "store every shingle"
  * (exact substring dedup, [[Dedup.exactSubstrings]]) and "hope a
  * random signature overlaps" (MinHash).
  *
  * Implementation is one window pass, no self-join: each hash is keyed
  * `md5hex || zeropad(MAX_POS - pos)` so a plain lexicographic
  * `min()` over the w-row frame picks (smallest hash, RIGHTMOST
  * position) in one expression; distinct parsed winners are the
  * fingerprint set. The per-document window partition is bounded by
  * document length (the chunker/span-dedup posture), never by corpus
  * size.
  *
  * [[overlapPairs]] then finds candidate plagiarism/near-dup pairs as
  * the fingerprint-posting-list join — bounded by per-fingerprint
  * document frequency, with a `maxDf` guard that drops boilerplate
  * fingerprints before they can quadratically explode a posting list
  * (the LSH-bucket discipline). Never all-pairs.
  */
object Winnow {

  // 9-digit inverted-position pad: a position past this would corrupt
  // the min-key encoding. Unreachable for per-document token counts —
  // a 1e9-token doc is ~5 GB of text in ONE row, far past any row
  // this engine (or parquet) would carry; documents that large must be
  // chunked upstream (C1-C6) before fingerprinting.
  private val MaxPos = 999999999L

  /** Selected fingerprints: (id, h md5-hex, pos 0-based k-gram start).
    * Documents shorter than k tokens contribute nothing. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 4, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"bad spec: k=$k w=$w")
    val toked = df.select(col(idCol).as("id"),
        TextFunctions.tokensCol(col(textCol),
          removeStopwords = false).as("t"))
      .filter(size(col("t")) >= k)
    val keyed = toked
      .select(col("id"),
        explode(sequence(lit(0), size(col("t")) - k)).as("pos"),
        col("t"))
      .select(col("id"), col("pos"),
        concat(
          md5(concat_ws(" ", slice(col("t"), col("pos") + 1, lit(k)))),
          lpad((lit(MaxPos) - col("pos")).cast("string"), 9, "0"))
          .as("hk"))
    val wDoc = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(-(w - 1), 0)
    keyed
      .withColumn("mk", min(col("hk")).over(wDoc))
      .filter(col("pos") >= w - 1) // full windows only
      .select(col("id"), substring(col("mk"), 1, 32).as("h"),
        (lit(MaxPos) - substring(col("mk"), 33, 9).cast("long"))
          .as("pos"))
      .distinct()
  }

  /** Candidate near-dup/plagiarism pairs: documents sharing at least
    * `minShared` distinct selected fingerprints, with fingerprints
    * appearing in more than `maxDf` documents dropped first
    * (boilerplate guard — also what bounds the posting-list join).
    * Output: (id_a, id_b, n_shared) with id_a < id_b. */
  def overlapPairs(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 4, w: Int = 4, minShared: Long = 2L,
                   maxDf: Long = 50L): DataFrame = {
    require(minShared >= 1L && maxDf >= 2L,
      s"bad spec: minShared=$minShared maxDf=$maxDf")
    val sel = fingerprints(df, idCol, textCol, k, w)
      .select("id", "h").distinct()
    val keep = sel.groupBy("h")
      .agg(count(lit(1)).as("_df")) // (id, h) already distinct
      .filter(col("_df") <= maxDf)
      .select("h")
    val bounded = sel.join(keep, Seq("h"), "left_semi")
    bounded.as("a")
      .join(bounded.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
