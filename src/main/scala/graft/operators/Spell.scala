package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** "Did you mean" spelling correction over the corpus vocabulary —
  * the SymSpell deletion-variant method (Garbe's symmetric delete
  * algorithm, the public successor of Norvig's corrector): instead of
  * generating all ~26·L substitutions/insertions per lookup, BOTH
  * sides emit only their L one-character-DELETION variants (plus the
  * string itself); any edit-distance-1 pair — substitution, insertion,
  * or deletion — provably shares a variant, so an equi-join on the
  * variant key finds every candidate and an exact `levenshtein <= 1`
  * verify keeps the join's false positives (distance-2 pairs can
  * collide) out.
  *
  * Scale posture: the vocabulary relation is Zipf-bounded (distinct
  * terms, not tokens), its deletion expansion is |vocab|·avg_len rows
  * shuffled ONCE on the variant key, and the per-input candidate set
  * is bounded by variant collisions — never a scan of the vocabulary
  * per query term. Ranking is corpus-frequency argmax (ties to the
  * lexicographically smallest term) via two bounded aggregates — no
  * rank window.
  */
object Spell {

  /** One-character-deletion variants of `c`, plus `c` itself. */
  private[graft] def deletions(c: Column): Column =
    array_union(array(c),
      transform(sequence(lit(1), length(c)), i =>
        concat(c.substr(lit(1), i - 1),
          c.substr(i + 1, length(c)))))

  /** Corpus vocabulary (term, df) from a text column — distinct
    * document frequency, the ranking signal. */
  def vocabulary(docs: DataFrame, idCol: String,
                 textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(TextFunctions.tokensCol(col(textCol),
          removeStopwords = false)).as("term"))
      .distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))

  /** Correct each input to the best vocabulary term within edit
    * distance 1, ranked by (distance asc, df desc, term asc) — an
    * exact in-vocabulary hit always beats a distance-1 neighbor,
    * however frequent. Output: (input, suggestion, df, dist); inputs
    * with NO candidate are absent. Three bounded aggregates, no rank
    * window. */
  def didYouMean(vocab: DataFrame, inputs: DataFrame,
                 inputCol: String): DataFrame = {
    val vx = vocab.select(col("term"), col("df"),
        explode(deletions(col("term"))).as("variant"))
    val qx = inputs.select(col(inputCol).as("input"),
        explode(deletions(col(inputCol))).as("variant"))
    val cands = qx.join(vx, "variant")
      .select("input", "term", "df").distinct()
      .withColumn("dist", levenshtein(col("input"), col("term")))
      .filter(col("dist") <= 1)
    val bestD = cands.groupBy("input").agg(min("dist").as("dist"))
    val atD = cands.join(bestD, Seq("input", "dist"))
    val bestDf = atD.groupBy("input", "dist").agg(max("df").as("df"))
    atD.join(bestDf, Seq("input", "dist", "df"))
      .groupBy("input", "dist", "df")
      .agg(min("term").as("suggestion"))
      .select("input", "suggestion", "df", "dist")
  }
}
