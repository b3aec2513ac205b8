package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** CORI resource selection (Callan, Lu & Croft, SIGIR 1995) — the
  * federated-search step BEFORE the multi-collection fan-out the
  * engine already ships (search_multi_docs): rank COLLECTIONS by how
  * likely they are to contain answers, so a broker queries only the
  * top few instead of all of them. Collection-level df plays the role
  * of tf, collection count plays the role of N:
  *
  *   T = df / (df + 50 + 150 · cw/avg_cw)          (df saturation)
  *   I = ln((|C| + 0.5) / cf) / ln(|C| + 1)        (collection idf)
  *   p(t|c) = b + (1 − b) · T · I,  b = 0.4
  *   belief(q|c) = Σ_t p(t|c) / |q|
  *
  * Scale posture: everything computes from COLLECTION-level statistics
  * — a (collections × query-terms)-sized relation after one tokenize
  * pass with map-side aggregation; the belief sum runs in term order
  * ([[Bm25.sparseScore]]), so the float result is engine-identical.
  * Query terms absent from the whole corpus are dropped (the idf > 0
  * convention); df = 0 in a particular collection contributes the
  * belief floor b. */
object Cori {

  val B = 0.4 // default belief, Callan et al. §4

  /** Rank collections for a query. Output: (collection, n_terms,
    * belief) for every collection in `docs`, belief summed over the
    * corpus-present query terms, highest first. */
  def selectCollections(docs: DataFrame, collectionCol: String,
      idCol: String, textCol: String,
      queryTerms: Seq[String]): DataFrame = {
    require(queryTerms.nonEmpty, "no query terms")
    val terms = queryTerms.distinct.sorted
    val toks = docs.select(col(collectionCol).cast("string").as("c"),
      col(idCol).as("id"),
      explode(TextFunctions.tokensCol(col(textCol))).as("term"))
    // collection word counts (all tokens) + the collection universe
    val cw = toks.groupBy("c").agg(count(lit(1)).as("cw"))
    val stats = broadcast(cw.agg(count(lit(1)).as("n_coll"),
      (sum("cw").cast("double") / count(lit(1)).cast("double"))
        .as("avg_cw")))
    // per-(collection, query term) document frequency
    val dfRel = toks.filter(col("term").isin(terms: _*))
      .select("c", "id", "term").distinct()
      .groupBy("c", "term").agg(count(lit(1)).as("df"))
    // collection frequency per corpus-present term
    val cf = dfRel.groupBy("term").agg(count(lit(1)).as("cf"))
    val spark = docs.sparkSession
    import spark.implicits._
    val grid = cw.select("c", "cw")
      .crossJoin(broadcast(terms.toDF("term")))
      .join(broadcast(cf), "term") // drops corpus-absent terms
      .join(dfRel, Seq("c", "term"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .crossJoin(stats)
    val tPart = col("df").cast("double") /
      (col("df").cast("double") + lit(50.0) +
        lit(150.0) * col("cw").cast("double") / col("avg_cw"))
    val iPart = log((col("n_coll").cast("double") + 0.5) /
        col("cf").cast("double")) /
      log(col("n_coll").cast("double") + 1.0)
    grid.withColumn("p", lit(B) + lit(1.0 - B) * tPart * iPart)
      .groupBy("c")
      .agg(count(lit(1)).as("n_terms"),
        (Bm25.sparseScore(col("p"), col("term")) /
          count(lit(1)).cast("double")).as("belief"))
      .select(col("c").as("collection"), col("n_terms"), col("belief"))
      .orderBy(col("belief").desc, col("collection"))
  }
}
