package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Team-draft interleaving (Radlinski, Kurup & Joachims, CIKM 2008) —
  * the ONLINE ranker-comparison primitive beside the offline pair the
  * engine already ships (IrMetrics.macroAveraged for metrics,
  * IrMetrics.pairedSignificance for the test): two rankers' lists
  * merge into one result page, each document remembers which TEAM
  * contributed it, and user clicks credit that team — the comparison
  * real search products trust over offline metrics because it needs no
  * relevance judgments, only traffic.
  *
  * This is the DETERMINISTIC variant: the original flips a coin per
  * round for first pick; here turns strictly alternate A, B, A, B …
  * by result position, and when the turn's team has no unused
  * candidate left the other team fills in. Determinism is what makes
  * the op checkable against an independent engine and replayable in a
  * batch pipeline; the first-pick advantage the coin removes is fixed
  * on team A and DOCUMENTED (evaluate both (A,B) and (B,A) orders to
  * cancel it, as click experiments do with coin parity).
  *
  * Scale shape: each query's two candidate lists collapse to ONE row
  * of bounded arrays (the post-top-k array-ops discipline), the draft
  * runs as a `depth`-step `aggregate()` fold INSIDE that row — no
  * per-step shuffle, no window — and clicks join back result-set-
  * bounded. */
object Interleave {

  /** Interleave two runs per query and mark clicks.
    * `runA`/`runB`: (query_id, rank, doc_id) with rank 1-based;
    * `clicks`: (query_id, doc_id) — the clicked (or, in an offline
    * replay, relevant) documents. Output: one row per interleaved
    * position — (query_id, pos, doc_id, team, clicked), `depth`
    * positions per query (fewer when both lists exhaust). */
  def teamDraft(runA: DataFrame, runB: DataFrame, clicks: DataFrame,
                depth: Int = 10): DataFrame = {
    require(depth >= 1 && depth <= 100, s"bad depth: $depth")
    def arr(run: DataFrame, name: String) = run
      .groupBy("query_id")
      .agg(transform(array_sort(collect_list(
          struct(col("rank"), col("doc_id").cast("long").as("d")))),
        x => x.getField("d")).as(name))
    val emptyAcc = array().cast("array<struct<d:bigint,team:string>>")
    val emptyL = array().cast("array<bigint>")
    val lists = arr(runA, "la")
      .join(arr(runB, "lb"), Seq("query_id"), "full_outer")
      .select(col("query_id"), coalesce(col("la"), emptyL).as("la"),
        coalesce(col("lb"), emptyL).as("lb"))
    def next(l: Column, acc: Column, team: String): Column = {
      val cands = filter(l, x =>
        !array_contains(transform(acc, y => y.getField("d")), x))
      when(size(cands) > 0,
        array(struct(element_at(cands, 1).as("d"),
          lit(team).as("team"))))
        .otherwise(array().cast("array<struct<d:bigint,team:string>>"))
    }
    val folded = lists.withColumn("acc",
      aggregate(sequence(lit(0), lit(depth - 1)), emptyAcc,
        (acc, i) => {
          val pa = next(col("la"), acc, "A")
          val pb = next(col("lb"), acc, "B")
          val primary = when(i % 2 === 0, pa).otherwise(pb)
          val fallback = when(i % 2 === 0, pb).otherwise(pa)
          concat(acc,
            when(size(primary) > 0, primary).otherwise(fallback))
        }))
    val clicked = clicks.select(col("query_id"),
      col("doc_id").cast("long").as("doc_id"), lit(true).as("clicked"))
    folded.select(col("query_id"),
        posexplode(col("acc")).as(Seq("p", "e")))
      .select(col("query_id"), (col("p") + 1).cast("int").as("pos"),
        col("e.d").as("doc_id"), col("e.team").as("team"))
      .join(clicked, Seq("query_id", "doc_id"), "left")
      .withColumn("clicked", coalesce(col("clicked"), lit(false)))
      .select("query_id", "pos", "doc_id", "team", "clicked")
  }

  /** Per-query verdict from an interleaved page: clicks credit the
    * contributing team; winner = sign of the credit delta (the
    * team-draft scoring rule). Output: (query_id, credit_a, credit_b,
    * winner ∈ {A, B, tie}). */
  def verdict(interleaved: DataFrame): DataFrame =
    interleaved.groupBy("query_id")
      .agg(
        sum(when(col("clicked") && col("team") === "A", 1L)
          .otherwise(0L)).as("credit_a"),
        sum(when(col("clicked") && col("team") === "B", 1L)
          .otherwise(0L)).as("credit_b"))
      .withColumn("winner",
        when(col("credit_a") > col("credit_b"), lit("A"))
          .when(col("credit_b") > col("credit_a"), lit("B"))
          .otherwise(lit("tie")))
}
