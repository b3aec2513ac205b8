package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 merge — the warehouse-standard
  * versioned upsert (Kimball SCD2): every business key carries a
  * history of attribute versions with [valid_from, valid_to) validity;
  * merging a new snapshot closes changed/deleted versions at the
  * snapshot timestamp and opens new ones. This is how a 100 TB
  * pipeline versions its dimension/metadata tables (source registry,
  * collection config, document provenance) without ever updating a
  * row in place — append-only, time-travelable.
  *
  * Scale shape: closed history passes through UNTOUCHED (no shuffle —
  * at scale it is the bulk of the table and never needs to move); the
  * only shuffle is ONE full-outer equi-join between the OPEN rows and
  * the snapshot on the business key, which co-locates when both sides
  * are bucketed by that key. Change detection is null-safe per-column
  * equality (`<=>`), so a null attribute is a value, not a wildcard.
  *
  * Row fates out of the join:
  *  - both sides, attrs equal      → open row unchanged
  *  - both sides, attrs differ     → old row closed at snapTs + new
  *                                   open row with the new attrs
  *  - snapshot only (new key)      → new open row
  *  - open only (key disappeared)  → closed at snapTs (the standard
  *                                   hard-delete treatment)
  */
object Scd {

  /** @param dim      current dimension: keyCol, attrCols*,
    *                  valid_from, valid_to (null = open)
    * @param snapshot  new snapshot: keyCol, attrCols*
    * @param snapTs    the snapshot's timestamp literal
    * Output: the merged dimension, same schema as `dim`. */
  def scd2Merge(dim: DataFrame, snapshot: DataFrame, keyCol: String,
                attrCols: Seq[String], snapTs: Column): DataFrame = {
    require(attrCols.nonEmpty, "SCD2 needs at least one tracked attr")
    val outCols = (keyCol +: attrCols) ++ Seq("valid_from", "valid_to")
    val history = dim.filter(col("valid_to").isNotNull)
      .select(outCols.map(col): _*)
    val open = dim.filter(col("valid_to").isNull)

    val snapPrefixed = snapshot.select(
      (col(keyCol).as("__sk") +:
        attrCols.map(c => col(c).as(s"__s_$c"))): _*)
    val joined = open.join(snapPrefixed,
      col(keyCol) <=> col("__sk"), "full_outer")
    val inOpen = col("valid_from").isNotNull
    val inSnap = col("__sk").isNotNull
    val same = attrCols.map(c => col(c) <=> col(s"__s_$c"))
      .reduce(_ && _)

    // surviving open rows: unchanged
    val unchanged = joined.filter(inOpen && inSnap && same)
      .select(outCols.map(col): _*)
    // closures: changed or deleted
    val closed = joined.filter(inOpen && (!inSnap || !same))
      .select(((col(keyCol) +: attrCols.map(col)) ++
        Seq(col("valid_from"), snapTs.as("valid_to"))): _*)
    // openings: changed or brand-new keys
    val opened = joined.filter(inSnap && (!inOpen || !same))
      .select(((col("__sk").as(keyCol) +:
        attrCols.map(c => col(s"__s_$c").as(c))) ++
        Seq(snapTs.as("valid_from"),
          lit(null).cast("timestamp").as("valid_to"))): _*)

    history.unionByName(unchanged).unionByName(closed)
      .unionByName(opened)
  }

  /** CDC changelog apply — the OTHER standard lakehouse merge (Delta's
    * `MERGE` fed by a Debezium-style I/U/D stream): collapse the
    * changelog to each key's LATEST operation by `seqCol` (one
    * map-side-combinable struct-max aggregation — never a per-key
    * window), then base rows without a change pass through via a
    * left-anti join, surviving I/U payloads append, and latest-D keys
    * vanish. At scale both the anti-join and the changelog collapse
    * co-locate when base and log are bucketed on the key; base rows
    * for unchanged keys never move.
    *
    * @param base  current snapshot: keyCol + payload columns
    * @param log   changelog: keyCol, seqCol (STRICTLY increasing —
    *              i.e. unique — per key, the Debezium LSN/offset
    *              contract), opCol ∈ {I, U, D}, and the SAME payload
    *              columns (ignored for D rows)
    * Output: the next snapshot, base's schema.
    *
    * Tie-break contract (ADVICE r10): with a UNIQUE seq per key the
    * struct-max is totally ordered by `_seq` alone and the remaining
    * struct fields never decide. If a caller violates uniqueness, the
    * max falls through to lexicographic comparison of the op string
    * and then the raw payload struct — deterministic IN SPARK but not
    * a documented cross-engine semantic (a seq-DESC row_number oracle
    * is nondeterministic on such ties), so duplicate seqs per key are
    * OUT OF CONTRACT, not a supported ordering. */
  def applyChangelog(base: DataFrame, log: DataFrame, keyCol: String,
                     seqCol: String, opCol: String): DataFrame = {
    val payloadCols = base.columns.filterNot(_ == keyCol).toSeq
    val latest = log
      .groupBy(col(keyCol))
      .agg(max(struct(col(seqCol).as("_seq"), col(opCol).as("_op"),
        struct(payloadCols.map(col): _*).as("_p"))).as("_m"))
      .select(col(keyCol), col("_m._op").as("_op"),
        col("_m._p.*"))
    base.join(latest.select(keyCol), Seq(keyCol), "left_anti")
      .unionByName(latest.filter(col("_op") =!= "D").drop("_op")
        .select(base.columns.toIndexedSeq.map(col): _*))
  }

  /** Incremental view maintenance of a (count, sum) aggregate under a
    * before/after-image changelog — the self-maintainable-view case of
    * the IVM literature (Gupta & Mumick 1995: SUM/COUNT views maintain
    * from the delta alone, no base re-read): the materialized view
    * `baseAgg(group, n_rows, sum_val)` merges with ONE aggregation
    * over the changelog — per group, Δn = #I − #D and
    * Δsum = Σ(after − before) with a missing image contributing 0
    * (I has no before, D no after, U both). Base groups the log never
    * touches pass through UNCHANGED — at scale that is the whole
    * point: maintenance cost is O(|changelog|), not O(|base|); the
    * merge is a broadcast-or-bucketed join on the group key. Groups
    * whose count reaches 0 are dropped (the recompute would not emit
    * them). Log rows: (opCol ∈ I/U/D, groupCol, beforeCol, afterCol)
    * with before/after NULL where the image doesn't exist.
    * Output: (group, n_rows, sum_val) — hash-comparable to a full
    * recompute over the post-changelog state. */
  def maintainCountSum(baseAgg: DataFrame, log: DataFrame,
      groupCol: String, opCol: String, beforeCol: String,
      afterCol: String): DataFrame = {
    val delta = log.groupBy(col(groupCol))
      .agg(
        sum(when(col(opCol) === "I", 1)
          .when(col(opCol) === "D", -1).otherwise(0)).as("_dn"),
        sum(coalesce(col(afterCol), lit(0L)) -
          coalesce(col(beforeCol), lit(0L))).as("_dsum"))
    baseAgg.join(delta, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("n_rows"), lit(0L)) +
          coalesce(col("_dn"), lit(0L))).as("n_rows"),
        (coalesce(col("sum_val"), lit(0L)) +
          coalesce(col("_dsum"), lit(0L))).as("sum_val"))
      .filter(col("n_rows") > 0)
  }
}
