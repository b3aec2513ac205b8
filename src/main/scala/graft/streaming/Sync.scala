package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Continuous-sync / incremental ingestion (SURVEY.md §2.9 T1/T2/T5).
  *
  * The reference's "streaming" is incremental batch over files: re-scan
  * sources on a schedule, detect changed docs by content_hash, mark
  * docs not seen this sync as stale. We model it as a snapshot MERGE in
  * `foreachBatch` — the Spark-native equivalent of the tracker diff
  * (document_tracker.py:70-142) — driven either by a one-shot call
  * (Trigger.AvailableNow) or a file-source stream.
  *
  * State-table contract (FIXTURES.md §3 subset):
  *   documents(doc_id, uri, content_hash, status, last_seen_at BIGINT,
  *             is_stale BOOLEAN)
  * `last_seen_at` carries the driver-supplied syncId (a monotone
  * logical clock) rather than a wall clock, keeping runs reproducible.
  *
  * Scale: the merge is one full-outer join keyed on doc_id — the state
  * table and the batch are both hash-partitioned on the key; with Delta
  * this is exactly `MERGE WHEN MATCHED / NOT MATCHED [BY SOURCE]`.
  */
object Sync {

  /** One sync round (T2 semantics):
    *  - new doc → insert status=new
    *  - same doc_id, different content_hash → status=updated
    *  - same doc_id, same hash → status=unchanged (last_seen bumped)
    *  - state doc missing from the batch → is_stale=true, status kept
    * Returns the NEW state snapshot. */
  def mergeBatch(state: DataFrame, batch: DataFrame, syncId: Long): DataFrame = {
    val s = state.select(
      col("doc_id"), col("uri").as("s_uri"),
      col("content_hash").as("s_hash"), col("status").as("s_status"),
      col("last_seen_at").as("s_seen"), col("is_stale").as("s_stale"))
    val b = batch.select(
      col("doc_id"), col("uri").as("b_uri"),
      col("content_hash").as("b_hash"))
    s.join(b, Seq("doc_id"), "full_outer")
      .select(
        col("doc_id"),
        coalesce(col("b_uri"), col("s_uri")).as("uri"),
        coalesce(col("b_hash"), col("s_hash")).as("content_hash"),
        when(col("s_hash").isNull, lit("new"))
          .when(col("b_hash").isNull, col("s_status"))
          .when(col("b_hash") =!= col("s_hash"), lit("updated"))
          .otherwise(lit("unchanged")).as("status"),
        when(col("b_hash").isNotNull, lit(syncId))
          .otherwise(col("s_seen")).as("last_seen_at"),
        // stale = not seen this sync (the reference's staleness grace,
        // models.py:369-370)
        col("b_hash").isNull.as("is_stale"))
  }

  /** Docs that need (re)processing after a merge: new or updated —
    * the P7 change-skip complement. */
  def toProcess(merged: DataFrame): DataFrame =
    merged.filter(col("status").isin("new", "updated") && !col("is_stale"))

  /** One (doc_id, content_hash) pair for the streaming dedup state. */
  final case class HashedDoc(doc_id: String, content_hash: String)

  /** Streaming exact-dedup across micro-batches: emit each
    * content_hash's FIRST document and suppress every later arrival —
    * the stateful-stream form of the P7 change-skip, with per-key state
    * bounded to one boolean. Keyed state rides
    * `flatMapGroupsWithState`; within a batch the LEXICOGRAPHICALLY
    * least doc_id string wins (ids are opaque strings here — note this
    * differs from Dedup.exact's numeric min for multi-digit numeric
    * ids), so output is deterministic under any partitioning. Works on
    * a bounded (batch) Dataset too, as one stateless pass. */
  def streamingDedup(docs: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
    import org.apache.spark.sql.{Encoders => E}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val hashed = docs.select(
        col(idCol).cast("string").as("doc_id"),
        graft.operators.Dedup.contentHash(col(textCol)).as("content_hash"))
      .as(E.product[HashedDoc])
    hashed
      .groupByKey(_.content_hash)(E.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (hash: String, rows: Iterator[HashedDoc],
         state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator(HashedDoc(rows.minBy(_.doc_id).doc_id, hash))
          }
      }(E.scalaBoolean, E.product[HashedDoc])
      .toDF()
  }

  final case class SessionState(startUs: Long, lastUs: Long, n: Long)
  final case class SessionRow(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long)

  final case class DupRow(doc_id: Long, first_doc_id: Long)

  /** Streaming duplicate REPORTS — the complement of
    * [[streamingDedup]] (which emits each hash's kept row): the first
    * arrival of a hash is RETAINED silently (it becomes the key's
    * state); every later arrival is emitted as a duplicate report
    * `(doc_id, first_doc_id)` mapping it to its NUMERIC-min original.
    * The kept set is then `corpus ANTI JOIN emitted` — the streaming
    * twin of [[graft.operators.Dedup.exact]], and the relation an
    * incremental index maintenance pass consumes (drop these, keep
    * the rest).
    *
    * Determinism contract (the [[sessionize]] discipline): batches
    * arrive id-ordered (the staged micro-batch fixtures' strictly-
    * increasing-mtime contract), and each batch's rows are sorted
    * inside the function — Spark hands the group iterator in arbitrary
    * order — so "first" is always the globally smallest id and a batch
    * SQL oracle replays the emitted set exactly, for ANY batch
    * boundary placement. In-batch duplicates are handled by the sort;
    * cross-batch duplicates by the state probe.
    *
    * State is one long per distinct hash — the unbounded-history cost
    * of exact streaming dedup. Production runs bound it with
    * `dropDuplicatesWithinWatermark`-style state TTL (dedup only
    * within the lateness horizon) or periodic state snapshots; this
    * operator keeps full history because its contract IS whole-corpus
    * exactness. */
  def streamingDupReports(docs: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    import org.apache.spark.sql.{Encoders => E}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val typed = docs.select(
        sha2(col(textCol).cast("binary"), 256).as("h"),
        col(idCol).cast("long").as("id"))
      .as(E.tuple(E.STRING, E.scalaLong))
    typed.groupByKey(_._1)(E.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(String, Long)],
         state: GroupState[Long]) =>
          val ids = rows.map(_._2).toArray.sorted
          val out = Seq.newBuilder[DupRow]
          var first = state.getOption.getOrElse(Long.MaxValue)
          ids.foreach { id =>
            if (id < first) {
              // a smaller id than the retained canonical: under the
              // ordered-batch staging contract this only happens on
              // the hash's first-ever arrival (state empty). If a
              // disordered feed ever violates that, the displaced
              // canonical is RETRO-REPORTED as a duplicate of the new
              // min, so the emitted dup SET stays exact under any
              // order — only the first_doc_id of rows reported before
              // the displacement still names the then-current (not
              // final) canonical.
              if (first != Long.MaxValue) out += DupRow(first, id)
              first = id
            } else if (id > first) {
              out += DupRow(id, first)
            } // id == first: the same row replayed; emit nothing
          }
          if (first != Long.MaxValue) state.update(first)
          out.result().iterator
      }(E.scalaLong, E.product[DupRow])
      .toDF()
  }

  /** Per-hash TTL state for [[streamingDupReportsTtl]]: the current
    * canonical row's id and event-time (micros). */
  final case class TtlCanon(canonId: Long, canonTsUs: Long)

  /** [[streamingDupReports]] with a LATENESS-HORIZON state bound — the
    * production posture the full-history operator defers to
    * (`dropDuplicatesWithinWatermark` semantics, made exact): a row is
    * reported as a duplicate only if it arrives within `horizonUs` of
    * the hash's CURRENT canonical row's event time; a row beyond that
    * horizon silently becomes the new canonical instead. Per-hash
    * state is one (id, ts) pair, and it is EVICTED once the watermark
    * passes canonical_ts + horizon (EventTimeTimeout), so total state
    * is bounded by the distinct hashes seen within one horizon — not
    * by corpus history.
    *
    * Eviction never changes the answer: a post-eviction arrival has
    * event time beyond watermark − delay > canonical_ts + horizon
    * (rows later than the watermark delay are out of contract, the
    * standard streaming lateness bound), and the chain rule would
    * have made it the new canonical anyway. So the emitted set is a
    * pure function of event times — the per-hash CHAIN rule: scan
    * copies in (ts, id) order; first is canonical; each next copy is
    * a dup if `ts − canonical_ts <= horizonUs`, else it becomes the
    * new canonical. A batch oracle replays exactly that recurrence
    * (recursive CTE), for ANY batch boundary placement, because batch
    * order is ts order under the staged fixtures' contract and each
    * batch's group rows are sorted here.
    *
    * `tsCol` must be a TIMESTAMP column already carrying the stream's
    * `withWatermark` (EventTimeTimeout requires one; the caller owns
    * the delay choice). */
  def streamingDupReportsTtl(docs: DataFrame, idCol: String,
      textCol: String, tsCol: String, horizonUs: Long): DataFrame = {
    import org.apache.spark.sql.{Encoders => E}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(horizonUs > 0, s"horizon must be positive: $horizonUs")
    // the watermarked TIMESTAMP attribute must SURVIVE the projection
    // (EventTimeTimeout's analyzer check looks for it in the child's
    // output), so it rides along as the unused 4th field
    val typed = docs.select(
        sha2(col(textCol).cast("binary"), 256).as("h"),
        col(idCol).cast("long").as("id"),
        unix_micros(col(tsCol)).as("ts"),
        col(tsCol).as("wm"))
      .as(E.tuple(E.STRING, E.scalaLong, E.scalaLong, E.TIMESTAMP))
    typed.groupByKey(_._1)(E.STRING)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[(String, Long, Long, java.sql.Timestamp)],
         state: GroupState[TtlCanon]) =>
          if (state.hasTimedOut) {
            // watermark passed canonical_ts + horizon: no in-horizon
            // arrival can follow — drop the key's state entirely
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.map(r => (r._3, r._2)).toArray.sorted
            val out = Seq.newBuilder[DupRow]
            var canon = state.getOption.orNull
            sorted.foreach { case (ts, id) =>
              if (canon == null || ts - canon.canonTsUs > horizonUs)
                canon = TtlCanon(id, ts)
              else if (id != canon.canonId)
                out += DupRow(id, canon.canonId)
            }
            state.update(canon)
            // timeout is event-time MILLIS; ceil so the micros horizon
            // is never shortened by truncation
            state.setTimeoutTimestamp(
              (canon.canonTsUs + horizonUs + 999L) / 1000L)
            out.result().iterator
          }
      }(E.product[TtlCanon], E.product[DupRow])
      .toDF()
  }

  /** Streaming sessionization with custom per-key state
    * (`flatMapGroupsWithState`): events grouped by user; a session is a
    * maximal run of events with inter-event gaps ≤ `gapUs`. A closed
    * session is emitted in the micro-batch containing its SUCCESSOR
    * event — never by stream end or wall-clock timeout — so the
    * emitted set is exactly "every session except each user's last",
    * a batching-independent, fully deterministic rule a batch SQL
    * oracle replays (timeout-based flushing would make emission depend
    * on trigger timing). Each batch's per-user rows are sorted by
    * event time inside the function: Spark hands the group iterator in
    * arbitrary order, and cross-batch order is the caller's staging
    * contract (ts-ordered micro-batches). State is one O(1) record per
    * user. Works identically on a bounded Dataset as one pass. */
  def sessionize(events: DataFrame, tsCol: String, userCol: String,
                 gapUs: Long): DataFrame = {
    import org.apache.spark.sql.{Encoders => E}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val typed = events.select(col(userCol).cast("long").as("user_id"),
        unix_micros(col(tsCol)).as("ts_us"))
      .as(E.tuple(E.scalaLong, E.scalaLong))
    typed.groupByKey(_._1)(E.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)],
         state: GroupState[SessionState]) =>
          val sorted = rows.map(_._2).toArray.sorted
          val out = Seq.newBuilder[SessionRow]
          var cur = state.getOption
          sorted.foreach { t =>
            cur match {
              case None => cur = Some(SessionState(t, t, 1L))
              case Some(s) if t - s.lastUs > gapUs =>
                out += SessionRow(user, s.startUs, s.lastUs, s.n)
                cur = Some(SessionState(t, t, 1L))
              case Some(s) =>
                cur = Some(s.copy(lastUs = t, n = s.n + 1))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }(E.product[SessionState], E.product[SessionRow])
      .toDF()
  }

  /** Continuous sync (T1): stream new files from a directory, MERGE
    * each micro-batch into the parquet state table. The caller supplies
    * how to load the current state and persist the next snapshot (a
    * pointer-swap table via Ingest.reindexSwap, or Delta in prod).
    * Returns the streaming query (AvailableNow = one scheduled run). */
  def continuousSync(spark: SparkSession, incomingDir: String,
                     schema: org.apache.spark.sql.types.StructType,
                     loadState: () => DataFrame,
                     saveState: DataFrame => Unit,
                     checkpointDir: String,
                     availableNow: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery =
    fileStreamForeachBatch(spark, incomingDir, schema, checkpointDir,
      onBatch = (batch, batchId) =>
        saveState(mergeBatch(loadState(), batch, batchId)),
      availableNow = availableNow)

  /** The file-stream → foreachBatch harness shared by T1
    * ([[continuousSync]]) and the streamed T3 (incremental BM25 stats
    * inside a real stream run): stream parquet files from a directory
    * and hand each micro-batch to `onBatch`. AvailableNow = one
    * scheduled catch-up run; `maxFilesPerTrigger` sets the micro-batch
    * granularity (1 = one file per batch, the multi-batch test
    * shape). */
  def fileStreamForeachBatch(spark: SparkSession, incomingDir: String,
      schema: org.apache.spark.sql.types.StructType, checkpointDir: String,
      onBatch: (DataFrame, Long) => Unit, availableNow: Boolean = true,
      maxFilesPerTrigger: Int = 1000)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(incomingDir)
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onBatch(batch, batchId)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** Watermarked tumbling-window event aggregation — the streaming
    * twin of the batch q11 hourly rollup, with real event-time
    * semantics: `delay` bounds how late an event may arrive; in
    * append output mode a window emits exactly once, after the
    * watermark passes its end, and events older than the watermark
    * are DROPPED rather than reopening a finalized window. State is
    * therefore bounded by (windows in flight × keys), independent of
    * stream length — the property that lets this run forever at
    * cluster scale. `tsCol` must be a timestamp column. */
  def windowedEventAgg(events: DataFrame, tsCol: String, keyCol: String,
                       windowLen: String = "1 hour",
                       delay: String = "10 minutes",
                       slide: Option[String] = None): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowLen, slide.getOrElse(windowLen)),
        col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n_events"))

  // ---- T3: incremental BM25 corpus statistics ----

  /** Merge a batch of new documents into running BM25 corpus stats.
    * State: termStats(term, df) + one-row globals(n_docs,
    * total_doc_len). Because df, N, and Σlen are all sums, incremental
    * merge over any batch partitioning equals the batch recompute over
    * the union — the order-independent snapshot semantics SURVEY.md
    * §7.4 risk 2 pins (vs the reference's sequential mid-batch updates,
    * bm25_sparse_indexer.py:545-591). Runs inside foreachBatch; with
    * Delta this is two MERGEs. */
  def mergeBm25Stats(termStats: DataFrame, globals: DataFrame,
                     batch: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame) = {
    import graft.operators.Bm25
    val toks = Bm25.tokens(batch, idCol, textCol)
    val lens = Bm25.docLengths(batch, idCol, textCol)
    val batchTerm = Bm25.termDocFreqs(toks)
    val newTerm = termStats.select(col("term"), col("df"))
      .unionByName(batchTerm)
      .groupBy("term").agg(sum("df").as("df"))
    val batchGlobal = lens.agg(
      count("*").cast("long").as("n_docs"),
      coalesce(sum("doc_len"), lit(0L)).cast("long").as("total_doc_len"))
    val newGlobal = globals.select(col("n_docs"), col("total_doc_len"))
      .unionByName(batchGlobal)
      .agg(sum("n_docs").cast("long").as("n_docs"),
        sum("total_doc_len").cast("long").as("total_doc_len"))
    (newTerm, newGlobal)
  }

  /** Empty BM25 stats state. */
  def emptyBm25State(spark: SparkSession): (DataFrame, DataFrame) = {
    import spark.implicits._
    (Seq.empty[(String, Long)].toDF("term", "df"),
      Seq((0L, 0L)).toDF("n_docs", "total_doc_len"))
  }

  /** Subtractive twin of [[mergeBm25Stats]] — the reference's
    * `remove_documents` path (bm25_sparse_indexer.py:466-510 decrements
    * df / doc-count / total-length when documents leave the index):
    * departures DECREMENT df, N, and Σlen, and vocabulary rows whose df
    * reaches 0 drop out. Because every statistic is a sum, merge-out is
    * exact: remove(merge(S, B), B) = S for any batch B ⊆ the indexed
    * corpus — no rebuild needed for deletes (J5 orphan cleanup, CDC D/U
    * rows).
    *
    * Contract: `removed` must carry the EXACT text each doc was indexed
    * with (the caller looks it up from the standing corpus/snapshot —
    * the reference equivalently replays the stored per-doc term list),
    * and removed ids must actually be indexed; removing a never-indexed
    * doc would corrupt the counts (same contract as the reference,
    * which silently skips unknown ids only because it stores term lists
    * per doc). Scale shape: identical to the merge — one tokenize pass
    * over the BATCH only, summed into the vocabulary-sized stats. */
  def removeBm25Stats(termStats: DataFrame, globals: DataFrame,
                      removed: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame) = {
    import graft.operators.Bm25
    val toks = Bm25.tokens(removed, idCol, textCol)
    val lens = Bm25.docLengths(removed, idCol, textCol)
    val negTerm = Bm25.termDocFreqs(toks)
      .select(col("term"), (-col("df")).as("df"))
    val newTerm = termStats.select(col("term"), col("df"))
      .unionByName(negTerm)
      .groupBy("term").agg(sum("df").as("df"))
      .filter(col("df") > 0)
    val negGlobal = lens.agg(
      (-count("*")).cast("long").as("n_docs"),
      (-coalesce(sum("doc_len"), lit(0L))).cast("long").as("total_doc_len"))
    val newGlobal = globals.select(col("n_docs"), col("total_doc_len"))
      .unionByName(negGlobal)
      .agg(sum("n_docs").cast("long").as("n_docs"),
        sum("total_doc_len").cast("long").as("total_doc_len"))
    (newTerm, newGlobal)
  }

  // ---- T5: failure classification + retry backoff ----

  /** Retryable-error patterns — the single source of truth for both
    * the driver-side classifier and its column twin
    * (webui/tasks/error_classifier.py:26-221, collapsed to the
    * observable contract: retryable patterns vs not). */
  val TransientPatterns: Seq[String] = Seq("timeout", "timed out",
    "connection", "temporarily", "unavailable", "too many requests",
    "rate limit", "503", "502", "429")

  /** Transient vs permanent error classification. */
  def classifyError(message: String): String = {
    val m = if (message == null) "" else message.toLowerCase
    if (TransientPatterns.exists(m.contains)) "transient" else "permanent"
  }

  /** Column twin of [[classifyError]] (codegen'd contains chain), for
    * classifying failure logs in-plan; parity with the driver-side
    * function is spec-guarded. */
  def classifyErrorCol(message: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val m = lower(coalesce(message, lit("")))
    when(TransientPatterns.map(p => m.contains(p)).reduce(_ || _),
      lit("transient")).otherwise(lit("permanent"))
  }

  /** Exponential backoff with cap: min(2^attempt * base, max) seconds. */
  def retryBackoffSeconds(attempt: Int, base: Double = 1.0,
                          max: Double = 300.0): Double =
    math.min(math.pow(2.0, attempt) * base, max)

  /** Halt decision: stop the pipeline after N consecutive failures
    * (executor.py:214-224). Pure fold over an ordered status sequence. */
  def shouldHalt(statuses: Seq[Boolean], threshold: Int): Boolean = {
    var consecutive = 0
    for (ok <- statuses) {
      if (ok) consecutive = 0
      else {
        consecutive += 1
        if (consecutive >= threshold) return true
      }
    }
    false
  }
}
