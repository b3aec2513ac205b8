package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Chunking, Dedup}

/** The ingestion pipeline (SURVEY.md §3.3) as one batch lineage:
  * documents → chunk (flatMap UDTF) → mock-embed (column ops) → wide
  * chunks table (FIXTURES.md §2), partitioned by collection_id.
  *
  * Scale posture: chunking and embedding are narrow (no shuffle); the
  * only shuffle is the per-doc window for total_chunks, keyed by doc_id.
  * The write partitions by collection_id so every query prunes to its
  * collection (the reference's 100-way hash layout,
  * shared/database/partition_utils.py:149,200, is mirrored by the
  * partition_key column).
  */
object Ingest {

  /** Build the queryable chunks table for one collection. */
  def buildChunks(docs: DataFrame, collectionId: String,
                  idCol: String, textCol: String,
                  strategy: String = "recursive",
                  cfg: Chunking.ChunkConfig = Chunking.ChunkConfig(),
                  dim: Int = 64): DataFrame = {
    // total_chunks comes out of the chunk flatMap itself — the whole
    // build stays narrow (zero shuffles scan -> table). NOTE: a
    // repartition-before-chunking "spread" for few-split local inputs
    // was tried and measured SLOWER at bench scale — the extra
    // exchange plus 32-task stage scheduling costs more than the
    // single-task chunk+embed pass it parallelizes. At cluster scale
    // the scan arrives with enough splits anyway.
    val chunks = Chunking.chunkDocumentsWithTotal(docs, idCol, textCol,
      strategy, cfg)
    chunks
      .withColumn("collection_id", lit(collectionId))
      .withColumn("chunk_id",
        concat(col("doc_id"), lit("_"), col("chunk_index")))
      .withColumn("path", col("doc_id"))
      .withColumn("path_id", lit(null).cast("string"))
      .withColumnRenamed("text", "content")
      .withColumn("vector", TextFunctions.mockEmbeddingCol(col("content"), dim))
      .withColumn("partition_key",
        pmod(abs(hash(col("collection_id"))), lit(100)))
      .select("collection_id", "doc_id", "chunk_id", "chunk_index",
        "total_chunks", "path", "content", "start_offset", "end_offset",
        "token_count", "path_id", "vector", "partition_key")
  }

  /** Sparse index naming (F13): the sibling collection that holds a
    * base collection's sparse vectors, "{base}_sparse_{type}"
    * (ref vecpipe/sparse.py:244-254). */
  def sparseCollectionName(base: String, indexerType: String): String =
    s"${base}_sparse_$indexerType"

  /** Change-skip (P7): drop incoming docs whose (doc_id, content_hash)
    * already exists — a left-anti join, the scalable form of the
    * reference's per-file hash lookup (executor.py:713-744). */
  def changeSkip(incoming: DataFrame, existing: DataFrame,
                 idCol: String, textCol: String): DataFrame = {
    val in = incoming.withColumn("content_hash",
      Dedup.contentHash(col(textCol)))
    val ex = existing
      .select(col(idCol), Dedup.contentHash(col(textCol)).as("content_hash"))
    in.join(ex, Seq(idCol, "content_hash"), "left_anti")
  }

  /** Persist partitioned by collection_id (S6 sink equivalent). */
  def writeChunks(chunks: DataFrame, path: String): Unit =
    chunks.write.mode("overwrite").partitionBy("collection_id").parquet(path)

  /** Blue/green reindex (T6): build into a staging dir, then atomically
    * swap the `current` pointer file — readers resolve the pointer and
    * never observe a half-written table. */
  def reindexSwap(spark: SparkSession, chunks: DataFrame,
                  tableRoot: String): String =
    swapPointer(tableRoot)(target => writeChunks(chunks, target))

  /** [[reindexSwap]] for an ARBITRARY relation — index sidecars (BM25
    * stats / doc-weight tables, ANN codebooks) ride the same atomic
    * pointer flip without the chunks-table partitioning contract. */
  def reindexSwapRaw(spark: SparkSession, df: DataFrame,
                     tableRoot: String): String =
    swapPointer(tableRoot)(target =>
      df.write.mode("overwrite").parquet(target))

  /** The pointer-flip half of [[reindexSwap]], factored so any writer
    * (collection-partitioned chunks, layout-partitioned compactions)
    * rides the same atomic swap.
    *
    * CONCURRENT-WRITER guard (VERDICT r13 #7): generation numbers are
    * allocated as max(pointer, retained dirs, standing claims) + 1 and
    * then CLAIMED via a `gen-N.CLAIM` marker created with
    * `Files.createFile` — atomic create-new, succeeds for exactly one
    * caller. Two writers racing on the same root therefore either see
    * each other's claim during allocation (and take disjoint numbers —
    * both complete, each generation single-writer, last pointer flip
    * wins as with any last-writer-wins store) or tie on the same
    * candidate, in which case the loser fails LOUDLY at the claim
    * instead of silently interleaving its files with the winner's.
    * The marker (not the generation directory itself) carries the
    * mutex because Spark's overwrite-mode writer deletes and recreates
    * the target directory, which would briefly release a
    * directory-based claim mid-write. Allocating past retained dirs
    * also means a rolled-back pointer (time travel) never overwrites
    * retained history: the next write takes a FRESH number. */
  private def swapPointer(tableRoot: String)(
      write: String => Unit): String = {
    val fs = new java.io.File(tableRoot)
    fs.mkdirs()
    val current = new java.io.File(fs, "CURRENT")
    val ptrGen = if (current.exists())
      new String(java.nio.file.Files.readAllBytes(current.toPath)).trim
        .stripPrefix("gen-").toInt
    else -1
    val taken = Option(fs.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      .map(_.getName)
      .collect {
        case n if n.startsWith("gen-") && n.endsWith(".CLAIM") =>
          n.stripPrefix("gen-").stripSuffix(".CLAIM").toInt
        case n if n.startsWith("gen-") && !n.contains(".") =>
          n.stripPrefix("gen-").toInt
      }
    // Monotonic HIGH-WATER mark (VERDICT r14 #5): max(pointer, dirs,
    // claims)+1 alone can REUSE a generation number after a
    // time-travel rollback followed by an aggressive vacuum (vacuum
    // deletes both the gen dirs and their claim markers above the
    // rolled-back pointer) — a stale reader holding the old gen path
    // would then silently see new data. The HIGHWATER file records
    // the highest number ever claimed and joins the allocation max,
    // so numbers are truly never reused.
    val hwFile = new java.io.File(fs, "HIGHWATER")
    def readHw(): Int =
      if (hwFile.exists())
        new String(java.nio.file.Files.readAllBytes(hwFile.toPath))
          .trim.toInt
      else -1
    // Bounded allocate-and-retry on claim collision (ADVICE r14): two
    // writers that both listed the root before either claimed compute
    // the same candidate; the loser re-lists (the winner's CLAIM is
    // now visible) and takes the next number instead of failing its
    // whole reindex job. After `MaxClaimRetries` straight collisions
    // the final attempt's loud failure propagates (a pathological
    // writer storm should fail, not spin).
    val MaxClaimRetries = 5
    def claimNext(attempt: Int): (Int, String) = {
      val listed = Option(fs.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        .map(_.getName)
        .collect {
          case n if n.startsWith("gen-") && n.endsWith(".CLAIM") =>
            n.stripPrefix("gen-").stripSuffix(".CLAIM").toInt
          case n if n.startsWith("gen-") && !n.contains(".") =>
            n.stripPrefix("gen-").toInt
        }
      val gen = ((ptrGen +: readHw() +: (taken ++ listed)).max) + 1
      try gen -> claimGeneration(tableRoot, gen)
      catch {
        case _: IllegalStateException if attempt < MaxClaimRetries =>
          claimNext(attempt + 1)
      }
    }
    val (gen, target) = claimNext(1)
    // advance HIGHWATER right after the claim (write-if-greater via
    // tmp + atomic move; the CLAIM marker itself covers the narrow
    // window between two concurrent writers' read-max-write, since
    // markers outlive the write and vacuum runs much later)
    if (gen > readHw()) {
      val hwTmp = new java.io.File(fs, "HIGHWATER.tmp")
      java.nio.file.Files.writeString(hwTmp.toPath, gen.toString)
      java.nio.file.Files.move(hwTmp.toPath, hwFile.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    write(target)
    val tmp = new java.io.File(fs, "CURRENT.tmp")
    java.nio.file.Files.writeString(tmp.toPath, s"gen-$gen")
    java.nio.file.Files.move(tmp.toPath, current.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    target
  }

  /** Atomically claim generation `gen` under `tableRoot` (create-new
    * marker file — exactly one caller succeeds) and return the
    * generation's target path. Package-private so the two-writer-race
    * spec can exercise the mutex primitive directly. */
  private[graft] def claimGeneration(tableRoot: String, gen: Int): String = {
    val target = s"$tableRoot/gen-$gen"
    try java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$target.CLAIM"))
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"generation gen-$gen under $tableRoot is already claimed: " +
            "another writer holds it (concurrent reindex on the same " +
            "root), or a previous writer crashed before flipping " +
            s"CURRENT — remove $target.CLAIM to recover")
    }
    target
  }

  /** Layout-aware compaction (the lakehouse OPTIMIZE ... ZORDER BY
    * write path): assign every row a DETERMINISTIC target file by its
    * rank under the declared layout order — natural arrival
    * (`Seq(idCol)`), single-key (`Seq(key, idCol)`), or Z-order
    * (`Seq(zkeyCol, idCol)` with a [[graft.operators.Layout.zorderKey2]]
    * column) — via [[graft.operators.Sampling.globalRank]] (relational
    * zipWithIndex: one range shuffle + bounded offsets collect, no
    * corpus-wide window). `file = floor(rank * nFiles / n)` cuts the
    * layout into equal files exactly like
    * [[graft.operators.Layout.skippingAudit]] simulates, so the
    * written layout IS the audited layout. A repartitionByRange writer
    * would instead sample range boundaries per run — nondeterministic
    * file contents, unauditable zone maps. */
  def compactWithLayout(df: DataFrame, layoutKeys: Seq[String],
                        nFiles: Int): DataFrame = {
    require(nFiles >= 1, s"bad nFiles: $nFiles")
    val ranked = graft.operators.Sampling.globalRank(df, layoutKeys,
      "position")
    val withN = ranked.crossJoin(
      org.apache.spark.sql.functions.broadcast(
        ranked.agg(count(lit(1)).as("_n"))))
    withN.withColumn("file",
        floor(col("position") * nFiles.toDouble / col("_n")))
      .drop("position", "_n")
  }

  /** [[reindexSwap]] for a [[compactWithLayout]] relation: one
    * directory per target file id (`file=N/`), so every file's
    * parquet min/max footer stats — its zone maps — are a
    * deterministic function of the data and the layout keys. */
  def reindexSwapLayout(spark: SparkSession, laid: DataFrame,
                        tableRoot: String): String =
    swapPointer(tableRoot)(target =>
      laid.write.mode("overwrite").partitionBy("file").parquet(target))

  /** Resolve the current generation of a blue/green table. */
  def readCurrent(spark: SparkSession, tableRoot: String): DataFrame = {
    val gen = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(tableRoot, "CURRENT").toPath)).trim
    spark.read.parquet(s"$tableRoot/$gen")
  }

  /** TIME TRAVEL: read a specific retained generation (`gen-N`) of a
    * blue/green table — every [[reindexSwap]] keeps its predecessors
    * on disk until [[vacuumGenerations]] reclaims them, so any
    * retained snapshot is readable by number, the lakehouse
    * `VERSION AS OF` story. Fails loudly on a vacuumed/unknown
    * generation. */
  def readGeneration(spark: SparkSession, tableRoot: String,
                     gen: Int): DataFrame = {
    val dir = new java.io.File(tableRoot, s"gen-$gen")
    require(dir.isDirectory,
      s"generation gen-$gen not retained under $tableRoot")
    spark.read.parquet(dir.toString)
  }

  /** List retained generation numbers, ascending. */
  def listGenerations(tableRoot: String): Seq[Int] = {
    val fs = new java.io.File(tableRoot).listFiles()
    if (fs == null) Seq.empty
    else fs.toSeq.filter(f => f.isDirectory &&
        f.getName.startsWith("gen-"))
      .map(_.getName.stripPrefix("gen-").toInt).sorted
  }

  /** VACUUM: delete every generation except the newest `keep` (the
    * CURRENT pointer's target is always retained regardless).
    * Returns the deleted generation numbers. The pointer file is
    * never touched, so concurrent readers of the current generation
    * are safe; readers of reclaimed history get a loud failure, not
    * silent partial data. */
  def vacuumGenerations(tableRoot: String, keep: Int): Seq[Int] = {
    require(keep >= 1, s"must keep at least 1 generation: $keep")
    val gens = listGenerations(tableRoot)
    val current = new java.io.File(tableRoot, "CURRENT")
    val cur = if (current.exists())
      new String(java.nio.file.Files.readAllBytes(current.toPath))
        .trim.stripPrefix("gen-").toInt
    else -1
    val doomed = gens.dropRight(keep).filterNot(_ == cur)
    doomed.foreach { g =>
      val dir = new java.io.File(tableRoot, s"gen-$g").toPath
      import scala.jdk.CollectionConverters._
      // Files.walk returns a Stream holding an open directory handle —
      // close it (Using) after collecting, or every vacuumed
      // generation leaks a descriptor in a long-lived driver JVM
      scala.util.Using.resource(java.nio.file.Files.walk(dir)) { st =>
        st.iterator().asScala.toSeq
      }.sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists)
      // the generation's writer-claim marker goes with it (hygiene —
      // gen numbers are never reused thanks to the HIGHWATER mark, so
      // this is cleanup, not a mutex release)
      java.nio.file.Files.deleteIfExists(
        new java.io.File(tableRoot, s"gen-$g.CLAIM").toPath)
    }
    // ORPHAN claim markers (ADVICE r14): a writer that crashed between
    // claimGeneration and its pointer flip leaves a gen-N.CLAIM with
    // no directory that nothing ever reclaimed. Drop markers with no
    // matching directory whose number is below the pointer — they
    // cannot belong to an in-flight writer (a live writer's target is
    // allocated ABOVE the pointer), and the HIGHWATER mark keeps the
    // number from being reused either way.
    Option(new java.io.File(tableRoot).listFiles())
      .map(_.toSeq).getOrElse(Seq.empty)
      .map(_.getName)
      .collect { case n if n.startsWith("gen-") && n.endsWith(".CLAIM") =>
        n.stripPrefix("gen-").stripSuffix(".CLAIM").toInt }
      .filter(g => g < cur &&
        !new java.io.File(tableRoot, s"gen-$g").exists())
      .foreach(g => java.nio.file.Files.deleteIfExists(
        new java.io.File(tableRoot, s"gen-$g.CLAIM").toPath))
    doomed
  }
}
