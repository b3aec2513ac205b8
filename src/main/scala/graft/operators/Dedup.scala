package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus deduplication operators for large-scale training-data
  * pipelines: exact (content-hash), n-gram Jaccard, MinHash+LSH,
  * SimHash, and embedding-cosine near-dup.
  *
  * Reference anchor: the engine's own dedup surface is exact
  * content_hash change-skip (packages/shared/pipeline/executor.py:713-744
  * — operator P7); the near-dup family extends it with the standard
  * public algorithms (Broder MinHash / Charikar SimHash).
  *
  * Scale posture: every variant is a hash-partition + equi-join — no
  * all-pairs comparison ever leaves a bucket. Exact dedup shuffles once
  * on the hash; MinHash LSH shuffles on (band, band_hash); SimHash
  * pigeonholes 64-bit fingerprints into 4×16-bit blocks so Hamming≤3
  * candidates meet on an exact block join.
  */
object Dedup {

  /** SHA-256 content hash (ref pipeline/types.py:162 / F2). */
  def contentHash(text: Column): Column = sha2(text.cast("binary"), 256)

  /** Exact dedup: group identical content, keep the smallest id.
    * Output: (id, content_hash, dup_count, is_kept). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = df.select(col(idCol).as("id"),
      contentHash(col(textCol)).as("content_hash"))
    val w = Window.partitionBy("content_hash")
    h.withColumn("dup_count", count("*").over(w))
      .withColumn("keep_id", min("id").over(w))
      .withColumn("is_kept", col("id") === col("keep_id"))
      .select("id", "content_hash", "dup_count", "keep_id", "is_kept")
  }

  /** Distinct token n-gram shingles per doc: (id, shingle).
    * The token array is projected FIRST so the gram lambda references a
    * materialized attribute — inlining the tokenizer expression into the
    * lambda would re-run the regex once per gram (O(tokens²)/doc). */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = col("_toks")
    // sequence(0, -1) would count DOWN; guard short docs with an
    // explicit empty array instead
    val grams = when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
    df.select(col(idCol).as("id"),
        TextFunctions.tokensCol(col(textCol), removeStopwords = false).as("_toks"))
      .select(col("id"), explode(grams).as("shingle"))
      .distinct()
  }

  /** Pairwise n-gram Jaccard for a given candidate pair set
    * `pairs(id_a, id_b)` — pure relational: |A∩B| via an equi-join on
    * shingle, |A∪B| = |A|+|B|−|A∩B|. Never all-pairs: feed it LSH
    * candidates (or any bounded pair relation). */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   pairs: DataFrame, n: Int): DataFrame =
    ngramJaccardFrom(shingles(df, idCol, textCol, n).cache(), pairs)

  /** [[ngramJaccard]] over a precomputed (id, shingle) relation. */
  def ngramJaccardFrom(sh: DataFrame, pairs: DataFrame): DataFrame = {
    val sizes = sh.groupBy("id").agg(count("*").as("n_shingles"))
    val a = sh.select(col("id").as("id_a"), col("shingle"))
    val b = sh.select(col("id").as("id_b"), col("shingle"))
    val inters = pairs.join(a, "id_a").join(b, Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count("*").as("n_inter"))
    pairs
      .join(inters, Seq("id_a", "id_b"), "left")
      .na.fill(0L, Seq("n_inter"))
      .join(sizes.withColumnRenamed("id", "id_a")
              .withColumnRenamed("n_shingles", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b")
              .withColumnRenamed("n_shingles", "n_b"), "id_b")
      .withColumn("jaccard",
        when(col("n_a") + col("n_b") - col("n_inter") === 0, lit(0.0))
          .otherwise(col("n_inter").cast("double") /
            (col("n_a") + col("n_b") - col("n_inter"))))
      .select("id_a", "id_b", "n_inter", "n_a", "n_b", "jaccard")
  }

  /** Seeded hash families for MinHash/SimHash.
    * - xxhash64: the scale default (cheapest; codegen'd)
    * - sha-32-bit: slower but expressible in the DuckDB oracle
    *   (('0x' || substr(sha256(seed || ':' || x), 1, 8))::UBIGINT),
    *   so the full LSH pipeline can be hash-verified end-to-end */
  def xxHashFamily(seed: Int, c: Column): Column = xxhash64(lit(seed), c)

  /** Seed s reads 8 hex chars at offset (s%8)·8 of sha256("{s/8}:" ||
    * x): one digest yields EIGHT independent 32-bit hashes, so 16
    * minhash seeds cost 2 sha256 evaluations per shingle (Spark's
    * common-subexpression elimination computes each digest once). */
  def shaHashFamily(seed: Int, c: Column): Column =
    conv(substring(
      sha2(concat(lit(s"${seed / 8}:"), c).cast("binary"), 256),
      (seed % 8) * 8 + 1, 8), 16, 10).cast("long")

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the min over the doc's shingles of hash(seed, shingle).
    * Output: (id, signature ARRAY<BIGINT>). One shuffle (the groupBy in
    * shingles' distinct); signatures are fixed-width regardless of doc
    * size. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        n: Int, numHashes: Int): DataFrame =
    minhashSignaturesFrom(shingles(df, idCol, textCol, n), numHashes)

  /** [[minhashSignatures]] over a precomputed (id, shingle) relation. */
  def minhashSignaturesFrom(sh: DataFrame, numHashes: Int,
                            hashFamily: (Int, Column) => Column =
                              xxHashFamily): DataFrame = {
    val hashed = sh.select(col("id"),
      array((0 until numHashes).map(s =>
        hashFamily(s, col("shingle"))): _*).as("hs"))
    // one min() per seed — partial-aggregates map-side, so the shuffle
    // carries numHashes longs per doc, not the shingle set
    val mins = (0 until numHashes).map(i =>
      min(element_at(col("hs"), i + 1)).as(s"m$i"))
    hashed.groupBy("id").agg(mins.head, mins.tail: _*)
      .select(col("id"),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("signature"))
  }

  /** LSH banding: split the signature into `bands` bands and emit one
    * (band, band_hash) bucket key per band. Docs colliding in ANY band
    * become candidate pairs (id_a < id_b). The self-join runs inside
    * bucket groups only. */
  def minhashCandidates(signatures: DataFrame, numHashes: Int,
                        bands: Int): DataFrame = {
    require(numHashes % bands == 0, s"numHashes $numHashes not divisible by $bands")
    val rows = numHashes / bands
    // the joined string IS the bucket key (hashing it again only fixed
    // the width; the string form is also oracle-expressible)
    val banded = signatures.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => array_join(transform(slice(col("signature"), b * rows + 1, lit(rows)),
          x => x.cast("string")), ","))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    val l = banded.select(col("band"), col("band_hash"), col("id").as("id_a"))
    val r = banded.select(col("band"), col("band_hash"), col("id").as("id_b"))
    l.join(r, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Full MinHash-LSH near-dup: candidates verified by exact n-gram
    * Jaccard ≥ threshold. */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, numHashes: Int = 16, bands: Int = 4,
                      threshold: Double = 0.8,
                      hashFamily: (Int, Column) => Column =
                        xxHashFamily): DataFrame = {
    // one shingle relation feeds both the signature and the verify
    // branches (otherwise the explode+distinct shuffle runs twice)
    val sh = shingles(df, idCol, textCol, n).cache()
    val sigs = minhashSignaturesFrom(sh, numHashes, hashFamily)
    val cands = minhashCandidates(sigs, numHashes, bands)
    ngramJaccardFrom(sh, cands)
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash over tokens (Charikar): bit b of the fingerprint is the
    * sign of Σ_terms tf · (bit b of hash(term) ? +1 : −1). Computed as
    * `bits` conditional sums in one aggregation — single shuffle on id,
    * fully codegen'd. Default 64-bit xxhash; the sha family gives a
    * 32-bit fingerprint that the DuckDB oracle reproduces. */
  def simhash(df: DataFrame, idCol: String, textCol: String,
              bits: Int = 64,
              hashFamily: (Int, Column) => Column = xxHashFamily)
      : DataFrame = {
    require(bits >= 4 && bits <= 64 && bits % 4 == 0)
    val toks = df.select(col(idCol).as("id"),
      explode(TextFunctions.tokensCol(col(textCol), removeStopwords = false))
        .as("term"))
    val tf = toks.groupBy("id", "term").agg(count("*").as("tf"))
      .withColumn("h", hashFamily(0, col("term")))
    val bitSums = (0 until bits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1L) === 1L, col("tf"))
        .otherwise(-col("tf"))).as(s"b$b")
    }
    tf.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"),
        (0 until bits).map(b =>
          when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist (≤ 3):
    * pigeonhole on 4 × 16-bit blocks — any pair within distance 3 must
    * agree exactly on ≥ 1 block, so candidates meet on an equi-join on
    * (block_idx, block_value); verified with bit_count(xor). */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxDist: Int = 3, bits: Int = 64,
                      hashFamily: (Int, Column) => Column =
                        xxHashFamily): DataFrame = {
    require(maxDist <= 3, "4-block pigeonhole covers Hamming distance <= 3")
    val blockBits = bits / 4
    val mask = (1L << blockBits) - 1
    val fp = simhash(df, idCol, textCol, bits, hashFamily).cache()
    val blocks = fp.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("simhash"), i * blockBits)
          .bitwiseAND(mask)): _*)))
      .withColumnRenamed("pos", "block").withColumnRenamed("col", "block_val")
    val l = blocks.select(col("block"), col("block_val"),
      col("id").as("id_a"), col("simhash").as("sim_a"))
    val r = blocks.select(col("block"), col("block_val"),
      col("id").as("id_b"), col("simhash").as("sim_b"))
    l.join(r, Seq("block", "block_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Embedding-cosine near-dup: LSH-bucket the vectors (random
    * hyperplanes), compare only within buckets, keep pairs with
    * cosine ≥ threshold. */
  def embeddingNearDups(vectors: DataFrame, idCol: String, vecCol: String,
                        dim: Int, threshold: Double = 0.95,
                        nPlanes: Int = 8): DataFrame = {
    val planes = Knn.hyperplanes(nPlanes, dim)
    val bucketed = vectors.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", Knn.lshBucket(col("vec"), planes))
    val l = bucketed.select(col("bucket"), col("id").as("id_a"),
      col("vec").as("vec_a"))
    val r = bucketed.select(col("bucket"), col("id").as("id_b"),
      col("vec").as("vec_b"))
    l.join(r, "bucket")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        graft.functions.VectorFunctions.cosine(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
