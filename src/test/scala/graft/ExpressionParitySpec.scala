package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Equivalence guards for the custom codegen expressions against the
  * declarative formulations they replaced — the DuckDB oracles mirror
  * the DECLARATIVE arithmetic, so these tests are what keeps the fast
  * paths oracle-parity-safe. */
class ExpressionParitySpec extends SparkSpec {
  import spark.implicits._

  private val adversarial = Seq(
    "", " ", "Hello World", "don't stop-me now", "a-b-c_d 42 x9",
    "MiXeD CaSe TOKENS", "the and of", "hyphen-chain-of-many-parts",
    "tabs\tand\nnewlines\r\nhere", "digits 123 45x x5 _underscore_",
    "trailing-", "-leading", "double--hyphen", "'quoted' words",
    "a" * 300, ("word " * 100).trim)

  test("Tokenize column == pure-Scala tokenize on adversarial inputs") {
    val df = adversarial.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = df.select(col("id"),
        TextFunctions.tokensCol(col("text")).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    adversarial.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == TextFunctions.tokenize(t),
        s"mismatch on input #$i: '$t'")
    }
  }

  test("Tokenize == the declarative regexp+filter formulation it replaced") {
    def declarative(text: org.apache.spark.sql.Column) = {
      val raw = regexp_extract_all(lower(text),
        lit(TextFunctions.TokenPattern), lit(0))
      val minLen = filter(raw, t => length(t) >= TextFunctions.MinTokenLength)
      val sw = array(TextFunctions.EnglishStopwordsSorted.map(lit): _*)
      filter(minLen, t => !array_contains(sw, t))
    }
    val df = adversarial.toDF("text")
    val diff = df.select(
        TextFunctions.tokensCol(col("text")).as("fast"),
        declarative(col("text")).as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(diff.count() == 0)
    // null propagation matches too
    val n = Seq(Option.empty[String]).toDF("text")
      .select(TextFunctions.tokensCol(col("text")).as("fast"),
        declarative(col("text")).as("slow"))
      .head()
    assert(n.isNullAt(0) && n.isNullAt(1))
  }

  test("HexSliceToLong == conv(substring(hex),16,10) at every seed offset") {
    val df = (0 until 200).map(i => s"probe-$i").toDF("text")
      .withColumn("hex", sha2(col("text").cast("binary"), 256))
    for (seed <- 0 until 8) {
      val diff = df.select(
          org.apache.spark.sql.graftbridge.ColumnBridge.column(
            graft.functions.HexSliceToLong(
              org.apache.spark.sql.graftbridge.ColumnBridge
                .expression(col("hex")), seed * 8)).as("fast"),
          conv(substring(col("hex"), seed * 8 + 1, 8), 16, 10)
            .cast("long").as("slow"))
        .filter(col("fast") =!= col("slow"))
      assert(diff.count() == 0, s"offset ${seed * 8}")
    }
  }

  test("MockEmbed == pure-Scala mockEmbeddingDouble, bit-exact, and " +
      "== the composed sha2+HexSliceToLong formulation it replaced") {
    val dim = 16
    // the declarative arithmetic the DuckDB oracle CTEs mirror — kept
    // here as the parity witness after the Column fast path moved to
    // the single MockEmbed expression
    def declarative(text: org.apache.spark.sql.Column) = {
      val hex = sha2(text.cast("binary"), 256)
      val raw = (0 until 8).map { i =>
        org.apache.spark.sql.graftbridge.ColumnBridge.column(
          graft.functions.HexSliceToLong(
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(hex),
            i * 8)).cast("double") / lit(4294967296.0) * 2.0 - 1.0
      }
      val norm = sqrt(raw.map(r => r * r).reduce(_ + _))
      array(raw.map(_ / norm) ++ Seq.fill(dim - 8)(lit(0.0)): _*)
    }
    val inputs = adversarial.filter(_.nonEmpty) ++
      (0 until 50).map(i => s"probe-$i")
    val df = inputs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = df.select(col("id"),
        TextFunctions.mockEmbeddingCol(col("text"), dim).as("v"),
        declarative(col("text")).as("slow"))
      .as[(Long, Seq[Double], Seq[Double])].collect()
    got.foreach { case (i, fast, slow) =>
      val want = TextFunctions.mockEmbeddingDouble(inputs(i.toInt), dim).toSeq
      assert(fast == want, s"vs Scala on input #$i")   // BIT-exact
      assert(fast == slow, s"vs declarative on input #$i")
    }
    // null text → null vector (the expression's null propagation)
    val n = Seq(Option.empty[String]).toDF("text")
      .select(TextFunctions.mockEmbeddingCol(col("text"), dim))
      .head()
    assert(n.isNullAt(0))
  }

  test("NfcNormalize == java.text.Normalizer NFC; ASCII is identity; " +
      "null propagates") {
    val inputs = Seq(
      "plain ascii only",
      "cafe\u0301 decomposed", "caf\u00e9 composed",
      "mu\u0308ller and m\u00fcller",
      "A\u030a ring = \u00c5",
      "mixed cafe\u0301 caf\u00e9 together", "")
    val df = inputs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = df.select(col("id"),
        TextFunctions.nfcNormalizeCol(col("text")).as("n"))
      .as[(Long, String)].collect().toMap
    inputs.zipWithIndex.foreach { case (t, i) =>
      val want = java.text.Normalizer.normalize(t,
        java.text.Normalizer.Form.NFC)
      assert(got(i.toLong) == want, s"input #$i")
    }
    // decomposed and composed spellings converge (the dedup property)
    assert(got(1L).startsWith("café") && got(2L).startsWith("café"))
    val n = Seq(Option.empty[String]).toDF("text")
      .select(TextFunctions.nfcNormalizeCol(col("text"))).head()
    assert(n.isNullAt(0))
  }

  test("HexSliceToLong rejects inputs shorter than offset + 8") {
    val ex = intercept[Exception] {
      Seq("abcd").toDF("h").select(
        org.apache.spark.sql.graftbridge.ColumnBridge.column(
          graft.functions.HexSliceToLong(
            org.apache.spark.sql.graftbridge.ColumnBridge
              .expression(col("h")), 0))).collect()
    }
    assert(ex.getMessage != null)
  }
}
