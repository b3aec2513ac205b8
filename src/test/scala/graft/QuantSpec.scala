package graft

import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => V}
import graft.operators.Quant

class QuantSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private def vec(i: Int): Seq[Float] =
    (0 until dim).map(d => (math.cos(i * 13 + d * 5) * (d + 1)).toFloat)
  private lazy val vectors = (0 until 30).map(i => (i.toLong, vec(i)))
    .toDF("vec_id", "embedding")

  test("fitInt8: per-dim max-abs scales, 1.0 for all-zero dims") {
    val withZero = vectors.withColumn("embedding",
      concat(col("embedding"), array(lit(0.0f))))
    val s = Quant.fitInt8(withZero, "embedding", dim + 1)
    assert(s.length == dim + 1)
    assert(s.last == 1.0) // all-zero extra dim
    (0 until dim).foreach { d =>
      val expected = (0 until 30).map(i => math.abs(vec(i)(d).toDouble)).max
      assert(math.abs(s(d) - expected) < 1e-12)
    }
  }

  test("encodeInt8: codes bounded, max-abs dim hits ±127") {
    val s = Quant.fitInt8(vectors, "embedding", dim)
    val codes = vectors.select(
        Quant.encodeInt8(col("embedding"), s).as("codes"))
      .as[Seq[Int]].collect()
    assert(codes.forall(_.forall(c => c >= -127 && c <= 127)))
    assert(codes.exists(_.exists(c => math.abs(c) == 127)))
  }

  test("int8 approximate top-k tracks the exact dot-product ranking") {
    val s = Quant.fitInt8(vectors, "embedding", dim)
    val q = vec(3).map(_.toDouble).toArray
    val approx = Quant.int8TopK(vectors, "vec_id", "embedding", q, 5, s)
      .select("vec_id").as[Long].collect().toSeq
    val exact = vectors.withColumn("sc",
        V.dot(col("embedding"), array(q.toIndexedSeq.map(lit): _*)))
      .orderBy(col("sc").desc, col("vec_id"))
      .limit(5).select("vec_id").as[Long].collect().toSeq
    assert(approx.head == exact.head) // top-1 survives quantization
    assert((approx.toSet & exact.toSet).size >= 4)
  }

  test("packBits: sign bits land in 32-bit words, little-endian per " +
      "word; driver and column packs agree") {
    // 34 dims: word 0 full, word 1 has 2 bits — alternating signs
    val v = (0 until 34).map(d => if (d % 3 == 0) 1.0f else -1.0f)
    val got = Seq(Tuple1(v)).toDF("e")
      .select(Quant.packBits(col("e"), 34).as("b"))
      .head().getSeq[Long](0)
    val local = Quant.packBitsLocal(v.map(_.toDouble).toArray)
    assert(got == local.toSeq, s"$got vs ${local.toSeq}")
    var w0 = 0L; var w1 = 0L
    (0 until 34).foreach { d =>
      if (d % 3 == 0) { if (d < 32) w0 |= 1L << d else w1 |= 1L << (d - 32) }
    }
    assert(got == Seq(w0, w1))
  }

  test("binary top-k: Hamming shortlist + exact refine recovers the " +
      "exact top-1; hamming of the identical vector is 0") {
    val q = vec(7).map(_.toDouble).toArray
    val got = Quant.binaryTopK(vectors, "vec_id", "embedding", q,
        k = 5, shortlist = 20, dim = dim).collect()
    val byId = got.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(7L) == 0L, s"self hamming: ${byId.get(7L)}") // q = vec(7)
    val exactTop = vectors.withColumn("sc",
        V.cosine(col("embedding"), array(q.toIndexedSeq.map(lit): _*)))
      .orderBy(col("sc").desc, col("vec_id"))
      .limit(1).select("vec_id").as[Long].head()
    assert(got.head.getLong(0) == exactTop)
  }
}
