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
}
