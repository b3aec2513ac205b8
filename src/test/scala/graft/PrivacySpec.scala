package graft

import java.security.MessageDigest

import graft.operators.Privacy

/** Laplace release: parity with the local inverse-CDF formula,
  * epsilon scaling, and the no-true-count output contract. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private def localNoise(group: String, seed: Long, eps: Double): Double = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"$group:$seed".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val u = java.lang.Long.parseLong(hex.take(8), 16).toDouble / 4294967296.0
    val c = u - 0.5
    -(1.0 / eps) * math.signum(c) *
      math.log(math.max(1e-12, 1.0 - 2.0 * math.abs(c)))
  }

  private val df = (Seq.fill(40)("en") ++ Seq.fill(25)("de") ++
    Seq.fill(3)("zh")).toDF("lang")

  test("released values equal count + the local Laplace draw") {
    val got = Privacy.dpGroupCounts(df, "lang", epsilon = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val expect = Map("en" -> 40L, "de" -> 25L, "zh" -> 3L).map {
      case (g, n) =>
        g -> (BigDecimal(n + localNoise(g, 42L, 0.5))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got == expect, s"$got vs $expect")
  }

  test("larger epsilon means strictly smaller noise magnitude") {
    def noiseAbs(eps: Double) =
      Privacy.dpGroupCounts(df, "lang", eps).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
        .map { case (g, v) =>
          math.abs(v - Map("en" -> 40, "de" -> 25, "zh" -> 3)(g))
        }.sum
    assert(noiseAbs(5.0) < noiseAbs(0.5))
  }

  test("the output schema carries no true count") {
    val cols = Privacy.dpGroupCounts(df, "lang", 1.0).columns.toSet
    assert(cols == Set("lang", "n_noisy", "epsilon"), cols)
  }

  test("a different seed draws different noise") {
    def rel(seed: Long) = Privacy.dpGroupCounts(df, "lang", 0.5, seed)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rel(1L) != rel(2L))
  }
}
