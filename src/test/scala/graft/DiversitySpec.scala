package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Corpus-composition diversity: closed-form golden values on
  * constructed distributions, plus the degenerate edges. */
class DiversitySpec extends SparkSpec {
  import spark.implicits._

  private def row(df: org.apache.spark.sql.DataFrame) = {
    val r = TextAnalysis.diversity(df, "g").collect()(0)
    (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4))
  }

  test("uniform groups: maximal entropy, simpson = 1/G, gini = 0") {
    val df = (for (g <- 'a' to 'd'; i <- 1 to 25)
      yield (s"$g", i)).toDF("g", "x")
    val (gc, h, hn, simp, gini) = row(df)
    assert(gc == 4L)
    assert(math.abs(h - math.log(4.0)) < 1e-6)
    assert(hn == 1.0)
    assert(simp == 0.25)
    assert(gini == 0.0)
  }

  test("single group: zero entropy, simpson 1, gini 0 (no 0/0)") {
    val df = (1 to 10).map(i => ("only", i)).toDF("g", "x")
    val (gc, h, hn, simp, gini) = row(df)
    assert((gc, h, hn, simp, gini) == ((1L, 0.0, 0.0, 1.0, 0.0)))
  }

  test("monopoly skew: entropy near 0, simpson near 1, gini high; " +
      "NULL group values are excluded") {
    val df = ((1 to 97).map(i => ("big", i)) ++
      Seq(("s1", 1), ("s2", 2), ("s3", 3)) ++
      Seq((null: String, 99))).toDF("g", "x")
    val (gc, h, hn, simp, gini) = row(df)
    assert(gc == 4L) // null excluded
    assert(hn < 0.2, s"norm_entropy=$hn")
    assert(simp > 0.9)
    // hand-computed: sizes asc (1,1,1,97), N=100, G=4
    // gini = (2*(1*1+2*1+3*1+4*97) - 5*100) / (4*100) = (788-500)/400
    assert(gini == 0.72)
  }

  test("known two-group split replays the closed forms exactly") {
    // sizes (1, 3): N=4, G=2
    val df = (Seq(("a", 1)) ++ (1 to 3).map(i => ("b", i)))
      .toDF("g", "x")
    val (gc, h, hn, simp, gini) = row(df)
    assert(gc == 2L)
    val expH = math.log(4.0) - (3.0 * math.log(3.0)) / 4.0
    assert(math.abs(h - expH) < 1e-6)
    assert(math.abs(hn - expH / math.log(2.0)) < 1e-6)
    assert(simp == (1.0 + 9.0) / 16.0)
    // gini = (2*(1*1+2*3) - 3*4) / (2*4) = (14-12)/8 = 0.25
    assert(gini == 0.25)
  }
}
