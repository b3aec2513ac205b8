package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the ingest-gate contract
  * check a production pipeline runs before a table is allowed into
  * training (the public pattern: AWS Deequ / Great Expectations —
  * "unit tests for data"). A rule set compiles into ONE aggregation
  * pass over the relation; the verdict relation is rules-sized.
  *
  * Scale shape: every metric is a map-side-combinable aggregate, so
  * the corpus is scanned once and the exchange carries one partial row
  * per partition (plus Spark's expand for the exact distinct counts —
  * one extra shuffle keyed on the checked column, the price of an
  * EXACT distinctness contract). Nothing is collected; the verdict is
  * computed in-plan from the single aggregate row.
  *
  * Determinism: all metrics are ratios of exact longs (sums of 0/1,
  * counts, distinct counts) — one double division per rule, rounded to
  * 6 dp at the final projection, so verdicts replay bit-identically in
  * any engine.
  */
object DataQuality {

  /** A named expectation over one column: `metric >= atLeast` where
    * the metric is a share in [0, 1]. */
  sealed trait Rule {
    def column: String
    def atLeast: Double
    def name: String
  }
  /** Share of rows with a non-null value. */
  final case class Completeness(column: String, atLeast: Double)
      extends Rule { val name = "completeness" }
  /** Distinct non-null values / non-null rows (1.0 = a key). */
  final case class Distinctness(column: String, atLeast: Double)
      extends Rule { val name = "distinctness" }
  /** Share of rows whose value lies in [lo, hi] (nulls fail). */
  final case class Between(column: String, lo: Double, hi: Double,
      atLeast: Double) extends Rule { val name = "between" }
  /** Share of rows whose value is one of `values` (nulls fail). */
  final case class InSet(column: String, values: Seq[String],
      atLeast: Double) extends Rule { val name = "in_set" }

  /** Run the rule set in one aggregation pass. Output (one row per
    * rule, in declaration order): (rule_id, rule, column, metric,
    * threshold, pass). */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "empty rule set")
    rules.foreach(r => require(r.atLeast >= 0.0 && r.atLeast <= 1.0,
      s"threshold out of [0,1]: $r"))

    def share(flag: Column): Column = // exact: long sum / long count
      sum(flag.cast("long")).cast("double") / count(lit(1))
    val metricCols = rules.zipWithIndex.map { case (r, i) =>
      val m = r match {
        case Completeness(c, _) => share(col(c).isNotNull)
        case Distinctness(c, _) =>
          count_distinct(col(c)).cast("double") /
            sum(col(c).isNotNull.cast("long"))
        case Between(c, lo, hi, _) =>
          share(col(c).isNotNull && col(c) >= lo && col(c) <= hi)
        case InSet(c, vs, _) =>
          share(col(c).isNotNull && col(c).isin(vs.map(lit(_)): _*))
      }
      round(m, 6).as(s"_m$i")
    }
    val agged = df.agg(metricCols.head, metricCols.tail: _*)
    val verdicts = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(i).as("rule_id"), lit(r.name).as("rule"),
        lit(r.column).as("column"), col(s"_m$i").as("metric"),
        lit(r.atLeast).as("threshold"),
        (col(s"_m$i") >= r.atLeast).as("pass"))
    }
    agged.select(explode(array(verdicts: _*)).as("v")).select("v.*")
      .orderBy("rule_id")
  }
}
