package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differentially-private aggregate release — the governance surface a
  * corpus-stats endpoint needs before per-group counts (speakers of a
  * rare language, docs from a rare source) can leave the enclave. The
  * mechanism is the standard Laplace release (Dwork 2006): a count
  * query has sensitivity 1, so count + Laplace(1/ε) noise is
  * ε-differentially private.
  *
  * HONEST framing: production DP requires a real entropy source for
  * the noise draw. Here the draw is keyed by md5("<group>:<seed>") —
  * the repo's deterministic-uniform discipline — so the release is
  * bit-reproducible and oracle-replayable while the MECHANISM
  * (inverse-CDF Laplace, the released schema, the
  * no-true-count-in-the-output contract) is the real one; swap the
  * uniform for a secure RNG in production and nothing else changes.
  *
  * Scale shape: one map-side-combinable count aggregation; the noise
  * is a per-GROUP column expression over the bounded count relation.
  */
object Privacy {

  private def uniformFromGroup(groupCol: String, seed: Long): Column = {
    val hex = md5(concat(col(groupCol).cast("string"), lit(s":$seed"))
      .cast("binary"))
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.HexSliceToLong(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(hex),
        0)).cast("double") / lit(4294967296.0)
  }

  /** ε-DP per-group counts. Output: (groupCol, n_noisy 6 dp, epsilon).
    * The true count never appears in the output relation. */
  def dpGroupCounts(df: DataFrame, groupCol: String, epsilon: Double,
                    seed: Long = 42L): DataFrame = {
    require(epsilon > 0.0, s"epsilon must be positive: $epsilon")
    val u = uniformFromGroup(groupCol, seed)
    val c = u - 0.5
    // inverse-CDF Laplace(b = 1/eps); the greatest() floor guards the
    // measure-zero u=0 draw from ln(0) = -inf, identically both engines
    val noise = (-lit(1.0 / epsilon)) * signum(c) *
      log(greatest(lit(1e-12), lit(1.0) - lit(2.0) * abs(c)))
    df.groupBy(groupCol)
      .agg(count(lit(1)).as("__n"))
      .select(col(groupCol),
        round(col("__n").cast("double") + noise, 6).as("n_noisy"),
        lit(epsilon).as("epsilon"))
  }
}
