package graft.privacy

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differential-privacy aggregation — the FOURTH clean-room primitive
  * (BigQuery analysis rules' `differential_privacy_policy`, next to the
  * aggregation threshold q22, column masking q167 and join restriction
  * q168): published group counts carry calibrated Laplace noise, so no
  * single row's presence is distinguishable beyond the ε budget, and a
  * per-view PRIVACY BUDGET ledger stops queries once their summed ε
  * exhausts it (the part of DP that is operational, not statistical: an
  * analyst who can re-run a noised query forever averages the noise away,
  * so the ledger — not the noise — is what makes the guarantee hold).
  *
  * Noise: Laplace(b = sensitivity/ε) via the inverse CDF,
  * `x = −b · sgn(u−½) · ln(1 − 2|u−½|)`, with `u` drawn DETERMINISTICALLY
  * from the group key (md5 → 15 hex chars → int64 → e6-grid uniform in
  * (0,1)). Determinism is a property of THIS engine's test harness — it
  * makes the noise replayable by an independent engine (the q170 oracle
  * replays hash → uniform → Laplace in DuckDB text) and the specs exact;
  * a production deployment would key the hash on a per-release secret
  * salt (same machinery, unpredictable to the analyst — the `seed`
  * argument), never re-drawing per query, because re-drawn noise averages
  * away exactly like re-run queries do.
  *
  * Scale shape: noise is one scalar expression per OUTPUT GROUP, appended
  * after the ordinary partial/final count aggregation — zero extra
  * shuffles, zero per-row cost; the budget ledger is driver-side
  * control-plane state (bytes). */
object DifferentialPrivacy {

  /** Per-view ε ledger. `charge` is called by every DP read; once the
    * total would exceed the budget the query is REJECTED — fail-closed,
    * like the sibling policies. */
  final class DpBudget(val totalEpsilon: Double) {
    require(totalEpsilon > 0, "total epsilon budget must be positive")
    private var spent = 0.0
    def spentEpsilon: Double = synchronized(spent)
    def remaining: Double = synchronized(totalEpsilon - spent)
    def charge(epsilon: Double): Unit = synchronized {
      require(epsilon > 0, "per-query epsilon must be positive")
      if (spent + epsilon > totalEpsilon + 1e-12)
        throw new PolicyViolationException(
          f"privacy budget exhausted: spent ε=$spent%.3f of ${totalEpsilon}%.3f, " +
            f"query needs ε=$epsilon%.3f — further reads of this view are not allowed " +
            "(re-running a noised query re-spends budget; averaging re-runs would " +
            "strip the noise)")
      spent += epsilon
    }
  }

  /** The deterministic e6-grid uniform for a group-key column: md5 of
    * (seed:key) → first 15 hex chars → int64 → `(h mod 10⁶ + ½) / 10⁶`.
    * 15 hex chars keep the parse inside int64 on both engines (the
    * established md5-grid idiom, q53/q90's discipline). */
  private def uniformE6(key: Column, seed: String): Column =
    (conv(substring(md5(concat(lit(seed), lit(":"), key)), 1, 15), 16, 10)
      .cast("long") % 1000000L + lit(0.5)) / lit(1000000.0)

  /** Laplace(b) noise via inverse CDF over [[uniformE6]] — one expression,
    * the identical operator tree the oracle states. */
  def laplaceNoise(key: Column, seed: String, b: Double): Column = {
    val u = uniformE6(key, seed)
    val centered = u - lit(0.5)
    -lit(b) * signum(centered) * log(lit(1.0) - lit(2.0) * abs(centered))
  }

  /** ε-DP noised count per group: `count(*) + Laplace(sensitivity/ε)`,
    * exported on the e2 grid (so the cross-engine hash can't hinge on a
    * float print format). `keyCol` must be a deterministic function of the
    * GROUP (one noise draw per group — drawing per row would sum n draws
    * and concentrate away). Charges `budget` if given. */
  def dpCount(grouped: DataFrame, keyCol: Column, epsilon: Double, seed: String,
              countCol: String = "n", sensitivity: Double = 1.0,
              budget: Option[DpBudget] = None): DataFrame = {
    budget.foreach(_.charge(epsilon))
    val b = sensitivity / epsilon
    grouped.withColumn("noisy_" + countCol + "_e2",
      floor((col(countCol) + laplaceNoise(keyCol, seed, b)) * 100 + lit(0.5))
        .cast("long"))
  }
}
