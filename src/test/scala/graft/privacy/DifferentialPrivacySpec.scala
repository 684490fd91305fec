package graft.privacy

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.privacy.DifferentialPrivacy.DpBudget

/** The DP primitive's three properties: the noise is calibrated (empirical
  * Laplace scale ≈ sensitivity/ε over many groups), the draw is
  * deterministic per group (replayability — and the single-draw rule), and
  * the budget ledger fails closed. */
class DifferentialPrivacySpec extends SparkSpec {

  private def grouped = {
    val s = spark
    import s.implicits._
    (1 to 4000).map(i => (s"g$i", (i % 7) + 10L)).toDF("k", "n")
  }

  test("empirical noise scale matches Laplace(b = 1/epsilon)") {
    val s = spark
    import s.implicits._
    for (eps <- Seq(0.5, 1.0, 2.0)) {
      val noisy = DifferentialPrivacy.dpCount(grouped, $"k", eps, seed = "spec")
        .select(abs($"noisy_n_e2" / 100.0 - $"n").as("absNoise"),
          ($"noisy_n_e2" / 100.0 - $"n").as("noise"))
      val b = 1.0 / eps
      // E|Laplace(b)| = b; 4000 draws put the sample mean well within 10%
      val meanAbs = noisy.agg(avg($"absNoise")).head().getDouble(0)
      assert(math.abs(meanAbs - b) < 0.1 * b + 0.02,
        s"eps=$eps: mean |noise| $meanAbs vs expected $b")
      // and the signs balance
      val pos = noisy.filter($"noise" > 0).count()
      assert(math.abs(pos - 2000.0) < 200, s"eps=$eps: $pos positive of 4000")
    }
  }

  test("the draw is deterministic per group key and seed") {
    val s = spark
    import s.implicits._
    val a = DifferentialPrivacy.dpCount(grouped, $"k", 1.0, "spec")
      .select($"k", $"noisy_n_e2").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = DifferentialPrivacy.dpCount(grouped, $"k", 1.0, "spec")
      .select($"k", $"noisy_n_e2").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b)
    // a different seed is a different (still deterministic) draw
    val c = DifferentialPrivacy.dpCount(grouped, $"k", 1.0, "other")
      .select($"k", $"noisy_n_e2").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c !== a)
  }

  test("the budget ledger fails closed and is not resettable by re-reads") {
    val s = spark
    import s.implicits._
    val budget = DpBudget.inMemory(2.5)
    DifferentialPrivacy.dpCount(grouped, $"k", 1.0, "spec", budget = Some(budget))
    DifferentialPrivacy.dpCount(grouped, $"k", 1.0, "spec", budget = Some(budget))
    assert(math.abs(budget.remaining - 0.5) < 1e-9)
    val e = intercept[PolicyViolationException](
      DifferentialPrivacy.dpCount(grouped, $"k", 1.0, "spec", budget = Some(budget)))
    assert(e.getMessage.contains("budget exhausted"))
    // the failed attempt did not spend anything
    assert(math.abs(budget.remaining - 0.5) < 1e-9)
    // a query within the remainder still passes
    DifferentialPrivacy.dpCount(grouped, $"k", 0.5, "spec", budget = Some(budget))
    assert(budget.remaining < 1e-9)
  }

  test("production salt: the q170 contract holds under a non-default seed (budget is seed-independent, only the draw moves)") {
    val s = spark
    import s.implicits._
    // stands in for the per-release secret salt the scaladoc prescribes
    // for deployment (DifferentialPrivacy.scala:22-27)
    val salt = "release-7f3a-secret-salt"
    // 1. the draw is still deterministic per (key, salt) and differs from
    //    the spec seed's draw — same machinery, different stream
    val a = DifferentialPrivacy.dpCount(grouped, $"k", 1.0, salt)
      .select($"k", $"noisy_n_e2").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = DifferentialPrivacy.dpCount(grouped, $"k", 1.0, salt)
      .select($"k", $"noisy_n_e2").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b, "per-release salt must still be replayable within the release")
    val spec = DifferentialPrivacy.dpCount(grouped, $"k", 1.0, "spec")
      .select($"k", $"noisy_n_e2").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a !== spec, "a new salt must move the draw")
    // 2. calibration is salt-independent: mean |noise| ≈ b = 1/ε
    val meanAbs = DifferentialPrivacy.dpCount(grouped, $"k", 1.0, salt)
      .agg(avg(abs($"noisy_n_e2" / 100.0 - $"n"))).head().getDouble(0)
    assert(math.abs(meanAbs - 1.0) < 0.12, s"salted mean |noise| $meanAbs vs 1.0")
    // 3. the DURABLE ledger's spend/reject sequence is identical under
    //    either seed: ε accounting never sees the salt
    def spendSequence(seed: String): (Double, String) = {
      val dir = java.nio.file.Files.createTempDirectory("dp-salt-").toString
      val budget = DpBudget.durable(dir, 2.5)
      DifferentialPrivacy.dpCount(grouped, $"k", 1.0, seed, budget = Some(budget))
      DifferentialPrivacy.dpCount(grouped, $"k", 1.0, seed, budget = Some(budget))
      val rejected = intercept[PolicyViolationException](
        DifferentialPrivacy.dpCount(grouped, $"k", 1.0, seed, budget = Some(budget)))
      (budget.remaining, rejected.getMessage)
    }
    val (remSalt, msgSalt) = spendSequence(salt)
    val (remSpec, msgSpec) = spendSequence("spec")
    assert(math.abs(remSalt - remSpec) < 1e-9 && math.abs(remSalt - 0.5) < 1e-9)
    assert(msgSalt === msgSpec, "rejection must not depend on the seed")
  }

  test("invalid epsilons are rejected") {
    val s = spark
    import s.implicits._
    intercept[IllegalArgumentException](DpBudget.inMemory(0.0))
    intercept[IllegalArgumentException](
      DifferentialPrivacy.dpCount(grouped, $"k", -1.0, "spec",
        budget = Some(DpBudget.inMemory(1.0))))
  }
}
