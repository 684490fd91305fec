package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-contract validation — the schema-conformance gate a
  * warehouse load or training-data refresh runs before publishing a
  * snapshot (null checks, value domains, range windows — the
  * row-level half of what q80's profiling stats describe and q81's FK
  * audit covers referentially).
  *
  * A rule is (name, violation predicate). Validation is ONE pass: every
  * rule becomes a conditional-sum aggregate of the same scan, so the cost
  * is a single table read + a |rules|-column partial agg folding to one
  * row, no matter how many rules — then the 1-row result unpivots to a
  * per-rule report, a plan-shape no-op. NULL handling is the rule
  * author's: predicates should state `isNull || !inDomain` explicitly
  * (conditional sums skip NULL predicates on both engines, so an
  * implicit-null rule silently under-counts — the API makes that a
  * visible choice, not a default).
  */
object Contracts {

  final case class Rule(name: String, violated: Column)

  /** Per-rule conformance report: (rule, n_checked, n_violations, pass). */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    val agg = df.agg(
      count(lit(1)).as("n"),
      rules.map(r => sum(when(r.violated, 1L).otherwise(0L)).as("v_" + r.name)): _*)
    rules.map { r =>
      agg.select(lit(r.name).as("rule"), col("n").as("n_checked"),
        coalesce(col("v_" + r.name), lit(0L)).as("n_violations"),
        (coalesce(col("v_" + r.name), lit(0L)) === 0L).cast("long").as("pass"))
    }.reduce(_ unionAll _)
  }
}
