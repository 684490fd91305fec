package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measures the q101 salting claim (r10 verdict #4): on a corpus where one
  * key owns a constant FRACTION of the fact table (so the hot key's row
  * count scales with the corpus), the salted `(key, salt)` join must beat
  * the plain key-only shuffle join — the plain plan funnels the hot key's
  * entire row set through one task no matter how many executors exist.
  *
  * Three variants, same result set (SkewSpec pins R-invariance):
  *   - `plain`  — R=1 salted join (degenerate constant salt, same plan
  *     family minus the spread), shuffle-hash pinned, AQE as configured;
  *   - `salted` — R=8, shuffle-hash pinned;
  *   - `auto`   — no hint, Catalyst + AQE free rein (at gate-scale dim
  *     sizes this broadcasts and sidesteps the fact shuffle entirely —
  *     the right plan HERE and unavailable at 100 TB dim sizes, which is
  *     exactly why the shuffle-family comparison is the one that matters).
  *
  * Hot key: 1 in 4 fact rows are remapped onto one existing customer key
  * (deterministic `event_id % 4` — no RNG), so ×10 data ⇒ ×10 hot-key rows.
  *
  * Usage: `sbt "runMain graft.tools.SkewBench [sfDir] [reps]"`; prints one
  * JSON line with per-variant median seconds.
  */
object SkewBench {

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.local(appName = "graft-skewbench")
    import spark.implicits._

    val hot = graft.Tables.customer(spark, dir)
      .agg(min($"c_custkey")).head().getLong(0)
    def fact: DataFrame = graft.Tables.events(spark, dir)
      .withColumn("user_id",
        when($"event_id" % 4 === 0, lit(hot)).otherwise($"user_id"))
    def dim: DataFrame = graft.Tables.customer(spark, dir)

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "plain" -> (() => graft.queries.EventQueries.q101SaltedJoinOn(fact, dim, salts = 1)),
      "salted" -> (() => graft.queries.EventQueries.q101SaltedJoinOn(fact, dim, salts = 8)),
      "auto" -> (() => fact
        .join(dim.select($"c_custkey", $"c_mktsegment"), $"user_id" === $"c_custkey")
        .groupBy($"c_mktsegment", $"event_type")
        .agg(count(lit(1)).as("n"), graft.functions.Grid.sum2($"value").as("sum_value"))
        .orderBy($"c_mktsegment", $"event_type")))

    // warm once (codegen/scan caches), then interleave reps round-robin
    variants.foreach { case (_, q) =>
      q().write.format("noop").mode("overwrite").save()
    }
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; (name, q) <- variants) {
      val t0 = System.nanoTime()
      q().write.format("noop").mode("overwrite").save()
      times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
    }
    val hotRows = fact.filter($"user_id" === hot).count()
    val meds = variants.map { case (n, _) => n -> median(times(n)) }
    println(f"""{"metric":"skew_join","hot_rows":$hotRows,${meds.map { case (n, m) => s""""$n":${"%.2f".format(m)}""" }.mkString(",")},"reps":$reps,"sf":"$dir"}""")
    spark.stop()
  }
}
