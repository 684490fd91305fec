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
  * Usage: `sbt "runMain graft.tools.SkewBench [sfDir] [reps] [factMult]"`;
  * prints one JSON line with per-variant median seconds.
  *
  * `factMult` (default 1) replicates the fact stream in-flight (event_id
  * remapped to stay unique) WITHOUT touching the hot-key fraction: the
  * lever that scales the hot key's ABSOLUTE row count. At the ×10 corpus's
  * 250k hot rows one task absorbs the funnel in sub-second time and plain
  * ≡ salted; the skew penalty is a function of rows-per-hot-task vs
  * rows-per-fair-task, so demonstrating the salted win requires pushing
  * the hot key to task-dominating size — factMult 30 ⇒ 7.5M hot rows.
  */
object SkewBench {

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val factMult = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = graft.GraftSession.local(appName = "graft-skewbench")
    import spark.implicits._

    val hot = graft.Tables.customer(spark, dir)
      .agg(min($"c_custkey")).head().getLong(0)
    def fact: DataFrame = {
      val base = graft.Tables.events(spark, dir)
        .withColumn("user_id",
          when($"event_id" % 4 === 0, lit(hot)).otherwise($"user_id"))
      if (factMult == 1) base
      else base
        .withColumn("copy", explode(sequence(lit(0), lit(factMult - 1))))
        .withColumn("event_id", $"event_id" * factMult + $"copy")
        .drop("copy")
    }
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
    println(f"""{"metric":"skew_join","hot_rows":$hotRows,"fact_mult":$factMult,${meds.map { case (n, m) => s""""$n":${"%.2f".format(m)}""" }.mkString(",")},"reps":$reps,"sf":"$dir"}""")
    spark.stop()
  }
}
