package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Accuracy contracts of the q45 sketch aggregates — the checks the oracle
  * gate cannot do (DuckDB's sketches are different implementations, so q45
  * is rows-only there). Run at sf0.01 against the EXACT counterparts.
  *
  * Bounds asserted are the documented ones:
  *  - `approx_count_distinct(rsd=0.05)`: HLL++ relative standard deviation
  *    0.05 → |approx−exact|/exact within 3×rsd (≈99.7% confidence; the
  *    data is fixed, so this is deterministic once green);
  *  - `approx_percentile(…, accuracy=10000)`: the returned value's
  *    empirical rank is within 1/accuracy (+1 row of slack for returning
  *    an actual element, not an interpolation) of the target quantile.
  */
class SketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct tracks exact distinct within 3x rsd") {
    val s = spark
    import s.implicits._
    val joined = EventQueries.q45Sketches(s, dir).as("a")
      .join(graft.Tables.events(s, dir)
        .groupBy($"event_type")
        .agg(countDistinct($"user_id").as("du_exact")).as("e"), "event_type")
      .select($"event_type", $"du_approx", $"du_exact").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (approx, exact) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 3 * 0.05,
        s"${r.getString(0)}: approx=$approx exact=$exact relErr=$relErr > 0.15")
    }
  }

  test("approx_percentile's rank error is within the documented 1/accuracy bound") {
    val s = spark
    import s.implicits._
    val ev = graft.Tables.events(s, dir).select($"event_type", $"value").cache()
    try {
      val sizes = ev.groupBy($"event_type").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val approx = EventQueries.q45Sketches(s, dir)
        .select($"event_type", $"p50_approx", $"p95_approx").collect()
      assert(approx.nonEmpty)
      for (r <- approx; (q, v) <- Seq(0.5 -> r.getDouble(1), 0.95 -> r.getDouble(2))) {
        val et = r.getString(0)
        val n = sizes(et).toDouble
        // empirical CDF just below and at the returned element: the target
        // quantile must fall in [rank(<v)/n - eps, rank(<=v)/n + eps]
        val below = ev.filter($"event_type" === et && $"value" < v).count().toDouble
        val atOrBelow = ev.filter($"event_type" === et && $"value" <= v).count().toDouble
        val eps = 1.0 / 10000 + 1.0 / n
        assert(q >= below / n - eps && q <= atOrBelow / n + eps,
          s"$et q=$q: value $v has rank window [${below / n}, ${atOrBelow / n}], eps=$eps")
      }
    } finally { ev.unpersist(blocking = true); () }
  }

  test("q45's gated projection certifies the contract: every verdict column is 1") {
    val rows = EventQueries.q45ApproxStats(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      for (c <- Seq("hll_ok", "p50_ok", "p95_ok"))
        assert(r.getAs[Long](c) == 1L, s"$c flipped to 0 in $r")
    }
  }
}
