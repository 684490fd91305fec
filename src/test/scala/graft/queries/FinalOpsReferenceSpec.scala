package graft.queries

import graft.{SparkSpec, Tables}

/** Independent references for the round-12 final additions (q237–q245):
  * each test recomputes the operator's answer with a DELIBERATELY
  * different algorithm (naive relaxation loops, dense matrix iteration,
  * direct per-group sorts) in plain Scala over the collected sf0.001
  * rows, and demands exact agreement with the distributed closed forms.
  * The DuckDB oracles prove cross-engine determinism; these prove the
  * closed forms compute the right thing. */
class FinalOpsReferenceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q237: relaxation-join distances equal a naive Bellman-Ford loop") {
    val f = org.apache.spark.sql.functions
    val pairs = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_quantity")
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
        f.col("l_orderkey") === f.col("o_orderkey"))
      .select("o_custkey", "l_suppkey", "l_quantity").collect()
      .map(r => ((r.getLong(0) * 2, r.getLong(1) * 2 + 1),
        math.floor(r.getDouble(2)).toLong))
      .groupBy(_._1)
      .map { case (k, v) => k -> math.max(1L, v.map(_._2).min) }
    val edges = pairs.toSeq.flatMap { case ((cu, su), w) =>
      Seq((cu, su, w), (su, cu, w)) }
    var dist = edges.map(_._1).distinct.filter(_ % 200 == 0)
      .map(_ -> 0L).toMap
    for (_ <- 1 to 4) {                                // naive relaxation
      val relaxed = edges.flatMap { case (s, d, w) =>
        dist.get(s).map(ds => d -> (ds + w)) }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2).min }
    }
    val got = CoreQueries.q237Sssp(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == dist, "SSSP distances must match the Bellman-Ford loop")
  }

  test("q238: the transition fold + chain rounds equal a dense matrix loop") {
    val ev = Tables.events(spark, dir)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        if (r.getString(3) == "purchase") "CONV" else r.getString(3)))
    val tr = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val seq0 = rows.sortBy(r => (r._2, r._3)).map(_._4).toSeq
      val cutAt = seq0.indexOf("CONV")
      val seq = if (cutAt >= 0) seq0.take(cutAt + 1) else seq0
      val full = "START" +: seq
      full.sliding(2).foreach { case Seq(a, b) => tr((a, b)) += 1 }
      if (seq.last != "CONV") tr((seq.last, "END")) += 1
    }
    val tot = tr.toSeq.groupBy(_._1._1)
      .map { case (s, v) => s -> v.map(_._2).sum }
    var p = tot.keys.map(_ -> 0L).toMap ++ Map("CONV" -> 1000000L, "END" -> 0L)
    for (_ <- 1 to 6) {                                // dense iteration
      val next = tot.map { case (s, t) =>
        val m = tr.collect { case ((`s`, d), c) => c * p(d) }.sum
        s -> Math.floorDiv(m, t)
      }
      p = next ++ Map("CONV" -> 1000000L, "END" -> 0L)
    }
    val got = EventQueries.q238MarkovConversion(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == p, "chain probabilities must match the dense loop")
    assert(got("START") > 0L, "the corpus must exercise conversion mass")
  }

  test("q239: IPS/SNIPS equal the direct estimator arithmetic") {
    val ev = Tables.events(spark, dir)
      .select("user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0) % 10, r.getString(1),
        if (r.getDouble(2) >= 10.0) 1L else 0L))
    val nxa = ev.groupBy(t => (t._1, t._2))
      .map { case (k, v) => k -> (v.size.toLong, v.map(_._3).sum) }
    val nx = ev.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val expected = (0L to 9L).flatMap { x =>
      val a = if (x % 2 == 0) "click" else "view"
      nxa.get((x, a)).map { case (nXa, rXa) =>
        val w = Math.floorDiv(1000000L * nx(x), nXa)
        x -> (Math.floorDiv(rXa * w, nx(x)), Math.floorDiv(rXa * 1000000L, nXa))
      }
    }.toMap
    val got = EventQueries.q239IpsEval(spark, dir).collect()
      .filter(_.getLong(0) >= 0)
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got == expected, "per-context IPS/SNIPS must match")
  }

  test("q240: Gram cells equal a direct double loop") {
    val vecs = Tables.embeddings(spark, dir).select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(v =>
        math.floor(v.toDouble * 1000000.0).toLong))
    val expected = (for { i <- 1 to 8; j <- i to 8 } yield {
      val si = vecs.map(_(i - 1)).sum
      val sj = vecs.map(_(j - 1)).sum
      val sij = vecs.map(v => v(i - 1) * v(j - 1)).sum
      (i.toLong, j.toLong) -> (vecs.length.toLong, si, sj, sij)
    }).toMap
    val got = VectorQueries.q240EmbedGram(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == expected, "co-moment sums must match the direct loop")
  }

  test("q241: bars equal direct per-group ordered computation") {
    val ev = Tables.events(spark, dir)
      .select("event_type", "ts", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2),
        math.floor(r.getDouble(3) * 100 + 0.5).toLong))
    val expected = ev.groupBy(t => (t._1, t._2 / 3600000L)).map {
      case ((tp, hr), rows) =>
        val sorted = rows.sortBy(r => (r._2, r._3)).map(_._4)
        (tp, hr) -> (sorted.head, sorted.max, sorted.min, sorted.last,
          sorted.size.toLong, sorted.sum)
    }
    val got = EventQueries.q241OhlcBars(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))).toMap
    assert(got == expected, "OHLC bars must match the direct computation")
  }

  test("q245: the windowed rank selection equals sort-and-pick per flag") {
    val daily = Tables.lineitem(spark, dir)
      .select("l_returnflag", "l_shipdate", "l_extendedprice").collect()
      .map(r => ((r.getString(0),
        r.getTimestamp(1).toLocalDateTime.toLocalDate.toEpochDay -
          java.time.LocalDate.of(1990, 1, 1).toEpochDay),
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val expected = daily.keys.map(_._1).toSeq.distinct.map { rf =>
      val pts = daily.collect { case ((`rf`, d), y) => (d, y) }.toSeq
      val slopes = (for {
        (da, ya) <- pts; (db, yb) <- pts; if da < db
      } yield math.floor((yb - ya) * 1000000.0 / (db - da)).toLong).sorted
      rf -> (slopes.size.toLong, slopes((slopes.size + 1) / 2 - 1))
    }.toMap
    val got = CoreQueries.q245TheilSen(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected, "Theil-Sen lower medians must match")
  }

  test("q242: the fixed-width round-trip is lossless per record") {
    // row-level check, stronger than the gate's rollup: parse(serialize(x))
    // == x for every record, including zero-pad and date formatting edges
    val f = org.apache.spark.sql.functions
    val o = Tables.orders(spark, dir).select(
      f.col("o_orderkey"),
      f.col("o_orderstatus"),
      f.floor(f.col("o_totalprice") * 100 + 0.5).cast("long").as("p_e2"),
      f.date_format(f.col("o_orderdate"), "yyyy-MM-dd").as("dt")).collect()
    o.foreach { r =>
      val rec = f"${r.getLong(0)}%012d" + r.getString(1) +
        f"${r.getLong(2)}%014d" + r.getString(3).replace("-", "")
      assert(rec.length == 35, s"record width drifted: ${rec.length}")
      assert(rec.substring(0, 12).toLong == r.getLong(0))
      assert(rec.substring(12, 13) == r.getString(1))
      assert(rec.substring(13, 27).toLong == r.getLong(2))
      val d = rec.substring(27, 35)
      assert(s"${d.take(4)}-${d.slice(4, 6)}-${d.drop(6)}" == r.getString(3))
    }
  }
}
