package graft.queries

import graft.{SparkSpec, Tables}

/** Independent references for the round-12 late additions: each test
  * recomputes the operator's answer with a DELIBERATELY different
  * algorithm (cursor loops, textbook DP, naive BFS) in plain Scala over
  * the collected sf0.001 rows, and demands exact agreement with the
  * distributed closed forms. The DuckDB oracles prove cross-engine
  * determinism; these prove the closed forms compute the right thing.
  */
class NewOpsReferenceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q223: the window-clamp closed form equals a FIFO cursor loop") {
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_returnflag", "l_quantity", "l_extendedprice",
        "l_shipdate", "l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getString(1), math.floor(r.getDouble(2)).toLong,
        math.floor(r.getDouble(3) / r.getDouble(2) * 100 + 0.5).toLong,
        (r.getTimestamp(4).getTime, r.getLong(5), r.getInt(6))))
    val byPart = li.groupBy(_._1)
    val expected = byPart.map { case (pk, rows) =>
      var demand = rows.filter(_._2 == "R").map(_._3).sum
      val lots = rows.filter(_._2 == "N").sortBy(_._5)
      var realized = 0L; var remaining = 0L
      for ((_, _, qty, unit, _) <- lots) {          // the cursor loop
        val consumed = math.max(0L, math.min(qty, demand))
        demand -= consumed
        realized += consumed * unit
        remaining += (qty - consumed) * unit
      }
      pk -> (realized, remaining)
    }
    val got = CoreQueries.q223FifoCost(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5))).toMap
    assert(got.nonEmpty)
    got.foreach { case (pk, (re, rm)) =>
      assert(expected(pk) == ((re, rm)), s"part $pk FIFO mismatch")
    }
  }

  test("q224: frontier-expansion distances equal a naive BFS") {
    val edges = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .select("o_custkey", "l_suppkey").distinct().collect()
      .flatMap(r => Seq((r.getLong(0) * 2, r.getLong(1) * 2 + 1),
        (r.getLong(1) * 2 + 1, r.getLong(0) * 2)))
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val seeds = adj.keySet.filter(_ % 200 == 0)
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    for (h <- 1 to 3) {                               // naive level BFS
      val nxt = frontier.flatMap(adj.getOrElse(_, Array.empty[Long]))
        .filterNot(dist.contains)
      dist ++= nxt.map(_ -> h.toLong)
      frontier = nxt
    }
    val got = CoreQueries.q224Khop(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == dist, "k-hop min distances must match the BFS reference")
  }

  test("q227: the peeled core equals an iterative reference peel") {
    val pairs = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .select("o_custkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0) * 2, r.getLong(1) * 2 + 1))
    var e: Seq[(Long, Long)] = pairs.flatMap(p => Seq(p, p.swap)).toSeq
    for (_ <- 1 to 3) {                               // reference peel
      val deg = e.groupBy(_._1).map { case (k, v) => k -> v.size }
      val keep = deg.filter(_._2 >= 4).keySet
      e = e.filter(p => keep(p._1) && keep(p._2))
    }
    val expected = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val got = CoreQueries.q227Kcore(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, "k-core degrees must match the reference peel")
  }

  test("q226: tail distances equal full-string Levenshtein (the lemma held)") {
    def lev(a: String, b: String): Int = {             // textbook DP
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = Tables.customer(spark, dir).select("c_custkey", "c_name")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = CoreQueries.q226EditdistJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty)
    // values: every reported pair's tail distance equals the FULL-string DP
    got.foreach { case ((ka, kb), dist) =>
      assert(lev(names(ka), names(kb)).toLong == dist,
        s"lemma violated for ($ka,$kb)")
    }
    // completeness: every same-block pair at full-string distance <= 1 is reported
    val byBlk = names.toSeq.groupBy(_._2.take(16))
    val expectedPairs = byBlk.values.flatMap { members =>
      for {
        (ka, na) <- members; (kb, nb) <- members
        if ka < kb && lev(na, nb) <= 1
      } yield (ka, kb)
    }.toSet
    assert(got.keySet == expectedPairs, "blocked recall must be exact")
  }

  test("q228: the encoded fold equals the direct integer Holt recurrence") {
    val daily = Tables.events(spark, dir)
      .groupBy(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col("ts")).as("day"))
      .count().collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getLong(2) * 10))
    val expected = daily.groupBy(_._1).map { case (t, rows) =>
      val xs = rows.sortBy(_._2).map(_._3)
      var l = xs.head; var b = 0L                      // direct recurrence
      for (x <- xs.tail) {
        val lNew = math.floor((x + l + b).toDouble / 2).toLong
        b = math.floor((lNew - l + b).toDouble / 2).toLong
        l = lNew
      }
      t -> (l, b, l + 7 * b)
    }
    val got = EventQueries.q228Holt(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expected, "encoded Holt fold must decode to the recurrence")
  }

  test("q222: integer cv2 equals the direct per-user computation") {
    val ev = Tables.events(spark, dir).select("user_id", "ts", "event_id")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000, r.getLong(2)))
    val expected = ev.groupBy(_._1).flatMap { case (u, rows) =>
      val secs = rows.sortBy(r => (r._2, r._3)).map(_._2)
      val gaps = secs.sliding(2).collect { case Array(a, b) => b - a }.toSeq
      val n = gaps.size.toLong; val sum = gaps.sum
      if (n >= 5 && sum > 0) {
        val ss = gaps.map(g => g * g).sum
        val cv2 = math.floor((n * ss - sum * sum).toDouble
          / (sum * sum) * 1000000 + 0.5).toLong
        Some(u -> cv2)
      } else None
    }
    val got = EventQueries.q222BotScore(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expected, "cv2 must match the direct computation")
  }
}
