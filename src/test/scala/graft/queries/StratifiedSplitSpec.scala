package graft.queries

import graft.SparkSpec

/** q186's split contract, independently recomputed: exactly-once
  * assignment, per-stratum largest-remainder quotas hit EXACTLY (not in
  * expectation), and determinism across re-runs.
  */
class StratifiedSplitSpec extends SparkSpec {

  private def writeDocs(dir: String): Map[String, Int] = {
    val s = spark
    import s.implicits._
    // 900 docs over 3 langs × varied sizes — stratum populations
    // deliberately NOT multiples of 10 so remainders actually allocate
    val rows = (0L until 900L).map { i =>
      val lang = Seq("en", "de", "fr")((i % 3).toInt)
      val nChars = ((i * 37) % 2500 + 10).toInt
      (i, s"doc $i", lang, s"src${i % 5}", nChars.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    rows.groupBy(r => s"${r._3}/${r._5 / 1000}").map { case (k, v) => k -> v.size }
  }

  test("every doc assigned exactly once; quotas are exact largest-remainder") {
    val dir = tmpDir("strat-split")
    val strata = writeDocs(dir)
    val out = TextQueries.q186StratifiedSplit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

    // exactly-once
    assert(out.length == 900)
    assert(out.map(_._1).distinct.length == 900)

    // per-stratum quotas: the Hamilton allocation recomputed directly
    val got = out.groupBy(_._2).map { case (st, rs) =>
      st -> rs.groupBy(_._3).map { case (sp, v) => sp -> v.size }
    }
    for ((st, n) <- strata) {
      val weights = Seq("train" -> 8L, "val" -> 1L, "test" -> 1L)
      val fl = weights.map { case (sp, w) => (sp, n * w / 10, n * w % 10) }
      val leftover = n - fl.map(_._2).sum
      // remainder rank: rem desc, then split name asc (the query's order)
      val bonus = fl.sortBy { case (sp, _, rem) => (-rem, sp) }
        .take(leftover.toInt).map(_._1).toSet
      val expected = fl.map { case (sp, f, _) =>
        sp -> (f + (if (bonus(sp)) 1L else 0L))
      }.toMap
      val actual = got(st).withDefaultValue(0)
      for ((sp, q) <- expected)
        assert(actual(sp).toLong == q, s"stratum $st split $sp: ${actual(sp)} != $q")
      assert(actual.values.sum == n, s"stratum $st conservation")
    }
  }

  test("assignment is deterministic across runs") {
    val dir = tmpDir("strat-det")
    writeDocs(dir)
    val a = TextQueries.q186StratifiedSplit(spark, dir).collect().map(_.toString)
    val b = TextQueries.q186StratifiedSplit(spark, dir).collect().map(_.toString)
    assert(a.sameElements(b))
  }
}
