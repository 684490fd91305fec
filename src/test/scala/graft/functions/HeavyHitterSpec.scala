package graft.functions

import graft.SparkSpec

/** Misra-Gries contracts behind q91: never overcounts, undercounts by at
  * most n/(k+1), finds every item above the guarantee threshold, is exact
  * when the distinct count fits in k — plus the union-merge bound the
  * distributed q91 plan relies on, and the end-to-end verdict column. */
class HeavyHitterSpec extends SparkSpec {

  private def exactCounts(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).map { case (t, g) => t -> g.size.toLong }

  test("exact when distinct items <= k") {
    val xs = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(3)("c")
    val got = HeavyHitters.summarize(scala.util.Random.shuffle(xs).iterator, k = 3).toMap
    assert(got === exactCounts(xs))
  }

  test("est <= true, undercount <= n/(k+1), heavy items always present") {
    val k = 4
    // zipf-ish stream with 26 distinct items, far more than k counters
    val xs = ('a' to 'z').zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(400 / (i + 1))(c.toString)
    }
    val n = xs.size.toLong
    val exact = exactCounts(xs)
    val got = HeavyHitters.summarize(xs.iterator, k).toMap
    got.foreach { case (t, est) =>
      assert(est <= exact(t), s"$t overcounted: $est > ${exact(t)}")
      assert((exact(t) - est) * (k + 1) <= n, s"$t undercount bound broken")
    }
    exact.foreach { case (t, true_) =>
      if (true_ * (k + 1) > n)
        assert(got.contains(t), s"heavy item $t (count $true_ > n/${k + 1}) missing")
    }
  }

  test("union-merge of partition summaries keeps the summed bound") {
    val k = 4
    val parts = Seq(
      Seq.fill(100)("a") ++ Seq.fill(60)("b") ++ ('c' to 'n').map(_.toString),
      Seq.fill(80)("a") ++ ('m' to 'z').flatMap(c => Seq.fill(3)(c.toString)))
    val n = parts.map(_.size.toLong).sum
    val exact = exactCounts(parts.flatten)
    val merged = parts
      .flatMap(p => HeavyHitters.summarize(p.iterator, k))
      .groupBy(_._1).map { case (t, es) => t -> es.map(_._2).sum }
    merged.foreach { case (t, est) =>
      assert(est <= exact(t), s"$t overcounted after merge")
      assert((exact(t) - est) * (k + 1) <= n, s"$t merged undercount bound broken")
    }
  }

  test("q91 end-to-end: every top-10 verdict certifies, heavy tokens found") {
    val rows = graft.queries.TextQueries.q91HeavyHitters(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length === 10)
    assert(rows.forall(_.getLong(3) == 1L), "a Misra-Gries contract verdict failed")
  }
}
