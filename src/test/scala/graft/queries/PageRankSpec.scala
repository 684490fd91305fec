package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q139's integer PageRank against an independent in-memory reference on a
  * constructed graph — the differential check the cross-engine oracle can't
  * give (the oracle replays the same SQL formula; this replays the MATH).
  */
class PageRankSpec extends SparkSpec {

  test("five integer steps match an in-memory reference on a constructed graph") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("pagerank")

    // trade pairs: cust 1 -> {supp 1, supp 2}, cust 2 -> {supp 1};
    // cust 3 -> supp 3 forms a disconnected 2-cycle component
    val pairs = Seq((1L, 1L), (1L, 2L), (2L, 1L), (3L, 3L))
    val orders = pairs.zipWithIndex.map { case ((c, _), i) => (i.toLong, c) }
    val lineitem = pairs.zipWithIndex.map { case ((_, p), i) => (i.toLong, p) }
    orders.toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/orders.parquet")
    lineitem.toDF("l_orderkey", "l_suppkey")
      .write.parquet(s"$dir/lineitem.parquet")

    // independent reference: same node encoding, same integer step
    val sym = pairs.map { case (c, p) => (c * 2, p * 2 + 1) }.distinct
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = sym.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    var ref: Map[Long, Long] = deg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 5)
      ref = sym.groupBy(_._2).map { case (v, es) =>
        v -> (150000L + 85L * es.map { case (u, _) => ref(u) / deg(u) }.sum / 100L)
      }

    val got = CoreQueries.q139PageRank(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref)
    // the disconnected 2-cycle keeps its full initial mass: each of its two
    // nodes passes its whole rank across, so pr = 150000 + 85%·pr converges
    // toward 1e6 from below and stays well above the damping floor
    assert(got(6L) == got(7L) && got(6L) > 900000L)
  }

  test("rank orders hub nodes above leaves within one component") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("pagerank-hub")
    // a star: cust 1 trades with suppliers 1..6; cust 2 with supplier 1 only
    val pairs = (1L to 6L).map((1L, _)) :+ (2L, 1L)
    pairs.zipWithIndex.map { case ((c, _), i) => (i.toLong, c) }
      .toDF("o_orderkey", "o_custkey").write.parquet(s"$dir/orders.parquet")
    pairs.zipWithIndex.map { case ((_, p), i) => (i.toLong, p) }
      .toDF("l_orderkey", "l_suppkey").write.parquet(s"$dir/lineitem.parquet")
    val got = CoreQueries.q139PageRank(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hub customer 1 (node 2) outranks leaf supplier 2 (node 5) and the
    // shared supplier 1 (node 3, two inbound partners) outranks leaves too
    assert(got(2L) > got(5L) && got(3L) > got(5L))
  }
}
