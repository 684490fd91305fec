package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class IvfSpec extends SparkSpec {

  private def vectors(): DataFrame = {
    val s = spark
    import s.implicits._
    Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
  }

  private def bruteTopK(vecs: DataFrame, queries: DataFrame, k: Int): Map[Long, Seq[Long]] = {
    val s = spark
    import s.implicits._
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("graft_dot", a, b)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_id").orderBy($"cos".desc, $"neighbor_id")
    vecs.crossJoin(broadcast(queries.select($"vec_id".as("q_id"), $"v".as("qv"))))
      .filter($"vec_id" =!= $"q_id")
      // same round-then-rank convention as Ivf.topK
      .select($"q_id", $"vec_id".as("neighbor_id"),
        round(dot($"qv", $"v") / (sqrt(dot($"qv", $"qv")) * sqrt(dot($"v", $"v"))), 4).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq }
  }

  test("training is deterministic and assignment covers multiple cells") {
    val vecs = vectors()
    val m1 = Ivf.train(vecs, k = 8, iterations = 2)
    val m2 = Ivf.train(vecs, k = 8, iterations = 2)
    assert(m1.centroids.map(_.toSeq).toSeq === m2.centroids.map(_.toSeq).toSeq)
    val cells = vecs.select(Ivf.cellOf(col("v"), m1).as("cell"))
      .distinct().collect().map(_.getInt(0))
    assert(cells.length > 1, "degenerate clustering")
  }

  test("nprobe = k (exhaustive probing) reproduces brute-force top-k exactly") {
    val vecs = vectors()
    val queries = vecs.filter(col("vec_id") < 5)
    val model = Ivf.train(vecs, k = 8, iterations = 2)
    val ivf = Ivf.topK(vecs, queries, model, nprobe = 8, k = 3)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq }
    assert(ivf === bruteTopK(vecs, queries, 3))
  }

  test("nprobe sweep: the recall/probe-cost dial is measured, not asserted") {
    // the SHIPPED configuration: frozen k=45 quantizer over the largest
    // driver-gated corpus (sf0.1), 20 queries, recall@10 vs exact brute
    // force. SweepIvf runs the identical sweep at x10 for SCALE.md.
    //
    // Measured (sf0.1): nprobe 1 -> 0.115, 4 -> 0.270, 8 -> 0.485,
    // 16 -> 0.740. The synthetic embeddings are near-uniform in 64-dim —
    // ANN's WORST case (no cluster structure for the quantizer to exploit)
    // — yet recall still runs ~3x better than the nprobe/k = blind-probing
    // baseline (0.022/0.089/0.178/0.356), which is exactly the quantizer's
    // value: it orders cells by usefulness even when the data has no
    // clusters. Real embedding corpora are strongly clustered and sit far
    // above these floors; the assertions pin the structureless lower
    // bound and the dial's monotonicity.
    val s = spark
    import s.implicits._
    val vecs = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val queries = vecs.filter(col("vec_id") < 20)
    val exact = bruteTopK(vecs, queries, 10)
    val recalls = Seq(1, 4, 8, 16).map { np =>
      val approx = Ivf.topK(vecs, queries, IvfFrozen.model, nprobe = np, k = 10)
        .collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
      val hits = exact.map { case (q, want) =>
        want.count(approx.getOrElse(q, Set.empty)).toDouble / want.size
      }
      val r = hits.sum / hits.size
      info(f"nprobe=$np%2d/45  recall@10=$r%.3f")
      np -> r
    }.toMap
    // the dial must be monotone (more probes never lose neighbors) ...
    assert(recalls(1) <= recalls(4) && recalls(4) <= recalls(8) && recalls(8) <= recalls(16),
      s"recall not monotone in nprobe: $recalls")
    // ... and must beat blind probing (recall ~ nprobe/k) by a wide margin
    // even on structureless data — floors set ~20% under the measured values
    assert(recalls(4) >= 0.2, s"recall@10 with nprobe=4/45 was ${recalls(4)}")
    assert(recalls(16) >= 0.6, s"recall@10 with nprobe=16/45 was ${recalls(16)}")
  }

  test("partial probing trades recall for work but keeps most neighbors") {
    val vecs = vectors()
    val queries = vecs.filter(col("vec_id") < 10)
    val model = Ivf.train(vecs, k = 8, iterations = 2)
    val exact = bruteTopK(vecs, queries, 3)
    val approx = Ivf.topK(vecs, queries, model, nprobe = 4, k = 3)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val hits = exact.map { case (q, want) =>
      want.count(approx.getOrElse(q, Set.empty)).toDouble / want.size
    }
    val recall = hits.sum / hits.size
    assert(recall >= 0.5, s"recall@3 with nprobe=4/8 was $recall")
  }
}
