package graft.queries

import graft.SparkSpec

/** q189's greedy contract, checked against an independent brute-force
  * reference: the distributed flatMapGroups greedy must reproduce the
  * sequential argmax step for step, and the selected set must be
  * duplicate-free and label-local.
  */
class MmrSpec extends SparkSpec {

  // deterministic pseudo-random unit-ish vector per (id, dim)
  private def vec(id: Long): Array[Float] =
    Array.tabulate(8) { d =>
      val x = math.sin(id * 12.9898 + d * 78.233) * 43758.5453
      ((x - math.floor(x)) * 2 - 1).toFloat
    }

  private def writeEmb(dir: String, n: Int): Unit = {
    val s = spark
    import s.implicits._
    (0 until n).map { i =>
      (i.toLong, vec(i.toLong).toSeq, (i % 2))
    }.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
  }

  test("distributed greedy equals the sequential brute-force reference") {
    val dir = tmpDir("mmr")
    val n = 240
    writeEmb(dir, n)
    val out = VectorQueries.q189Mmr(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // independent reference: quantize, rank, pool, greedy — straight Scala
    def q(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 1000 + 0.5).toLong)
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val byLabel = (0 until n).groupBy(_ % 2)
    val expected = byLabel.toSeq.flatMap { case (label, ids) =>
      val qid = ids.min
      val qq = q(vec(qid.toLong))
      val cands = ids.filter(_ != qid)
        .map(i => (i.toLong, dot(qq, q(vec(i.toLong))), q(vec(i.toLong))))
        .sortBy(c => (-c._2, c._1)).take(100)
      var picked = List(0)
      var acc = List((label.toLong, 1L, cands(0)._1, cands(0)._2))
      for (step <- 2 to 10) {
        val best = cands.indices.filterNot(picked.contains)
          .map { i =>
            val ms = picked.map(p => dot(cands(i)._3, cands(p)._3)).max
            (i, cands(i)._2 - ms)
          }
          .minBy { case (i, sc) => (-sc, cands(i)._1) }
        picked ::= best._1
        acc ::= ((label.toLong, step.toLong, cands(best._1)._1, best._2))
      }
      acc.reverse
    }.sortBy(t => (t._1, t._2))

    assert(out.sortBy(t => (t._1, t._2)).toSeq == expected)
  }

  test("selections are duplicate-free within each label") {
    val dir = tmpDir("mmr-dup")
    writeEmb(dir, 120)
    val out = VectorQueries.q189Mmr(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(out.length == out.distinct.length)
  }
}
