package graft.tools

import org.apache.spark.sql.functions._

/** Measures the IVF nprobe recall/cost dial (IvfSpec's sweep, runnable at
  * any scale): recall@10 of [[graft.vector.Ivf.topK]] under the FROZEN
  * k=45 quantizer vs exact brute-force cosine, for nprobe ∈ {1, 4, 8, 16},
  * plus per-setting wall time — the measured table SCALE.md cites.
  *
  * Usage: `sbt "runMain graft.tools.SweepIvf [sfDir] [nQueries]"`
  * (default: the ×10 ScaleUp output at /tmp/graft-sf1, 20 queries).
  */
object SweepIvf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val nq = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = graft.GraftSession.local(cores = "32", appName = "graft-sweep-ivf")
    import spark.implicits._

    val vecs = graft.Tables.embeddings(spark, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val queries = vecs.orderBy($"vec_id").limit(nq).cache()
    val n = vecs.count()
    println(s"[sweep-ivf] $dir: N=$n vectors, $nq queries, frozen k=45")

    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("graft_dot", a, b)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_id").orderBy($"cos".desc, $"neighbor_id")
    val exact = vecs
      .crossJoin(broadcast(queries.select($"vec_id".as("q_id"), $"v".as("qv"))))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("neighbor_id"),
        round(dot($"qv", $"v") / (sqrt(dot($"qv", $"qv")) * sqrt(dot($"v", $"v"))), 4).as("cos"))
      .withColumn("rank", row_number().over(w)).filter($"rank" <= 10)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

    for (np <- Seq(1, 4, 8, 16)) {
      val t0 = System.nanoTime()
      val approx = graft.vector.Ivf
        .topK(vecs, queries, graft.vector.IvfFrozen.model, nprobe = np, k = 10)
        .collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
      val sec = (System.nanoTime() - t0) / 1e9
      val hits = exact.map { case (q, want) =>
        (want & approx.getOrElse(q, Set.empty)).size.toDouble / want.size
      }
      println(f"[sweep-ivf] nprobe=$np%2d/45  recall@10=${hits.sum / hits.size}%.3f  wall=$sec%.2f s")
    }
    spark.stop()
  }
}
