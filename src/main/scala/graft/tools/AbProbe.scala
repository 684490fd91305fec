package graft.tools

import graft.{GraftSession, SparkEntry}

/** Same-JVM A/B timing of a session dial against the same queries: each
  * rep cycle times every query once with the dial OFF and once ON, so the
  * two legs interleave inside the same machine window (the r19 wakeup
  * drift makes cross-run comparisons unreliable; this removes the window
  * axis from an ablation entirely).
  *
  * Run: `sbt "runMain graft.tools.AbProbe <dialKey> <reps> q1,q2,..."`
  * (data dir from SPARK_GRAFT_SF_DIR, cores from SPARK_GRAFT_CPUS). */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val dial = args(0)
    val reps = args(1).toInt
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val spark = GraftSession.local(appName = "ab-probe")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def cleanup(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    def timeOne(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sf).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      cleanup(); t
    }
    // warm both legs once, unrecorded
    for (name <- names; v <- Seq("false", "true")) {
      spark.conf.set(dial, v); try timeOne(name) catch { case _: Throwable => () }
    }
    val acc = scala.collection.mutable.Map.empty[(String, String), List[Double]]
      .withDefaultValue(Nil)
    for (_ <- 1 to reps; name <- names; v <- Seq("false", "true")) {
      spark.conf.set(dial, v)
      acc((name, v)) = timeOne(name) :: acc((name, v))
    }
    def med(xs: List[Double]): Double = {
      val s = xs.sorted; if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    for (name <- names) {
      val off = med(acc((name, "false"))); val on = med(acc((name, "true")))
      println(f"[ab] $name%-30s off=$off%7.3f on=$on%7.3f on/off=${on / off}%5.2f")
    }
    spark.stop()
  }
}
