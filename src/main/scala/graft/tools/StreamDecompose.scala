package graft.tools

import scala.collection.mutable

import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.{GraftSession, SparkEntry}

/** Decomposition instrument for the streaming gate entries (r18 verdict
  * ask #4): the four most expensive sweep entries are streaming/merge
  * harnesses (q253 9.3 s, q257 6.7 s, q244 5.0 s, q249 4.8 s in the r18
  * driver sweep) whose ×100 ratios say state is change-volume-bounded —
  * but nothing separated "AvailableNow query-START overhead" from real
  * micro-batch work. This main runs each entry once, captures every
  * StreamingQueryProgress via a listener, and prints one JSON line per
  * entry splitting the wall into:
  *
  *   - `n_queries` / `n_batches` — query starts and micro-batches run;
  *   - `batch_total_s` — Σ triggerExecution over all batches (the time
  *     inside micro-batch execution);
  *   - `add_batch_s` / `wal_commit_s` / `offset_commit_s` /
  *     `planning_s` — the durationMs components of that total;
  *   - `state_commit_s` — Σ stateOperators[].commitTimeMs (the state
  *     store's share);
  *   - `harness_s` — entry wall − batch_total_s: file-wave writes,
  *     query start/stop, checkpoint setup, read-back sort — everything
  *     that is NOT micro-batch execution. A harness-dominated entry's
  *     remedy is fewer query (re)starts per gate, not state tuning.
  *
  * Usage: runMain graft.tools.StreamDecompose <sfDir> [q1,q2,...]
  * (default: the four r18 hotspots). Not a timing benchmark — one rep,
  * no canaries; the per-component RATIOS are the product, read against
  * SCALE.md's streaming-decomposition section. */
object StreamDecompose {

  private val Default =
    "q253_stream_upsert,q257_merge_evolve,q244_stream_outer_join,q249_late_data_audit"

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).getOrElse(Default)
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cores = cpus, appName = "graft-stream-decompose")

    case class Batch(runId: String, durationMs: Map[String, Long], stateCommitMs: Long)
    val batches = mutable.ListBuffer.empty[Batch]
    val runs = mutable.Set.empty[String]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        synchronized { runs += e.runId.toString }
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        synchronized {
          val p = e.progress
          import scala.jdk.CollectionConverters._
          val dur = p.durationMs.asScala.map { case (k, v) => k -> v.longValue() }.toMap
          val state = p.stateOperators.map(s => s.commitTimeMs).sum
          // a no-data batch reports numInputRows 0 but still pays
          // planning/commit — keep it; that cost is real
          batches += Batch(p.runId.toString, dur, state)
        }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    for (name <- names) {
      listener.synchronized { batches.clear(); runs.clear() }
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query '$name'"))
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // progress events are delivered async on the listener bus; drain
      Thread.sleep(1500)
      val (bs, nq) = listener.synchronized { (batches.toList, runs.size) }
      def sumOf(key: String): Double = bs.flatMap(_.durationMs.get(key)).sum / 1e3
      val batchTotal = sumOf("triggerExecution")
      val json =
        f"""{"entry":"$name","wall_s":$wall%.3f,"n_queries":$nq,"n_batches":${bs.size},""" +
        f""""batch_total_s":$batchTotal%.3f,"add_batch_s":${sumOf("addBatch")}%.3f,""" +
        f""""wal_commit_s":${sumOf("walCommit")}%.3f,"offset_commit_s":${sumOf("commitOffsets")}%.3f,""" +
        f""""planning_s":${sumOf("queryPlanning")}%.3f,""" +
        f""""state_commit_s":${bs.map(_.stateCommitMs).sum / 1e3}%.3f,""" +
        f""""harness_s":${wall - batchTotal}%.3f}"""
      println(json)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.streams.removeListener(listener)
    spark.stop()
  }
}
