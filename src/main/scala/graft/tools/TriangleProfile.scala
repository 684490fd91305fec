package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Stage-level decomposition of q144_triangles at a given corpus — the
  * instrument behind the ×100 headroom question: 463 s median at ×100 is
  * work-proportional, but WHICH stage owns the time (pair-gen self-join,
  * edge distinct, degree joins, adjacency fold, intersection join) and how
  * much of it is GC decides whether there is an algorithmic lever left or
  * the number is the memory-bandwidth floor of a 32-core/64 GB box.
  *
  * Runs q144 once (optionally N reps, fresh derived state each rep — the
  * query writes its edge-scale pins to per-name parquet dirs it overwrites
  * each invocation and localCheckpoints only the |V|-row adjacency, whose
  * blocks Bench's cleanup discipline, replicated between reps, unpersists),
  * with a stage listener recording per-stage
  * wall, executor-cpu, GC, spill, and shuffle bytes. Prints one JSON line
  * per rep plus a stage table to stderr.
  *
  * Usage: `sbt "runMain graft.tools.TriangleProfile [sfDir] [reps]"`.
  */
object TriangleProfile {

  private final case class StageRow(id: Int, name: String, wallMs: Long,
    cpuMs: Long, gcMs: Long, spillBytes: Long, shuffleReadBytes: Long,
    shuffleWriteBytes: Long, tasks: Int)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft-sf10"))
    val reps = args.lift(1).map(_.toInt).getOrElse(1)
    val spark = graft.GraftSession.local(appName = "graft-triangle-profile")

    val stages = mutable.ArrayBuffer.empty[StageRow]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        stages.synchronized {
          stages += StageRow(si.stageId, si.name.takeWhile(_ != '\n'),
            si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
            m.executorCpuTime / 1000000L, m.jvmGCTime,
            m.memoryBytesSpilled + m.diskBytesSpilled,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten, si.numTasks)
        }
      }
    })

    for (rep <- 1 to reps) {
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      val row = graft.queries.CoreQueries.q144Triangles(spark, sfDir).collect()(0)
      val wall = (System.nanoTime() - t0) / 1e9
      // settle listener delivery before reading the buffer
      Thread.sleep(2000)
      val snap = stages.synchronized(stages.toVector).sortBy(-_.wallMs)
      System.err.println(f"[tri] rep $rep: wall $wall%.1f s, result ${row.mkString(",")}")
      System.err.println(f"[tri] ${"stage"}%-60s ${"wall_s"}%8s ${"cpu_s"}%8s ${"gc_s"}%7s ${"spill"}%9s ${"shR_MB"}%8s ${"shW_MB"}%8s tasks")
      snap.take(20).foreach { s =>
        System.err.println(f"[tri] ${s.name.take(60)}%-60s ${s.wallMs / 1e3}%8.1f ${s.cpuMs / 1e3}%8.1f ${s.gcMs / 1e3}%7.1f ${s.spillBytes / 1e6}%8.0fM ${s.shuffleReadBytes / 1e6}%8.0f ${s.shuffleWriteBytes / 1e6}%8.0f ${s.tasks}%5d")
      }
      val totGc = snap.map(_.gcMs).sum / 1e3
      val totCpu = snap.map(_.cpuMs).sum / 1e3
      val totSpill = snap.map(_.spillBytes).sum / 1e6
      val stageJson = snap.map(s =>
        s"""{"id":${s.id},"name":"${s.name.take(80).replace("\"", "'")}","wall_s":${s.wallMs / 1e3},"cpu_s":${s.cpuMs / 1e3},"gc_s":${s.gcMs / 1e3},"spill_mb":${s.spillBytes / 1e6},"shuffle_read_mb":${s.shuffleReadBytes / 1e6},"shuffle_write_mb":${s.shuffleWriteBytes / 1e6},"tasks":${s.tasks}}""")
        .mkString("[", ",", "]")
      println(f"""{"metric":"triangle_profile","rep":$rep,"wall_s":$wall%.1f,"gc_s_total":$totGc%.1f,"cpu_s_total":$totCpu%.1f,"spill_mb_total":$totSpill%.0f,"sf":"$sfDir","result":"${row.mkString(",")}","stages":$stageJson}""")
      // replicate Bench's inter-rep hygiene: drop pinned checkpoint blocks
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    spark.stop()
  }
}
