package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Measurement probe for the MergeSink/VersionedSink/IncrementalAgg merge
  * path (guide §1: measure first): runs the q34-shaped two-wave merge and
  * the q253-shaped three-wave merge directly (no streaming harness) and
  * prints, per phase, wall seconds, Spark JOBS launched, and the table's
  * file/dir count after each merge — separating job-count floor, read
  * amplification (small files × mergeSchema footer reads) and real merge
  * work. One rep, no canaries: the SPLIT is the product, not the total.
  *
  * Usage: runMain graft.tools.MergeProbe [sfDir]
  */
object MergeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cores = cpus, appName = "graft-merge-probe")
    import spark.implicits._

    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })

    def countFiles(dir: String): (Int, Int) = {
      val d = new java.io.File(dir)
      if (!d.exists()) return (0, 0)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      val fs = walk(d).filter(_.getName.endsWith(".parquet"))
      val dirs = walk(d).map(_.getParent).distinct
      (fs.size, dirs.size)
    }

    def phase[A](tag: String, table: Option[String])(body: => A): A = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = body
      val dt = (System.nanoTime() - t0) / 1e9
      val dj = jobs.get() - j0
      val files = table.map(countFiles).map { case (f, d) => s" files=$f dirs=$d" }.getOrElse("")
      println(f"[probe] $tag%-28s ${dt}%7.3f s  jobs=$dj%3d$files")
      r
    }

    val root = graft.util.HarnessDirs.newDir("mergeprobe")
    val ev = graft.Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", $"event_type", $"value",
        unix_millis($"ts").as("ms"))

    println(s"[probe] === q34-shaped (2 batch merges, numBuckets=32) ===")
    val sink = new graft.merge.MergeSink(spark, s"$root/t34", "user_id",
      Seq("ms", "event_id"), numBuckets = 32)
    phase("merge wave0", Some(s"$root/t34")) { sink.merge(ev.filter($"event_id" % 2 === 0)) }
    phase("merge wave1", Some(s"$root/t34")) { sink.merge(ev.filter($"event_id" % 2 === 1)) }
    phase("read-back noop", None) {
      sink.read().select($"user_id", $"event_id", $"event_type", $"value")
        .orderBy($"user_id")
        .write.format("noop").mode("overwrite").save()
    }

    println(s"[probe] === q253-shaped (3 batch merges, numBuckets=64) ===")
    val sink3 = new graft.merge.MergeSink(spark, s"$root/t253", "user_id",
      Seq("ms", "event_id"))
    for (w <- 0 until 3)
      phase(s"merge wave$w", Some(s"$root/t253")) { sink3.merge(ev.filter($"event_id" % 3 === w)) }
    phase("read-back noop", None) {
      sink3.read().select($"user_id", $"event_id", $"event_type", $"value")
        .orderBy($"user_id")
        .write.format("noop").mode("overwrite").save()
    }

    println(s"[probe] === q136-shaped (VersionedSink, 3 merges) ===")
    val vs = new graft.merge.VersionedSink(spark, s"$root/tv", "user_id",
      Seq("ms", "event_id"))
    for (w <- 0 until 3)
      phase(s"vmerge wave$w", Some(s"$root/tv")) { vs.merge(ev.filter($"event_id" % 3 === w)) }
    phase("vread-back noop", None) {
      vs.read().select($"user_id", $"event_id", $"event_type", $"value")
        .orderBy($"user_id")
        .write.format("noop").mode("overwrite").save()
    }

    spark.stop()
  }
}
