package graft.streaming

import java.nio.file.attribute.FileTime
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{SparkSpec, Tables}

/** CorpusStream contracts: the streaming curation pipeline must equal the
  * q47 batch prep EXACTLY when documents arrive in id order (the shared
  * stage functions make any divergence a dedup-rule bug, not a scoring
  * drift), the cross-batch state must suppress a duplicate whose twin
  * arrived in an earlier micro-batch, and the state TTL must re-admit a
  * duplicate once its fingerprint aged out of state. */
class CorpusStreamSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def asJson(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value")).coalesce(1)

  /** Pin modification times explicitly: the file source orders micro-batches
    * by mtime, and wall-clock writes separated by sleeps invert on coarse-
    * granularity filesystems (flaking the stream-equals-batch assertion).
    * Directories stamp every file inside (spark text writes a dir). */
  private def setMtime(path: String, t: Long): Unit = {
    val f = new java.io.File(path)
    val files = if (f.isDirectory) f.listFiles().toSeq else Seq(f)
    files.foreach(x => Files.setLastModifiedTime(x.toPath, FileTime.fromMillis(t)))
  }

  /** With ProcessingTimeTimeout, pending state timeouts make AvailableNow
    * schedule no-data batches indefinitely (shouldRunAnotherBatch stays
    * true while any deadline is set), so awaitTermination never returns —
    * the TTL test instead drives exactly one micro-batch per run with
    * Trigger.Once. */
  private def runStream(root: String, stateTtlMs: Option[Long] = None,
                        oneBatch: Boolean = false): DataFrame = {
    val docs = Tables.documents(spark, sf)
    val trigger = if (oneBatch) Trigger.Once() else Trigger.AvailableNow()
    val q = CorpusStream.curated(
      spark.readStream.schema("value STRING").text(s"$root/src/*")
        .select(from_json(col("value"), docs.schema).as("d")).select("d.*"),
      stateTtlMs)
      .writeStream
      .format("parquet")
      .outputMode("append")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .option("maxFilesPerTrigger", "1")
      .trigger(trigger)
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$root/out")
  }

  test("id-ordered streaming ingestion reproduces the q47 batch prep exactly") {
    val root = tmpDir("corpus-stream")
    val docs = Tables.documents(spark, sf)
    val mid = docs.agg(expr("percentile_approx(doc_id, 0.5)")).head().getLong(0)
    val t0 = System.currentTimeMillis() - 60000
    asJson(docs.filter(col("doc_id") <= mid).orderBy("doc_id"))
      .write.mode("append").text(s"$root/src/b1")
    setMtime(s"$root/src/b1", t0)
    asJson(docs.filter(col("doc_id") > mid).orderBy("doc_id"))
      .write.mode("append").text(s"$root/src/b2")
    setMtime(s"$root/src/b2", t0 + 10000)

    val stream = runStream(root).collect().map(_.toString).sorted.toSeq
    val batch = graft.queries.TextQueries.q47TrainingPrep(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(stream === batch,
      "stream and batch run the same shared stages — only a dedup-rule divergence can differ")
    assert(batch.nonEmpty, "the prep pipeline must keep documents at sf0.001")
  }

  // two quality-passing doc bodies with identical token content produce the
  // same fingerprint; ids must sit INSIDE the deterministic 50% sample
  // bucket (md5(id) first byte < 0x80: 6, 9, 11, 17, 19 qualify) — with
  // out-of-sample ids every expected set is empty and a test would pass
  // vacuously no matter what the state did.
  private val good = (1 to 30).map(i => s"the a of and to is in it w$i").mkString(" ")
  private val other = (1 to 30).map(i => s"the a of and to is in it x$i").mkString(" ")
  private def row(id: Long, text: String) =
    s"""{"doc_id":$id,"text":"$text","lang":"en","source":"s1","n_chars":${text.length}}"""
  private def inSample(id: Long) =
    java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes).map("%02x".format(_)).mkString.substring(0, 2) < "80"

  test("a duplicate arriving in a LATER batch is suppressed by the fingerprint state") {
    val root = tmpDir("corpus-dup")
    assert(Seq(6L, 9L, 11L, 17L, 19L).forall(inSample), "test ids must be sampled")
    val t0 = System.currentTimeMillis() - 60000
    new java.io.File(s"$root/src").mkdirs()
    Files.writeString(Paths.get(s"$root/src/b1.txt"), row(6L, good))
    setMtime(s"$root/src/b1.txt", t0)
    Files.writeString(Paths.get(s"$root/src/b2.txt"),
      row(9L, good) + "\n" + row(11L, other))
    setMtime(s"$root/src/b2.txt", t0 + 10000)

    val out = runStream(root).collect().map(_.getLong(0)).sorted.toSeq
    // doc 9 is the cross-batch duplicate of doc 6 -> suppressed
    assert(out === Seq(6L, 11L), s"got $out")
    assert(!out.contains(9L), "the later-arriving duplicate must never be emitted")

    // RESTART: the fingerprint state must survive in the checkpointed
    // state store — a new query over the same checkpoint, fed ANOTHER
    // duplicate of doc 6 plus genuinely new content, must suppress the
    // former and admit the latter (no re-emission of anything already out)
    val fresh = (1 to 30).map(i => s"the a of and to is in it y$i").mkString(" ")
    Files.writeString(Paths.get(s"$root/src/b3.txt"),
      row(17L, good) + "\n" + row(19L, fresh))
    setMtime(s"$root/src/b3.txt", t0 + 20000)
    val out2 = runStream(root).collect().map(_.getLong(0)).sorted.toSeq
    assert(out2 === Seq(6L, 11L, 19L),
      s"after restart got $out2 — state must persist across queries")
    assert(!out2.contains(17L), "a post-restart duplicate must still be suppressed")
  }

  test("state TTL ages out an unseen fingerprint and re-admits its next duplicate") {
    val root = tmpDir("corpus-ttl")
    val ttlMs = 1000L
    val t0 = System.currentTimeMillis() - 60000
    new java.io.File(s"$root/src").mkdirs()
    Files.writeString(Paths.get(s"$root/src/b1.txt"), row(6L, good))
    setMtime(s"$root/src/b1.txt", t0)
    val out1 = runStream(root, Some(ttlMs), oneBatch = true)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(out1 === Seq(6L), s"got $out1")

    // let the horizon pass with no sighting of the fingerprint, then feed
    // (a) a batch WITHOUT it — Spark fires timeouts only in a batch where
    // the key carries no data, so this is where the state drops — and
    // (b) a later batch with the duplicate, which must now be RE-admitted
    Thread.sleep(3 * ttlMs)
    Files.writeString(Paths.get(s"$root/src/b2.txt"), row(11L, other))
    setMtime(s"$root/src/b2.txt", t0 + 10000)
    val out2 = runStream(root, Some(ttlMs), oneBatch = true)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(out2 === Seq(6L, 11L), s"got $out2 — the no-data batch drops the aged state")

    Files.writeString(Paths.get(s"$root/src/b3.txt"), row(9L, good))
    setMtime(s"$root/src/b3.txt", t0 + 20000)
    val out3 = runStream(root, Some(ttlMs), oneBatch = true)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(out3 === Seq(6L, 9L, 11L),
      s"got $out3 — the aged-out duplicate (doc 9) must be re-admitted past the TTL horizon")
  }
}
