package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{SparkSpec, Tables}

/** CorpusStream contracts: the streaming curation pipeline must equal the
  * q47 batch prep EXACTLY when documents arrive in id order (the shared
  * stage functions make any divergence a dedup-rule bug, not a scoring
  * drift), and the cross-batch state must suppress a duplicate whose twin
  * arrived in an earlier micro-batch. */
class CorpusStreamSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def asJson(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value")).coalesce(1)

  private def runStream(root: String): DataFrame = {
    val docs = Tables.documents(spark, sf)
    val q = CorpusStream.curated(
      spark.readStream.schema("value STRING").text(s"$root/src/*")
        .select(from_json(col("value"), docs.schema).as("d")).select("d.*"))
      .writeStream
      .format("parquet")
      .outputMode("append")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .option("maxFilesPerTrigger", "1")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$root/out")
  }

  test("id-ordered streaming ingestion reproduces the q47 batch prep exactly") {
    val root = tmpDir("corpus-stream")
    val docs = Tables.documents(spark, sf)
    val mid = docs.agg(expr("percentile_approx(doc_id, 0.5)")).head().getLong(0)
    asJson(docs.filter(col("doc_id") <= mid).orderBy("doc_id"))
      .write.mode("append").text(s"$root/src/b1")
    Thread.sleep(1100) // file source orders batches by modification time
    asJson(docs.filter(col("doc_id") > mid).orderBy("doc_id"))
      .write.mode("append").text(s"$root/src/b2")

    val stream = runStream(root).collect().map(_.toString).sorted.toSeq
    val batch = graft.queries.TextQueries.q47TrainingPrep(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(stream === batch,
      "stream and batch run the same shared stages — only a dedup-rule divergence can differ")
    assert(batch.nonEmpty, "the prep pipeline must keep documents at sf0.001")
  }

  test("a duplicate arriving in a LATER batch is suppressed by the fingerprint state") {
    val root = tmpDir("corpus-dup")
    // two quality-passing docs with identical token content (same fp,
    // different ids) split across batches; plus a batch-2 original.
    // Doc ids are chosen INSIDE the deterministic 50% sample bucket
    // (md5(id) first byte < 0x80: 6, 9, 11, 17, 19 qualify) — with
    // out-of-sample ids every expected set is empty and the test would
    // pass vacuously no matter what the state did.
    val good = (1 to 30).map(i => s"the a of and to is in it w$i").mkString(" ")
    val other = (1 to 30).map(i => s"the a of and to is in it x$i").mkString(" ")
    def row(id: Long, text: String) =
      s"""{"doc_id":$id,"text":"$text","lang":"en","source":"s1","n_chars":${text.length}}"""
    def inSample(id: Long) =
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes).map("%02x".format(_)).mkString.substring(0, 2) < "80"
    assert(Seq(6L, 9L, 11L, 17L, 19L).forall(inSample), "test ids must be sampled")
    new java.io.File(s"$root/src").mkdirs()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$root/src/b1.txt"), row(6L, good))
    Thread.sleep(1100)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$root/src/b2.txt"),
      row(9L, good) + "\n" + row(11L, other))

    val out = runStream(root).collect().map(_.getLong(0)).sorted.toSeq
    // doc 9 is the cross-batch duplicate of doc 6 -> suppressed
    assert(out === Seq(6L, 11L), s"got $out")
    assert(!out.contains(9L), "the later-arriving duplicate must never be emitted")

    // RESTART: the fingerprint state must survive in the checkpointed
    // state store — a new query over the same checkpoint, fed ANOTHER
    // duplicate of doc 6 plus genuinely new content, must suppress the
    // former and admit the latter (no re-emission of anything already out)
    val fresh = (1 to 30).map(i => s"the a of and to is in it y$i").mkString(" ")
    Thread.sleep(1100)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$root/src/b3.txt"),
      row(17L, good) + "\n" + row(19L, fresh))
    val out2 = runStream(root).collect().map(_.getLong(0)).sorted.toSeq
    assert(out2 === Seq(6L, 11L, 19L),
      s"after restart got $out2 — state must persist across queries")
    assert(!out2.contains(17L), "a post-restart duplicate must still be suppressed")
  }
}
