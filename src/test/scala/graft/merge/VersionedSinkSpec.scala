package graft.merge

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** VersionedSink behaviors the SQL gate (q136) can't see: per-version
  * equivalence to a from-scratch MergeSink, history immutability under
  * later merges, orphan-dir crash recovery, and vacuum retention.
  */
class VersionedSinkSpec extends SparkSpec {

  private def waves(n: Int): Seq[DataFrame] = {
    val s = spark
    import s.implicits._
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"user_id", $"event_id", $"event_type", $"value",
        unix_millis($"ts").as("ms"))
    (0 until n).map(i => ev.filter($"event_id" % n === i))
  }

  private def rows(df: DataFrame): Set[(Long, Long, String, Double)] =
    df.select("user_id", "event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet

  test("every historical version equals a from-scratch merge of its wave prefix") {
    val ws = waves(3)
    val root = tmpDir("vsink-prefix")
    val vs = new VersionedSink(spark, s"$root/v", "user_id", Seq("ms", "event_id"), 16)
    ws.foreach(vs.merge(_))
    assert(vs.currentVersion == 3)
    for (v <- 1 to 3) {
      val ref = new MergeSink(spark, s"$root/ref$v", "user_id", Seq("ms", "event_id"), 16)
      ws.take(v).foreach(ref.merge(_))
      assert(rows(vs.read(v)) == rows(ref.read()), s"version $v diverged")
    }
  }

  test("later merges leave earlier reads byte-stable; orphan data dir is recovered over") {
    val ws = waves(3)
    val root = tmpDir("vsink-crash")
    val vs = new VersionedSink(spark, s"$root/v", "user_id", Seq("ms", "event_id"), 16)
    vs.merge(ws(0))
    val v1Before = rows(vs.read(1))

    // simulate a crash AFTER data write, BEFORE manifest commit: an orphan
    // v=2 data dir exists with garbage; the real merge must overwrite it
    val orphan = Paths.get(s"$root/v/data/v=2/__part=0")
    Files.createDirectories(orphan)
    Files.write(orphan.resolve("garbage.parquet"), Array[Byte](1, 2, 3))
    assert(vs.currentVersion == 1) // no manifest -> not committed

    vs.merge(ws(1))
    vs.merge(ws(2))
    assert(vs.currentVersion == 3)
    assert(rows(vs.read(1)) == v1Before, "history must be immutable")
    // current state equals the all-waves merge law
    val ref = new MergeSink(spark, s"$root/ref", "user_id", Seq("ms", "event_id"), 16)
    ws.foreach(ref.merge(_))
    assert(rows(vs.read()) == rows(ref.read()))
  }

  test("vacuum keeps the retained window readable and drops unreferenced versions") {
    val s = spark
    import s.implicits._
    val root = tmpDir("vsink-vacuum")
    // three waves over DISJOINT key ranges so every version keeps owning
    // buckets — then a 4th wave rewriting wave 1's keys strands version 1
    def wave(lo: Long, hi: Long, msBase: Long) =
      spark.range(lo, hi).select($"id".as("user_id"), ($"id" * 10).as("event_id"),
        lit("view").as("event_type"), lit(1.0).as("value"), lit(msBase).as("ms"))
    val vs = new VersionedSink(spark, s"$root/v", "user_id", Seq("ms", "event_id"), 4)
    vs.merge(wave(0, 50, 1000))    // v1
    vs.merge(wave(50, 100, 2000))  // v2
    vs.merge(wave(100, 150, 3000)) // v3
    vs.merge(wave(0, 50, 4000))    // v4 rewrites every v1 bucket (all 4 buckets hit)
    val curBefore = rows(vs.read())

    val dropped = vs.vacuum(retain = 2) // keep manifests v3, v4
    assert(!Files.exists(Paths.get(s"$root/v/_manifests/v00001.manifest")))
    assert(rows(vs.read()) == curBefore)
    assert(rows(vs.read(3)).nonEmpty) // retained window still reads
    intercept[IllegalArgumentException](vs.read(2))
    // v1's data dir survives ONLY if a retained manifest still references it
    if (!Files.exists(Paths.get(s"$root/v/data/v=1"))) assert(dropped.contains(1))
  }
}
