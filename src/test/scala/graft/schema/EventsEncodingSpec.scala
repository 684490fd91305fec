package graft.schema

import org.apache.spark.sql.types.TimestampType

import graft.{SparkSpec, Tables}

/** Canary for the driver's events.parquet timestamp encoding.
  *
  * The testdata generator has shipped `events.ts` in two encodings so far
  * (nanos-as-int64, then µs-without-UTC-flag → TIMESTAMP_NTZ under Spark 4's
  * default inference); each flip silently broke every `unix_millis`/
  * `window`/`watermark` call site downstream of the load seam. This spec
  * pins the contract of [[graft.Tables.events]] — plain TimestampType out,
  * whatever encoding is on disk — across every SF directory, so the NEXT
  * encoding change fails one named test instead of ~22 opaque oracle gates.
  */
class EventsEncodingSpec extends SparkSpec {

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    val dir = s"/root/testdata/$sf"
    test(s"Tables.events normalizes ts to TimestampType ($sf)") {
      assume(new java.io.File(dir).isDirectory, s"$dir not present")
      val df = Tables.events(spark, dir)
      assert(df.schema("ts").dataType == TimestampType,
        s"events.ts must load as TimestampType, got ${df.schema("ts").dataType}")
      // and the values must be usable by the ms-epoch call sites — head()
      // forces runtime evaluation (limit+count would let column pruning
      // drop the unevaluated projection, checking only analysis-time typing)
      val row = df.selectExpr("unix_millis(ts)").head()
      assert(!row.isNullAt(0), "unix_millis(ts) evaluated to null")
    }
  }
}
