package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.SparkSpec

/** Z-order clustering contracts: the Morton interleave is bit-exact vs a
  * naive reference, and the layout DELIVERS measured multi-dimensional
  * pruning — a trailing-key range predicate must scan far fewer parquet
  * rows under the z layout than under single-key linear clustering (where
  * the trailing key is uniform in every file and min/max stats are
  * useless). */
class ZOrderSpec extends SparkSpec {

  import graft.functions.expressions.ZOrder

  test("morton interleave equals the bit-by-bit reference; ordering is the unsigned z curve") {
    def ref(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 31) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val interesting = Seq(0L, 1L, 2L, 3L, 255L, 256L, 65535L, 65536L,
      0x7FFFFFFFL, 0xFFFFFFFFL /* masked to 31 bits */, 12345678L)
    for (a <- interesting; b <- interesting) {
      assert(ZOrder.compute(a, b) === ref(a & 0x7FFFFFFFL, b & 0x7FFFFFFFL), s"a=$a b=$b")
      assert(ZOrder.compute(a, b) >= 0L, "31+31-bit interleave must stay positive (signed sort = z order)")
    }
    // locality sanity: fixing high bits of both keys bounds the z range
    assert(ZOrder.compute(4L, 4L) < ZOrder.compute(8L, 8L))
  }

  /** Rows materialized by the parquet scan (after row-group/page skipping
    * driven by min/max stats, before Spark's own Filter). */
  private def scannedRows(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collectLeaves().collect {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }.sum
  }

  test("trailing-key predicate: z layout scans a fraction of what linear clustering scans") {
    val s = spark
    import s.implicits._
    val dir = "/root/testdata/sf0.001"
    CleanRoom.loadZOrdered(s, s"$dir/lineitem.parquet", "zspec_z",
      "l_orderkey", "l_partkey", numFiles = 32)
    // linear layout, same file count, clustered on the LEADING key only.
    // DROP + location sweep (the loadClustered/loadZOrdered pattern): an
    // in-memory catalog forgets managed tables across JVMs but their
    // warehouse directories survive, and a stale one fails the CTAS with
    // LOCATION_ALREADY_EXISTS.
    s.sql("DROP TABLE IF EXISTS zspec_linear")
    val warehouse = new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath
    val stale = new java.io.File(warehouse, "zspec_linear")
    if (stale.exists()) graft.util.FsUtil.deleteRecursively(stale)
    s.read.parquet(s"$dir/lineitem.parquet")
      .repartitionByRange(32, $"l_orderkey")
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").format("parquet").saveAsTable("zspec_linear")

    def q(table: String): DataFrame =
      s.table(table).filter($"l_partkey".between(1, 25)).select($"l_partkey", $"l_quantity")

    // identical answers regardless of layout
    assert(q("zspec_z").collect().sortBy(_.toString).toSeq ===
      q("zspec_linear").collect().sortBy(_.toString).toSeq)

    val total = s.table("zspec_linear").count()
    val zRows = scannedRows(q("zspec_z"))
    val linRows = scannedRows(q("zspec_linear"))
    // partkey is uniform within every orderkey-clustered file -> linear
    // layout can prune nothing on a partkey-only predicate
    assert(linRows > (total * 9) / 10,
      s"expected the linear layout to scan ~everything, scanned $linRows of $total")
    assert(zRows * 2 < linRows,
      s"z layout must scan well under half of linear ($zRows vs $linRows of $total)")
  }
}
