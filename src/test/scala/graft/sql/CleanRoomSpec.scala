package graft.sql

import graft.SparkSpec
import graft.privacy.PolicyCatalog

/** DDL/DML surface (O16–O19), clustered load (O21), views (O22), stored
  * procedures (O24) — the clean-room layer end to end. */
class CleanRoomSpec extends SparkSpec {

  test("DDL/DML lifecycle: CREATE TABLE, INSERT VALUES, ALTER ADD COLUMN, DROP (O16-O19)") {
    spark.sql("CREATE TABLE cr_people (id BIGINT, first_name STRING, zipcode BIGINT) USING parquet")
    try {
      spark.sql("INSERT INTO cr_people VALUES (990, 'Tom', 2174), (991, 'Phil', 2174)")
      assert(spark.sql("SELECT * FROM cr_people").count() === 2)

      // O17: schema evolution at the table (README.md:228 analog)
      spark.sql("ALTER TABLE cr_people ADD COLUMNS (phone STRING)")
      spark.sql("INSERT INTO cr_people VALUES (994, 'Tim', 2174, '508-555-1212')")
      val out = spark.sql(
        "SELECT id, phone FROM cr_people ORDER BY id").collect()
      assert(out.length === 3)
      assert(out.filter(_.getLong(0) < 994).forall(_.isNullAt(1)))
      assert(out.last.getString(1) === "508-555-1212")
    } finally spark.sql("DROP TABLE IF EXISTS cr_people")
    assert(!spark.catalog.tableExists("cr_people"))
  }

  test("clustered bulk load: key-sorted files, pushed filters, same rows (O21)") {
    CleanRoom.loadClustered(spark,
      "/root/testdata/sf0.001/lineitem.parquet", "cr_lineitem", "l_orderkey")
    try {
      val raw = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      assert(spark.table("cr_lineitem").count() === raw.count())

      // the filter must reach the parquet scan (data skipping via row-group
      // stats needs both the sort order and the pushed predicate)
      val q = spark.table("cr_lineitem").filter("l_orderkey = 1")
      val scan = q.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
      assert(scan.contains("PushedFilters") && scan.contains("l_orderkey"))
      assert(q.count() === raw.filter("l_orderkey = 1").count())
    } finally spark.sql("DROP TABLE IF EXISTS cr_lineitem")
  }

  test("load-sig guard survives a wiped warehouse: reload instead of empty table") {
    CleanRoom.loadClustered(spark,
      "/root/testdata/sf0.001/lineitem.parquet", "cr_wiped", "l_orderkey")
    try {
      val n = spark.table("cr_wiped").count()
      assert(n > 0)
      // simulate an operator wiping the warehouse under a live catalog:
      // the table property (and the catalog entry) survive, the files don't
      val loc = new java.io.File(new java.net.URI(
        spark.sql("DESCRIBE TABLE EXTENDED cr_wiped").collect()
          .find(_.getString(0) == "Location").get.getString(1)))
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
      }
      rm(loc)
      // the signature still matches, but upToDate's LIMIT-1 probe must
      // notice the missing data and let the loader rebuild the table
      CleanRoom.loadClustered(spark,
        "/root/testdata/sf0.001/lineitem.parquet", "cr_wiped", "l_orderkey")
      assert(spark.table("cr_wiped").count() === n,
        "loader trusted a stale load_sig over a wiped warehouse")
    } finally spark.sql("DROP TABLE IF EXISTS cr_wiped")
  }

  test("partitioned bulk load: PartitionFilters prune directories (O21 companion)") {
    import org.apache.spark.sql.functions._
    CleanRoom.loadPartitioned(spark,
      "/root/testdata/sf0.001/orders.parquet", "cr_orders_part",
      date_format(col("o_orderdate"), "yyyy-MM"), "order_month")
    try {
      val q = spark.table("cr_orders_part").filter(col("order_month") === "1996-03")
      q.collect()
      val scan = q.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
      assert(scan.contains("PartitionFilters") && scan.contains("order_month"))
      val raw = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .filter(date_format(col("o_orderdate"), "yyyy-MM") === "1996-03")
      assert(q.count() === raw.count() && q.count() > 0)
    } finally spark.sql("DROP TABLE IF EXISTS cr_orders_part")
  }

  test("CTAS and INSERT ... SELECT round-trip through the catalog") {
    try {
      spark.sql("""CREATE TABLE cr_ctas USING parquet AS
                  |SELECT n_nationkey, n_name
                  |FROM parquet.`/root/testdata/sf0.001/nation.parquet`""".stripMargin)
      val base = spark.table("cr_ctas").count()
      assert(base === 25L)
      spark.sql("INSERT INTO cr_ctas SELECT n_nationkey + 100, upper(n_name) FROM cr_ctas")
      assert(spark.table("cr_ctas").count() === base * 2)
    } finally spark.sql("DROP TABLE IF EXISTS cr_ctas")
  }

  test("stored procedure runs the clean-room setup and returns the final SELECT (O24)") {
    try {
      CleanRoom.createProcedure(CleanRoom.Procedure("sp_demo", Seq(
        "CREATE TABLE cr_trip (trip_id BIGINT, customer_id BIGINT, fare DOUBLE) USING parquet",
        "INSERT INTO cr_trip VALUES (1, 10, 5.0), (2, 10, 7.0), (3, 11, 9.0)",
        "CREATE OR REPLACE TEMP VIEW trip_no_pp AS SELECT * FROM cr_trip",
        "SELECT count(*) AS n FROM trip_no_pp")))
      val out = CleanRoom.callProcedure(spark, "sp_demo")
      assert(out.collect()(0).getLong(0) === 3L)
      assert(spark.sql("SELECT * FROM trip_no_pp").count() === 3)
    } finally spark.sql("DROP TABLE IF EXISTS cr_trip")
  }

  test("durable view survives a session restart; temp view does not (O22)") {
    val s = spark
    import s.implicits._
    try {
      spark.sql("CREATE TABLE dur_base (id BIGINT, v STRING) USING parquet")
      spark.sql("INSERT INTO dur_base VALUES (1, 'a'), (2, 'b')")
      CleanRoom.createDurableView(spark, "dur_view", "SELECT * FROM dur_base")
      CleanRoom.createView(spark, "tmp_view", "SELECT * FROM dur_base")
      assert(spark.sql("SELECT count(*) FROM dur_view").collect()(0).getLong(0) === 2L)

      // a NEW SparkSession over the same catalog/warehouse: the durable view
      // resolves, the temp view is gone with its session
      val s2 = spark.newSession()
      assert(s2.sql("SELECT count(*) FROM dur_view").collect()(0).getLong(0) === 2L)
      assert(intercept[Exception](s2.sql("SELECT * FROM tmp_view").collect())
        .getMessage.toLowerCase.contains("cannot be found"))
    } finally {
      spark.sql("DROP VIEW IF EXISTS dur_view")
      spark.sql("DROP TABLE IF EXISTS dur_base")
    }
  }

  test("durable policy view is enforced from a fresh session too (O23)") {
    try {
      spark.sql("CREATE TABLE pol_base (trip_id BIGINT, customer_id BIGINT, city STRING) USING parquet")
      spark.sql("INSERT INTO pol_base VALUES (1,10,'A'),(2,11,'A'),(3,12,'B')")
      CleanRoom.createDurablePolicyView(spark, "pol_view",
        "SELECT * FROM pol_base", "customer_id", 2)
      // the policy lives in the view's OWN catalog properties, not in any
      // session-side state — a fresh session over the same catalog enforces
      val s2 = spark.newSession()
      val out = s2.sql("SELECT city, count(*) AS n FROM pol_view GROUP BY city")
        .collect().map(_.getString(0))
      assert(out.toSeq === Seq("A")) // B: 1 distinct customer, suppressed
      assert(intercept[Exception](s2.sql("SELECT * FROM pol_view").collect())
        .getMessage.contains("must aggregate"))

      // CREATE OR REPLACE without restating the policy drops it (view
      // options semantics) — now raw-readable
      CleanRoom.createDurableView(spark, "pol_view", "SELECT * FROM pol_base")
      assert(spark.sql("SELECT * FROM pol_view").count() === 3L)
    } finally {
      spark.sql("DROP VIEW IF EXISTS pol_view")
      spark.sql("DROP TABLE IF EXISTS pol_base")
    }
  }

  test("a half-declared durable policy fails closed, never raw-readable") {
    try {
      spark.sql("CREATE TABLE half_base (id BIGINT, customer_id BIGINT) USING parquet")
      spark.sql("INSERT INTO half_base VALUES (1, 10)")
      // author declares the unit but typos/omits the threshold key: the
      // intent to protect is clear, so every read must REJECT, not fall
      // back to an unprotected view
      spark.sql(s"""CREATE OR REPLACE VIEW half_view
        TBLPROPERTIES('${PolicyCatalog.UnitProp}' = 'customer_id')
        AS SELECT * FROM half_base""")
      val e = intercept[Exception](
        spark.sql("SELECT count(*) FROM half_view").collect())
      assert(e.getMessage.contains("incomplete privacy policy"))
    } finally {
      spark.sql("DROP VIEW IF EXISTS half_view")
      spark.sql("DROP TABLE IF EXISTS half_base")
    }
  }

  test("durable policy view accepts multi-line SQL with || continuations") {
    try {
      spark.sql("CREATE TABLE cat_base (first_name STRING, last_name STRING, customer_id BIGINT) USING parquet")
      spark.sql("INSERT INTO cat_base VALUES ('a','b',1),('c','d',2)")
      // a '||' at the start of a continuation line used to be eaten by
      // stripMargin over the interpolated template
      CleanRoom.createDurablePolicyView(spark, "cat_view",
        "SELECT first_name\n  || ' ' || last_name AS name, customer_id FROM cat_base",
        "customer_id", 2)
      val n = spark.sql("SELECT count(*) AS n FROM cat_view").collect()(0).getLong(0)
      assert(n === 2L)
    } finally {
      spark.sql("DROP VIEW IF EXISTS cat_view")
      spark.sql("DROP TABLE IF EXISTS cat_base")
    }
  }

  test("the expiration sweep never touches a temp view shadowing an expired table") {
    val s = spark
    import s.implicits._
    try {
      spark.sql("CREATE TABLE shadow_t (id BIGINT) USING parquet")
      CleanRoom.setTableExpiration(spark, "shadow_t", System.currentTimeMillis() - 1000L)
      Seq((1L, "keep-me")).toDF("id", "v").createOrReplaceTempView("shadow_t")
      val dropped = CleanRoom.expireTables(spark)
      assert(dropped === Seq("shadow_t")) // exactly once, not per-database
      // the DROP hit the qualified managed table; the temp view survives
      assert(spark.sql("SELECT v FROM shadow_t").collect()(0).getString(0) === "keep-me")
      assert(!spark.sessionState.catalog.tableExists(
        org.apache.spark.sql.catalyst.TableIdentifier("shadow_t", Some("default"))))
    } finally {
      spark.catalog.dropTempView("shadow_t")
      spark.sql("DROP TABLE IF EXISTS default.shadow_t")
    }
  }

  test("expiration works for database-qualified tables and sweeps all databases") {
    try {
      spark.sql("CREATE DATABASE IF NOT EXISTS expdb")
      spark.sql("CREATE TABLE expdb.qt (id BIGINT) USING parquet")
      spark.sql("INSERT INTO expdb.qt VALUES (1)")
      val now = System.currentTimeMillis()
      CleanRoom.setTableExpiration(spark, "expdb.qt", now + 3600 * 1000L)
      assert(CleanRoom.readTable(spark, "expdb.qt", now).count() === 1L)
      CleanRoom.setTableExpiration(spark, "expdb.qt", now - 1000L)
      // the sweep finds expired tables OUTSIDE the current database too
      val dropped = CleanRoom.expireTables(spark, now)
      assert(dropped === Seq("qt"))
      assert(!spark.catalog.tableExists("expdb.qt"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS expdb.qt")
      spark.sql("DROP DATABASE IF EXISTS expdb")
    }
  }

  test("table expiration: expired tables vanish on read and in the sweep (O16)") {
    try {
      spark.sql("CREATE TABLE exp_t (id BIGINT) USING parquet")
      spark.sql("INSERT INTO exp_t VALUES (1)")
      val now = System.currentTimeMillis()
      CleanRoom.setTableExpiration(spark, "exp_t", now + 3600 * 1000L)
      // not yet expired: reads fine
      assert(CleanRoom.readTable(spark, "exp_t", now).count() === 1L)

      // past expiry: the read rejects and drops, like a BigQuery table at
      // its expiration time
      val e = intercept[NoSuchElementException](
        CleanRoom.readTable(spark, "exp_t", now + 3601 * 1000L))
      assert(e.getMessage.contains("expired"))
      assert(!spark.catalog.tableExists("exp_t"))

      // the sweep drops expired tables and leaves live ones alone
      spark.sql("CREATE TABLE exp_dead (id BIGINT) USING parquet")
      spark.sql("CREATE TABLE exp_live (id BIGINT) USING parquet")
      CleanRoom.setTableExpiration(spark, "exp_dead", now - 1000L)
      CleanRoom.setTableExpiration(spark, "exp_live", now + 3600 * 1000L)
      val dropped = CleanRoom.expireTables(spark, now)
      assert(dropped === Seq("exp_dead"))
      assert(!spark.catalog.tableExists("exp_dead"))
      assert(spark.catalog.tableExists("exp_live"))
    } finally {
      Seq("exp_t", "exp_dead", "exp_live")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("sp_demo_cleanroom replays the reference procedure end to end (O21-O24)") {
    val s = spark
    import s.implicits._
    val root = tmpDir("spdemo")
    try {
      // the shared trip parquet the reference LOADs from gs://
      // (sp_demo_cleanroom.sql:43-47): city A has 2 distinct customers,
      // city B has 1
      Seq((1L, 101L, "A", 10.0), (2L, 102L, "A", 20.0), (3L, 101L, "A", 5.0),
          (4L, 201L, "B", 7.0))
        .toDF("trip_id", "customer_id", "city", "fare")
        .write.parquet(s"$root/trips")
      CleanRoom.spDemoCleanroom(spark, s"$root/trips")

      // plain view: raw access allowed (trip_no_pp, sql:60-63)
      assert(spark.sql("SELECT * FROM cleanroom_data_publisher.trip_no_pp").count() === 4L)
      // policy view: raw access rejected; under-threshold groups suppressed
      // (sql:51-57, threshold 2 on customer_id)
      val e = intercept[Exception](
        spark.sql("SELECT * FROM cleanroom_data_publisher.trip").collect())
      assert(e.getMessage.contains("must aggregate"))
      val cities = spark.sql(
        "SELECT city, count(*) AS n FROM cleanroom_data_publisher.trip GROUP BY city")
        .collect().map(_.getString(0))
      assert(cities.toSeq === Seq("A")) // B: 1 distinct customer

      // the publisher views are dataset-level: a fresh session still
      // resolves them and the policy still binds
      val s2 = spark.newSession()
      assert(s2.sql("SELECT * FROM cleanroom_data_publisher.trip_no_pp").count() === 4L)
      assert(intercept[Exception](
        s2.sql("SELECT * FROM cleanroom_data_publisher.trip").collect())
        .getMessage.contains("must aggregate"))

      // clustered load produced key-ordered files (CLUSTER BY trip_id)
      val files = spark.sql("SELECT * FROM cleanroom_data.trip").inputFiles
      assert(files.nonEmpty)
    } finally {
      spark.sql("DROP VIEW IF EXISTS cleanroom_data_publisher.trip")
      spark.sql("DROP VIEW IF EXISTS cleanroom_data_publisher.trip_no_pp")
      spark.sql("DROP TABLE IF EXISTS cleanroom_data.trip")
      spark.sql("DROP DATABASE IF EXISTS cleanroom_data_publisher")
      spark.sql("DROP DATABASE IF EXISTS cleanroom_data")
    }
  }

  test("policy view created through the clean-room API enforces the threshold (O23)") {
    val s = spark
    import s.implicits._
    try {
      Seq((1L, 10L, "A"), (2L, 10L, "A"), (3L, 11L, "A"), (4L, 12L, "B"))
        .toDF("trip_id", "customer_id", "city").createOrReplaceTempView("cr_base")
      CleanRoom.createPolicyView(spark, "cr_trip_pp",
        "SELECT * FROM cr_base", "customer_id", 2)
      val out = spark.sql(
        "SELECT city, count(*) AS n FROM cr_trip_pp GROUP BY city").collect()
      assert(out.map(_.getString(0)).toSeq === Seq("A")) // B: 1 distinct customer
      val e = intercept[Exception](spark.sql("SELECT * FROM cr_trip_pp").collect())
      assert(e.getMessage.contains("must aggregate"))
    } finally {
      // the policy rides on the temp view instance — dropping the view is
      // the cleanup (there is no registry to clear)
      spark.catalog.dropTempView("cr_trip_pp")
      spark.catalog.dropTempView("cr_base")
    }
  }
}
