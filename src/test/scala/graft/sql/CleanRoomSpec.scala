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
    } finally PolicyCatalog.clear()
  }
}
