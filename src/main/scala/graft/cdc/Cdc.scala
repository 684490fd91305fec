package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium-shaped CDC envelope handling, re-expressed as Catalyst column
  * operations (SURVEY.md §2 O1–O5).
  *
  * The reference declares these as Debezium SMT config
  * (`/root/reference/conf/debezium.properties:11-19`):
  *   - include-list filter on `source.db` / `source.table`        (O2)
  *   - `ExtractNewRecordState` envelope flatten                    (O3)
  *   - `delete.handling.mode=rewrite` → `__deleted` flag column    (O4)
  *   - schemaless JSON key/value converters                        (O5)
  *
  * Everything here is a pure projection/filter — no shuffle, no state — so it
  * fuses into one whole-stage-codegen span over the source scan and runs at
  * scan speed on any cluster size.
  */
object Cdc {

  /** Marker column carrying the delete-rewrite flag. Kept a STRING
    * ("true"/"false"), not boolean — pinned by the reference goldens
    * (`/root/reference/README.md:210-213`). */
  val DeletedCol = "__deleted"

  val sourceSchema: StructType = StructType(Seq(
    StructField("db", StringType), StructField("table", StringType)))

  /** Debezium envelope schema for a given row schema:
    * {before, after, source{db,table}, op, ts_ms}. */
  def envelopeSchema(rowSchema: StructType): StructType = StructType(Seq(
    StructField("before", rowSchema, nullable = true),
    StructField("after", rowSchema, nullable = true),
    StructField("source", sourceSchema, nullable = true),
    StructField("op", StringType, nullable = true),
    StructField("ts_ms", LongType, nullable = true)))

  /** O1/O5 inbound: parse a raw JSON `value` column into the typed envelope.
    * PERMISSIVE keeps malformed rows (all-null envelope) for DLQ routing
    * instead of killing the stream. */
  def parseEnvelope(df: DataFrame, valueCol: String, rowSchema: StructType): DataFrame =
    df.withColumn("envelope", from_json(col(valueCol), envelopeSchema(rowSchema)))
      .select(col("envelope.*"))

  /** O2: include-list filter on source metadata — evaluated before any other
    * work so excluded tables cost only the scan of their metadata columns. */
  def includeFilter(df: DataFrame, db: String, table: String): DataFrame =
    df.filter(col("source.db") === db && col("source.table") === table)

  /** O3+O4: flatten the envelope to one row per event. Inserts/updates
    * project `after.*`; deletes project `before.*` (rewrite mode) and get
    * `__deleted = "true"`. */
  def unwrapRewrite(df: DataFrame): DataFrame = {
    val rowSchema = df.schema("after").dataType.asInstanceOf[StructType]
    val isDelete = col("op") === "d"
    val fields: Seq[Column] = rowSchema.fieldNames.toSeq.map { f =>
      when(isDelete, col(s"before.`$f`")).otherwise(col(s"after.`$f`")).as(f)
    }
    val deleted = when(isDelete, lit("true")).otherwise(lit("false")).as(DeletedCol)
    df.select(fields :+ deleted: _*)
  }

  /** O3+O4, `delete.handling.mode=drop`: the other documented unwrap mode —
    * delete events are removed entirely and no `__deleted` marker column is
    * added (the sink only ever sees upserts). */
  def unwrapDrop(df: DataFrame): DataFrame = {
    val rowSchema = df.schema("after").dataType.asInstanceOf[StructType]
    df.filter(col("op") =!= "d")
      .select(rowSchema.fieldNames.toSeq.map(f => col(s"after.`$f`").as(f)): _*)
  }

  /** O5 outbound: serialize rows back to (key, value) JSON — key is the
    * serialized PK struct (the Pub/Sub ordering key in the reference,
    * `/root/reference/README.md:292`), value the full row. */
  def toKeyedJson(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.select(
      to_json(struct(keyCols.map(col): _*)).as("key"),
      to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))
}
