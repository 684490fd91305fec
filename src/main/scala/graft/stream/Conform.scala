package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sink-schema conformance — the reference's three documented drift rules
  * (SURVEY.md §1.3, O7/O11), driven by `use_topic_schema = true` +
  * `drop_unknown_fields = false` (`/root/reference/terraform/main.tf:393-398`):
  *
  *  1. message field NOT in topic schema  → silently dropped
  *     (`phone` never reaches the sink, `/root/reference/README.md:288`);
  *  2. sink column NOT in topic schema    → NULL-filled
  *     (`age` stays NULL, `/root/reference/README.md:363-371`);
  *  3. topic field with NO sink column    → delivery fails → retry → DLQ
  *     ("zero results … schema mismatch", `/root/reference/README.md:448`).
  *
  * All pure projections: at scale this is a zero-shuffle, codegen'd select.
  */
object Conform {

  /** Rule 3 surfaces as a typed failure the subscription retry loop can
    * catch and dead-letter (it must NOT kill the streaming query). */
  final case class SchemaMismatchException(missingInSink: Seq[String])
    extends RuntimeException(
      s"topic-schema fields with no sink column: ${missingInSink.mkString(", ")}")

  /** O7: gate rows against the topic schema. Fields beyond the topic schema
    * are dropped here (rule 1); fields missing in the row become NULL, which
    * the Avro-JSON encoding tolerates for nullable fields. */
  def validateAgainstTopic(df: DataFrame, topicSchema: StructType): DataFrame = {
    val present = df.columns.toSet
    df.select(topicSchema.fields.toSeq.map { f =>
      if (present(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  /** O11: project a topic-conformant row onto the sink schema, applying the
    * three rules above. Throws [[SchemaMismatchException]] (rule 3) at plan
    * time — before any data moves — matching the reference where the whole
    * delivery attempt fails, not individual rows. */
  def conformToSink(df: DataFrame, topicSchema: StructType, sinkSchema: StructType): DataFrame = {
    val sinkNames = sinkSchema.fieldNames.toSet
    val missingInSink = topicSchema.fieldNames.toSeq.filterNot(sinkNames)
    if (missingInSink.nonEmpty) throw SchemaMismatchException(missingInSink)

    val topicNames = topicSchema.fieldNames.toSet
    val present = df.columns.toSet
    df.select(sinkSchema.fields.toSeq.map { f =>
      if (topicNames(f.name) && present(f.name))
        col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name) // rule 2: null-fill
    }: _*)
  }
}
