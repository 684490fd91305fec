package graft.functions.expressions

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.avro.{GraftAvroBridge, SchemaConverters}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StructType}

/** Native per-message Avro wire codec — the topic's record encoding
  * (the reference declares an AVRO-typed Pub/Sub schema:
  * `google_pubsub_schema … type = "AVRO"`,
  * `/root/reference/terraform/main.tf:357-364`), as a Catalyst expression
  * pair so encode/decode stay inside whole-stage codegen.
  *
  * Why custom: this Spark build ships the Avro FILE format and the
  * serializer machinery inside spark-sql, but not the external expression
  * module that backs `to_avro`/`from_avro` (calling them throws
  * AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE). These expressions provide the
  * same single-record binary encoding over the public
  * AvroSerializer/AvroDeserializer + avro Generic API: one shared literal
  * wire schema on both ends, one direct binary encoder per task reused
  * across rows (per-task expression copies — tasks deserialize their own
  * closure — so the reused output buffer is single-threaded by
  * construction). */
case class AvroEncode(child: Expression, schemaJson: String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StructType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_avro_encode expects a struct, got ${t.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_avro_encode"

  // The wire schema is the EXPLICIT literal both ends share, never derived
  // from child.dataType at execution: the optimizer legally narrows
  // attribute nullability (e.g. below an IsNotNull filter), which would
  // silently drop union branches from a derived writer schema and desync
  // it from the reader's.
  @transient private lazy val avroSchema: Schema =
    new Schema.Parser().parse(schemaJson)
  @transient private lazy val serialize: Any => Any =
    GraftAvroBridge.serializer(child.dataType, avroSchema)
  @transient private lazy val writer = new GenericDatumWriter[Any](avroSchema)
  @transient private lazy val out = new ByteArrayOutputStream()
  @transient private var encoder: BinaryEncoder = _

  def encode(input: Any): Array[Byte] = {
    out.reset()
    encoder = EncoderFactory.get().directBinaryEncoder(out, encoder)
    writer.write(serialize(input), encoder)
    encoder.flush()
    out.toByteArray
  }

  override def nullSafeEval(input: Any): Any = encode(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("avroEncode", this, classOf[AvroEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = (byte[]) $ref.encode($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `graft_avro_decode(bytes, schemaJson)` — decode one Avro binary record
  * under the given (literal) writer schema back to the struct that schema
  * maps to under SchemaConverters. FAILFAST: malformed bytes throw, they
  * don't null out — a wire gate must not pass by silently dropping rows.
  * The returned row follows Spark's row-reuse convention (valid until the
  * next invocation), exactly like the stock `from_avro`. */
case class AvroDecode(child: Expression, schemaJson: String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_avro_decode expects binary, got ${t.simpleString}")
  }
  override lazy val dataType: DataType =
    SchemaConverters.toSqlType(new Schema.Parser().parse(schemaJson)).dataType
  override def prettyName: String = "graft_avro_decode"
  // nullable even over a non-null child: keeps ev.isNull an assignable
  // variable in codegen (the deserializer's None case must null out)
  override def nullable: Boolean = true

  @transient private lazy val avroSchema: Schema =
    new Schema.Parser().parse(schemaJson)
  @transient private lazy val reader = new GenericDatumReader[Any](avroSchema)
  @transient private lazy val deserialize: Any => Option[Any] =
    GraftAvroBridge.deserializer(avroSchema, dataType)
  @transient private var decoder: BinaryDecoder = _
  @transient private var record: Any = _

  def decode(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    decoder = DecoderFactory.get().binaryDecoder(bytes, 0, bytes.length, decoder)
    record = reader.read(record, decoder)
    // FAILFAST covers trailing data too: a valid record followed by garbage
    // (truncation/concatenation corruption leaving a parseable prefix) must
    // not pass the wire gate silently
    if (!decoder.isEnd) throw new org.apache.avro.AvroRuntimeException(
      s"graft_avro_decode: trailing bytes after a complete record (input ${bytes.length} bytes)")
    deserialize(record).getOrElse(null)
  }

  override def nullSafeEval(input: Any): Any = decode(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("avroDecode", this, classOf[AvroDecode].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.decode($c);
         |${ev.isNull} = ${ev.value} == null;
         |""".stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
