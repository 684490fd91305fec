package org.apache.spark.sql.avro

import org.apache.avro.Schema

import org.apache.spark.sql.types.DataType

/** Bridge to the `private[sql]` Avro record serializer machinery.
  *
  * This Spark build ships `AvroSerializer`/`AvroDeserializer` inside
  * spark-sql (they back the Avro FILE format) but not the external
  * expression module that would expose per-record `to_avro`/`from_avro`.
  * [[graft.functions.expressions.AvroEncode]]/[[graft.functions.expressions.AvroDecode]]
  * re-provide those semantics and reach the package-private converters
  * through this one narrow, documented seam — nothing else in the engine
  * lives outside the `graft` namespace.
  */
object GraftAvroBridge {

  /** Catalyst value (InternalRow for structs) → Avro datum. */
  def serializer(catalystType: DataType, avroType: Schema): Any => Any = {
    val s = new AvroSerializer(catalystType, avroType, nullable = false)
    s.serialize _
  }

  /** Avro datum → Catalyst value (None = filtered/absent). */
  def deserializer(avroType: Schema, catalystType: DataType): Any => Option[Any] = {
    val d = new AvroDeserializer(
      avroType, catalystType, "CORRECTED",
      false, "", -1)
    d.deserialize _
  }
}
