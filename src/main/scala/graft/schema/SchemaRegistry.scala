package graft.schema

import java.security.MessageDigest
import scala.collection.mutable

import org.apache.spark.sql.types.StructType

/** One immutable revision of a named schema. The revision id is the first 8
  * hex chars of the MD5 of the schema's canonical JSON — deterministic, so
  * re-registering an identical schema yields the identical id (mirrors the
  * revision ids the reference surfaces per message,
  * `/root/reference/README.md:295` `googclient_schemarevisionid=3afd3cc8`,
  * declared at `/root/reference/terraform/main.tf:358-374`).
  */
final case class SchemaRevision(name: String, revisionId: String, schema: StructType)

/** Versioned schema store (SURVEY.md §1.3): topic/sink/source schemas evolve
  * independently, and every published message is stamped with the topic
  * schema revision it validated against.
  *
  * Registry state lives on the driver (schemas are control-plane metadata,
  * a few KB) — executors only ever see the resolved [[StructType]] captured
  * in the query plan, so this scales to any cluster size.
  */
final class SchemaRegistry {

  private val revisions = mutable.LinkedHashMap.empty[String, Vector[SchemaRevision]]

  def revisionIdOf(schema: StructType): String =
    MessageDigest.getInstance("MD5").digest(schema.json.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)

  /** Register a (possibly new) revision. Idempotent when the schema equals
    * the CURRENT latest; re-registering an older schema appends it again so
    * it becomes latest (a sink table altered back to a previous shape must
    * resolve to that shape). */
  def register(name: String, schema: StructType): SchemaRevision = synchronized {
    val rev = SchemaRevision(name, revisionIdOf(schema), schema)
    val existing = revisions.getOrElse(name, Vector.empty)
    if (!existing.lastOption.exists(_.revisionId == rev.revisionId))
      revisions(name) = existing :+ rev
    rev
  }

  def latest(name: String): SchemaRevision = synchronized {
    revisions.get(name).flatMap(_.lastOption)
      .getOrElse(throw new NoSuchElementException(s"no schema registered under '$name'"))
  }

  def revision(name: String, revisionId: String): Option[SchemaRevision] = synchronized {
    revisions.getOrElse(name, Vector.empty).find(_.revisionId == revisionId)
  }

  def history(name: String): Seq[SchemaRevision] = synchronized {
    revisions.getOrElse(name, Vector.empty)
  }
}
