package graft.schema

import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types.{DataType, StructType}

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

  /** Persist the full revision history as JSON files
    * (`<dir>/<name>/<seq>-<revisionId>.json`, StructType's own JSON
    * format) — the durable store the reference keeps in its managed
    * registry. Control-plane-sized: one small file per revision. */
  def persist(dir: String): Unit = synchronized {
    revisions.foreach { case (name, revs) =>
      val d = Paths.get(dir, name)
      Files.createDirectories(d)
      revs.zipWithIndex.foreach { case (rev, i) =>
        Files.writeString(d.resolve(f"$i%05d-${rev.revisionId}.json"), rev.schema.json)
      }
    }
  }
}

object SchemaRegistry {
  /** Rebuild a registry from [[SchemaRegistry.persist]] output. */
  def load(dir: String): SchemaRegistry = {
    val reg = new SchemaRegistry
    val root = Paths.get(dir)
    if (!Files.exists(root)) return reg
    val names = Files.list(root).iterator().asScala.toSeq
      .filter(Files.isDirectory(_)).sortBy(_.getFileName.toString)
    for (nameDir <- names) {
      val files: Seq[Path] = Files.list(nameDir).iterator().asScala.toSeq
        .filter(_.getFileName.toString.endsWith(".json"))
        .sortBy(_.getFileName.toString) // seq prefix restores revision order
      for (f <- files)
        reg.register(nameDir.getFileName.toString,
          DataType.fromJson(Files.readString(f)).asInstanceOf[StructType])
    }
    reg
  }
}
