package graft.config

/** O28 — config template rendering: the reference deploys its connector
  * from a `.properties` template whose ALL-CAPS placeholder tokens
  * (PROJECT_ID, MYSQL_IP, MYSQL_DATABASENAME, ...) are substituted per
  * environment (`/root/reference/conf/debezium.properties:1-21`,
  * `/root/reference/README.md` deploy steps), and the rendered file fully
  * determines the pipeline: source include lists, the unwrap SMT chain,
  * delete handling, offset flush cadence.
  *
  * The engine analog keeps that contract: [[render]] substitutes a
  * template's placeholders (fail-closed on anything left unresolved),
  * [[parse]] reads the properties shape, and [[cdcSpec]] extracts the
  * VALIDATED settings that drive [[graft.streaming.CdcIngest]] — so a
  * rendered config, not code, wires the running pipeline, exactly as the
  * reference's deployment does. Driver-side control plane: strings only,
  * no data path.
  */
object PipelineConfig {

  /** Substitute every `vars` token in the template (longest token first, so
    * `MYSQL_DATABASENAME` wins over a hypothetical `MYSQL_DATABASE`
    * prefix).
    *
    * Placeholder convention (the reference's): an ALL-CAPS token
    * CONTAINING AN UNDERSCORE (`PROJECT_ID`, `MYSQL_IP`, ...) — plain
    * all-caps words (`JSON`, a format name) are legal literal values, so
    * the convention is what makes unbound-placeholder detection possible
    * at all. Enforced on both sides: every `vars` key must follow it, and
    * any template token following it that is NOT bound fails the render
    * (deploy error, not a value). Detection runs on the TEMPLATE's own
    * tokens so a substituted all-caps value can never false-positive;
    * comment lines are free text. */
  def render(template: String, vars: Map[String, String]): String = {
    val badKeys = vars.keys.filterNot(_.matches(raw"[A-Z][A-Z0-9]*(_[A-Z0-9]+)+"))
    require(badKeys.isEmpty,
      s"template variables must be ALL_CAPS_WITH_UNDERSCORE: ${badKeys.mkString(", ")}")
    val leftover = raw"\b[A-Z][A-Z0-9_]{2,}\b".r.findAllIn(
      template.linesIterator.filterNot(_.trim.startsWith("#")).mkString("\n")
    ).toList.distinct.filter(t => t.contains("_") && !vars.contains(t))
    require(leftover.isEmpty,
      s"unresolved template placeholders: ${leftover.mkString(", ")}")
    vars.toSeq.sortBy(-_._1.length).foldLeft(template) {
      case (acc, (k, v)) => acc.replace(k, v)
    }
  }

  /** Parse `k=v` properties lines; `#` comments and blanks ignored; later
    * duplicates win (properties semantics). */
  def parse(props: String): Map[String, String] =
    props.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains('='))
      .map { l => val i = l.indexOf('='); l.take(i).trim -> l.drop(i + 1).trim }
      .toMap

  /** The validated settings that wire a CDC ingest pipeline — each field
    * maps 1:1 onto an engine seam (reference key in parens):
    *  - `includeDb`/`includeTable`: the source include lists
    *    (`database.include.list` / `table.include.list`) → [[graft.cdc.Cdc.includeFilter]]
    *  - `deleteRewrite`: `transforms.unwrap.delete.handling.mode=rewrite` →
    *    [[graft.cdc.Cdc.unwrapRewrite]]'s `__deleted` column
    *  - `offsetFlushMs`: `offset.flush.interval.ms` → checkpoint cadence
    *    (0 = per micro-batch, the engine's native granularity)
    *  - `topicProject`: the sink project (`sink.pubsub.project.id`) —
    *    topic namespace. */
  final case class CdcPipelineSpec(includeDb: String, includeTable: String,
      deleteRewrite: Boolean, offsetFlushMs: Long, topicProject: String)

  def cdcSpec(props: Map[String, String]): CdcPipelineSpec = {
    def req(k: String): String = props.getOrElse(k,
      throw new IllegalArgumentException(s"missing required config key '$k'"))
    val table = req("debezium.source.table.include.list")
    val db = req("debezium.source.database.include.list")
    // fail-loud, never silent garbage: a comma-separated include list would
    // flow into the single-table filter as one bogus name and publish
    // nothing. One pipeline per table is the engine's (and the reference
    // lab's) shape.
    require(!db.contains(',') && !table.contains(','),
      s"multi-valued include lists are not supported (db='$db', table='$table'): " +
        "run one ingest pipeline per table")
    require(table.startsWith(db + "."),
      s"table include '$table' must be qualified by the included database '$db'")
    val unwrapMode = props.getOrElse(
      "debezium.source.transforms.unwrap.delete.handling.mode", "drop")
    CdcPipelineSpec(
      includeDb = db,
      includeTable = table.stripPrefix(db + "."),
      deleteRewrite = unwrapMode == "rewrite",
      offsetFlushMs = props.getOrElse("debezium.source.offset.flush.interval.ms", "60000").toLong,
      topicProject = req("debezium.sink.pubsub.project.id"))
  }
}
