package graft.util

import java.nio.file.{Files, Path, Paths}

/** Temp directories for harness queries (q31's topic/checkpoint/sink dirs,
  * q34's merge table) whose results are read LAZILY after the query function
  * returns — so they cannot be deleted in a `finally` inside the query.
  *
  * Instead every dir lives under one per-JVM root that a shutdown hook
  * removes, and each new JVM reaps roots left behind by dead JVMs (crash,
  * kill -9). Repeated verify/bench sweeps therefore leave /tmp stable
  * instead of accumulating sink/checkpoint dirs. */
object HarnessDirs {

  /** Root name `<pid>-<jvm start ms>`: liveness is the PAIR, so a recycled
    * pid on a busy host cannot keep a dead JVM's root alive forever. */
  private def isLive(name: String): Boolean = name.split('-') match {
    case Array(pid, startMs) =>
      (pid.toLongOption, startMs.toLongOption) match {
        case (Some(p), Some(s)) => ProcessHandle.of(p).map[Boolean] { h =>
          h.info().startInstant().map[Boolean](_.toEpochMilli == s).orElse(true)
        }.orElse(false)
        case _ => true // unrecognized name: leave it alone
      }
    case _ => true
  }

  private lazy val root: Path = {
    val base = Paths.get(sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft-harness")
    Files.createDirectories(base)
    val listing = Files.list(base)
    try {
      val it = listing.iterator()
      while (it.hasNext) {
        val p = it.next()
        if (!isLive(p.getFileName.toString)) FsUtil.deleteRecursively(p.toFile)
      }
    } finally listing.close()
    val self = ProcessHandle.current()
    val startMs = self.info().startInstant()
      .map[Long](_.toEpochMilli).orElse(0L)
    val mine = base.resolve(s"${self.pid()}-$startMs")
    Files.createDirectories(mine)
    sys.addShutdownHook(FsUtil.deleteRecursively(mine.toFile))
    mine
  }

  /** Fresh unique directory under this JVM's harness root. */
  def newDir(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString

  /** Deterministic per-name directory under this JVM's harness root, for
    * query-internal pins that are re-written on every invocation: writing
    * with `mode("overwrite")` then reclaims the PREVIOUS invocation's files
    * instead of accumulating one fresh multi-hundred-MB dir per bench rep
    * until JVM shutdown (q144's two edge-scale pins at ×100 are the case
    * that motivated this). Only safe for pins whose consumers are all
    * materialized within the same invocation — the next invocation's
    * overwrite destroys the files. */
  def reusableDir(name: String): String = {
    val p = root.resolve(name)
    Files.createDirectories(p)
    p.toString
  }
}
