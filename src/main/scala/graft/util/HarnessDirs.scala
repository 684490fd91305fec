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

  private lazy val root: Path = {
    val base = Paths.get(sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft-harness")
    Files.createDirectories(base)
    val it = Files.list(base).iterator()
    while (it.hasNext) {
      val p = it.next()
      if (p.getFileName.toString.toLongOption.exists(pid => ProcessHandle.of(pid).isEmpty))
        FsUtil.deleteRecursively(p.toFile)
    }
    val mine = base.resolve(ProcessHandle.current().pid().toString)
    Files.createDirectories(mine)
    sys.addShutdownHook(FsUtil.deleteRecursively(mine.toFile))
    mine
  }

  /** Fresh unique directory under this JVM's harness root. */
  def newDir(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString
}
