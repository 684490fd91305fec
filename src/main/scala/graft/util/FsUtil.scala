package graft.util

import java.io.File

/** Local-filesystem helpers shared by the file-backed topic/sink/catalog
  * plumbing (driver-side control-plane paths only — data paths go through
  * Spark's committers). */
object FsUtil {
  /** Recursive delete; no-op for a missing path. */
  def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(); ()
  }
}
