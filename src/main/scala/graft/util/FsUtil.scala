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

  /** Pin the modification time of every regular file under `dir` to `ts`
    * (epoch ms). The file stream source orders batches by mtime; explicit
    * monotonic stamps make multi-batch harness inputs deterministic on any
    * filesystem (coarse-mtime or fast writers would otherwise tie). */
  def pinMtimes(dir: String, ts: Long): Unit = {
    def walk(f: File): Unit =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).foreach(walk)
      else require(f.setLastModified(ts), s"failed to pin mtime on $f")
    walk(new File(dir))
  }
}
