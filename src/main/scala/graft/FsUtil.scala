package graft

/** Tiny shared filesystem helpers for the harness mains (Bench, ScaleBench,
  * the q42 snapshot query) — one definition instead of three private
  * copies. */
object FsUtil {

  /** Recursive delete; tolerates a vanished path and a null `listFiles`
    * (permission error / concurrent removal). */
  def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val kids = f.listFiles
      if (kids != null) kids.foreach(rmTree)
    }
    f.delete()
  }

  def rmTree(path: String): Unit = rmTree(new java.io.File(path))
}
