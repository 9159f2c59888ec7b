package graft.util

/** Tracked temp directories for the pipeline queries' scratch output.
  *
  * The end-to-end pipeline entries (p_*) write real segment data to local
  * temp dirs; leaving those behind means hundreds of MB of dirty page cache
  * flushing to disk DURING whatever runs next — measured as multi-second
  * inflation of unrelated queries late in a bench battery. Deleting the
  * files promptly (before writeback) lets the kernel drop the dirty pages
  * without ever touching the disk.
  */
object TempDirs {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** Create and track a temp directory. */
  def create(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toString
    dirs.add(d)
    d
  }

  /** Create and track a unique directory under an explicit base (e.g. a
    * caller-chosen staging filesystem rather than java.io.tmpdir).
    */
  def createUnder(base: String, prefix: String): String = {
    val b = java.nio.file.Paths.get(base)
    java.nio.file.Files.createDirectories(b)
    val d = java.nio.file.Files.createTempDirectory(b, prefix).toString
    dirs.add(d)
    d
  }

  /** Delete every tracked directory (best-effort). Callers invoke this
    * OUTSIDE timed regions — e.g. Bench between queries, mains at exit.
    */
  def cleanAll(): Unit = {
    var d = dirs.poll()
    while (d != null) {
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
      catch { case _: java.io.IOException => () }
      d = dirs.poll()
    }
  }
}
