package graft

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Scratch-directory lifecycle for the sink round-trip queries.
  *
  * Several `SparkEntry.queries` write to a temp dir and return a DataFrame
  * that lazily re-reads it, so the dir can only be deleted after the
  * caller's action. Callers that run many queries (Bench, Verify) sweep
  * recorded dirs between queries; `sweepStale` reclaims dirs left behind
  * by crashed or interrupted runs — hundreds of accumulated scratch dirs
  * were measured to distort bench runs by 2-7x via tmpfs pressure.
  */
object TmpDirs {
  private val recorded = new ConcurrentLinkedQueue[Path]()

  /** Create a scratch dir under java.io.tmpdir and record it for sweeping. */
  def create(prefix: String): String = {
    val p = Files.createTempDirectory(s"graft_$prefix")
    recorded.add(p)
    p.toString
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }

  /** Delete every dir handed out by `create` since the last sweep. Only
    * call after all actions on the dependent DataFrames have completed. */
  def sweepRecorded(): Unit = {
    var p = recorded.poll()
    while (p != null) {
      try deleteRecursively(p) catch { case _: java.io.IOException => () }
      p = recorded.poll()
    }
  }

  /** Delete graft_* scratch dirs in java.io.tmpdir last modified more than
    * `olderThanMs` ago (guards against racing a concurrently running
    * Verify/Bench/test JVM, whose dirs are seconds old). */
  def sweepStale(olderThanMs: Long = 30L * 60 * 1000): Int = {
    val tmp = Paths.get(System.getProperty("java.io.tmpdir"))
    val cutoff = System.currentTimeMillis() - olderThanMs
    var n = 0
    Files.list(tmp).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("graft_"))
      .filter(p => Files.getLastModifiedTime(p).toMillis < cutoff)
      .foreach { p =>
        try { deleteRecursively(p); n += 1 }
        catch { case _: java.io.IOException => () }
      }
    n
  }
}
