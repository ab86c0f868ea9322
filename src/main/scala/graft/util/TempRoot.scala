package graft.util

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Session-scoped scratch space: every staging directory the library needs
  * (stream staging, log round-trips, PDF fixtures) nests under ONE root
  * that a shutdown hook removes, so repeated Verify/bench runs leave no
  * growth in the system temp dir. At cluster scale this maps to a job-
  * scoped prefix the orchestrator cleans (the same contract).
  */
object TempRoot {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft-session-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  /** A fresh subdirectory under the session root. */
  def dir(prefix: String): Path =
    Files.createTempDirectory(root, prefix)

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(f =>
        try Files.delete(f) catch { case _: java.io.IOException => () })
}
