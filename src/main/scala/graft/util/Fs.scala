package graft.util

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import scala.util.Using

/** Small filesystem helpers shared across packages.
  *
  * `Files.walk` returns a `java.util.stream.Stream` backed by OPEN
  * directory handles (one per level of the walk); dropping it without
  * `close()` leaks those handles until GC. Every walk in the engine
  * goes through these helpers so the stream is always closed — a
  * long-lived driver (streaming queries stopping/starting, vacuum
  * loops) must not accumulate handles per maintenance call. */
object Fs {

  /** All paths under `dir` (depth-first order), stream closed. */
  def walkList(dir: Path): Seq[Path] =
    Using.resource(Files.walk(dir))(_.iterator.asScala.toSeq)

  /** Recursively delete `dir` (children before parents). Missing dirs
    * are a no-op; concurrent removals are tolerated (deleteIfExists). */
  def deleteTree(dir: Path): Unit =
    if (Files.exists(dir))
      walkList(dir).reverse.foreach(Files.deleteIfExists(_))
}
