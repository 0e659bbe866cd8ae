package graft.util

import java.nio.file.{Files, Path, Paths}

/** Temp-dir lifecycle shared by the queries that stage files on local
  * disk (table-format replay, streaming landing zones). */
object Tmp {

  /** Run `body` with a fresh temp directory; always delete it (and its
    * contents, depth-first) afterwards. */
  def withTempDir[A](prefix: String)(body: Path => A): A = {
    val dir = Files.createTempDirectory(prefix)
    try body(dir)
    finally deleteRecursively(dir)
  }

  /** Stage a single file into a fresh temp directory (the
    * FileStreamSource requires a directory), run `body` on the dir. */
  def withStagedFile[A](prefix: String, file: String)(body: Path => A): A =
    withTempDir(prefix) { dir =>
      val src = Paths.get(file)
      Files.copy(src, dir.resolve(src.getFileName))
      body(dir)
    }

  def deleteRecursively(dir: Path): Unit = {
    import scala.jdk.CollectionConverters._
    val walk = Files.walk(dir)
    // materialize before closing: deleting while the walk is open is
    // undefined; closing releases the directory file descriptor
    val paths = try walk.iterator().asScala.toSeq finally walk.close()
    paths.reverse.foreach(p => Files.deleteIfExists(p))
  }
}
