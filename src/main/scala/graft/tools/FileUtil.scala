package graft.tools

import java.nio.file.{Files, Path}

/** Local-filesystem helpers shared by artifact-cleanup paths (the
  * DedupQ shutdown hook, stress-harness corpus teardown). */
object FileUtil {

  /** Recursive delete, deepest-first. `strict = false` (cleanup mode)
    * swallows EVERY failure — concurrently-removed entries, traversal
    * errors surfacing as UncheckedIOException mid-stream, an absent
    * root — so a shutdown hook can never die half-way and strand the
    * rest of the tree. `strict = true` propagates any failure AND
    * requires the root to exist (for callers where the deletion IS the
    * assertion, e.g. ScaleStress's deleted-corpus proof — silently
    * no-opping on a wrong path would report the proof without running
    * it). */
  def deleteTree(root: Path, strict: Boolean = false): Unit = {
    if (!Files.exists(root)) {
      if (strict) throw new java.nio.file.NoSuchFileException(root.toString)
      return
    }
    try {
      val walk = Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder()).forEach { p =>
        try { Files.deleteIfExists(p); () }
        catch { case e: Exception => if (strict) throw e }
      } finally walk.close()
    } catch { case e: Exception => if (strict) throw e }
  }
}
