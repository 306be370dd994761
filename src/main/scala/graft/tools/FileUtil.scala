package graft.tools

import java.nio.file.{Files, Path}

/** Local-filesystem helpers shared by artifact-cleanup paths (the
  * DedupQ shutdown hook, stress-harness corpus teardown). */
object FileUtil {

  /** Recursive delete, deepest-first. `strict = false` (cleanup mode)
    * swallows per-path failures — a concurrently-removed entry is
    * fine — and treats an unwalkable/absent root as a no-op;
    * `strict = true` propagates any failure (for callers where the
    * deletion IS the assertion, e.g. ScaleStress's deleted-corpus
    * proof). */
  def deleteTree(root: Path, strict: Boolean = false): Unit = {
    if (!Files.exists(root)) return
    val walk =
      try Files.walk(root)
      catch { case e: java.io.IOException => if (strict) throw e else return }
    try walk.sorted(java.util.Comparator.reverseOrder()).forEach { p =>
      try { Files.deleteIfExists(p); () }
      catch { case e: java.io.IOException => if (strict) throw e }
    } finally walk.close()
  }
}
