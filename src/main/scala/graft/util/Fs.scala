package graft.util

/** Small shared filesystem helpers (one copy — Bench's tmpfs sweep and the
  * streaming compactor previously carried divergent private clones). */
object Fs {

  /** depth-first recursive delete. listFiles-based instead of Files.walk:
    * the walk stream holds open directory handles and throws
    * UncheckedIOException if an entry vanishes mid-traversal, while
    * listFiles snapshots each level and File.delete tolerates absence.
    * Never recurses through a symlink: the link itself is deleted, not its
    * target's contents (listFiles follows links, unlike Files.walk). */
  def deleteRecursively(f: java.io.File): Unit = {
    if (!java.nio.file.Files.isSymbolicLink(f.toPath))
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }
}
