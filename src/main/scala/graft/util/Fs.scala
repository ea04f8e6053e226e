package graft.util

import java.io.File

/** Local-filesystem helpers for fixture-building queries (the
  * partitioned-write / compaction / streaming-recovery gates inspect
  * their own output directories). `listFiles` returns null on
  * unreadable/non-existent dirs — both helpers guard it.
  */
object Fs {
  def rmRecursive(f: File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(rmRecursive)
    f.delete(): Unit
  }

  /** All regular files under `dir` (recursive). */
  def walkFiles(dir: File): Seq[File] = {
    val children = dir.listFiles()
    if (dir.isFile) Seq(dir)
    else if (children == null) Seq.empty
    else children.toSeq.flatMap(walkFiles)
  }
}
