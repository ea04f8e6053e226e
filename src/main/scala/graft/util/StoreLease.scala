package graft.util

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.Path

/** Single-WRITER lease for the persisted index stores
  * ([[graft.llm.DedupIndex]], [[graft.llm.VectorIndex]],
  * [[graft.llm.GraphAnn]]) — the concurrency guard the r14 verdict
  * flagged as missing. [[IngestMarker]] makes a *crashed* append loud,
  * but two *live* concurrent appends both pass `requireAbsent` and
  * interleave their data/meta writes: last meta wins, the XOR
  * fingerprint drifts silently, and the fail-loud contract the st17
  * streaming ingest is built on silently breaks. A real ingest loop
  * hits this with scheduler overlap or retry storms.
  *
  * Shape: an exclusive lock FILE at `<dir>.__lock` — a SIBLING of the
  * store directory, deliberately outside it so a rebuild's
  * delete-and-recreate of the store can never delete the holder's own
  * lock mid-build (which would re-open the two-writer window it
  * exists to close). Acquisition is try-once/fail-loud, not queued:
  * an ingest loop's scheduler owns retry policy, and a silent wait
  * here would just hide the overlap the lease exists to surface.
  *
  * Atomicity: on `file:` the lock is created with POSIX
  * O_CREAT|O_EXCL (`File.createNewFile`); on HDFS,
  * `FileSystem.create(p, overwrite = false)` is an atomic
  * namespace operation. Object stores without atomic
  * create-if-absent (plain S3) would need their conditional-put
  * primitive; the Hadoop-API fallback is best-effort there — the
  * same caveat the stage-and-swap rename already documents.
  *
  * Crash recovery: a holder that dies leaves the lock file. Every
  * later mutating op fails LOUD naming the dead holder (pid, op,
  * acquire time); the operator confirms no writer is live and calls
  * [[break]], then `ensure()` — which also heals any half-written
  * state via the [[IngestMarker]]/fingerprint path. The lease is
  * deliberately NOT auto-stolen on age: an expiry would let a slow
  * live writer (a straggling 100 TB append) be silently overlapped,
  * which is exactly the corruption this guards against.
  */
object StoreLease {

  private def lockPath(dir: String): Path = {
    val d = if (dir.endsWith("/")) dir.dropRight(1) else dir
    new Path(d + ".__lock")
  }

  /** Run `body` holding the store's writer lease; always released —
    * on failure the store's own guards ([[IngestMarker]], staging
    * recovery) own state safety, the lease only serializes writers. */
  def withLease[T](spark: SparkSession, dir: String, op: String)(
      body: => T): T = {
    acquire(spark, dir, op)
    try body finally release(spark, dir)
  }

  /** Acquire the exclusive writer lease or fail LOUD naming the
    * current holder. Never waits, never steals. */
  def acquire(spark: SparkSession, dir: String, op: String): Unit = {
    val p = lockPath(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (p.getParent != null) fs.mkdirs(p.getParent): Unit
    val owner = s"pid=${ProcessHandle.current().pid()} " +
      s"thread=${Thread.currentThread().getName} op=$op " +
      s"acquired_ms=${System.currentTimeMillis()}"
    val acquired =
      if (fs.getScheme == "file") {
        val f = new java.io.File(p.toUri.getPath)
        val created = f.createNewFile() // O_CREAT|O_EXCL — atomic
        if (created)
          java.nio.file.Files.writeString(f.toPath, owner): Unit
        created
      } else {
        try {
          val out = fs.create(p, false) // atomic namespace op on HDFS
          out.write(owner.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          out.close()
          true
        } catch { case _: java.io.IOException => false }
      }
    if (!acquired) {
      val holder = try {
        val in = fs.open(p)
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      } catch { case scala.util.control.NonFatal(_) => "unreadable" }
      throw new IllegalStateException(
        s"store at $dir is write-locked by another writer [$holder] — " +
          s"mutating ops are single-writer and $op refuses to interleave " +
          "(concurrent appends silently drift the meta fingerprint). " +
          "Retry after the holder finishes; if the holder is DEAD, " +
          "confirm no writer is live, then StoreLease.break() and " +
          "recover via ensure().")
    }
  }

  /** Release the lease (idempotent — a missing lock is a no-op). */
  def release(spark: SparkSession, dir: String): Unit = {
    val p = lockPath(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(p, false): Unit
  }

  /** Operator-confirmed forced release of a DEAD holder's lease —
    * the documented manual recovery step, separate from [[release]]
    * so call sites read as what they are. */
  def break(spark: SparkSession, dir: String): Unit =
    release(spark, dir)

  /** The current holder's info line, if the store is locked. */
  def heldBy(spark: SparkSession, dir: String): Option[String] = {
    val p = lockPath(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else Some(try {
      val in = fs.open(p)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    } catch { case scala.util.control.NonFatal(_) => "unreadable" })
  }
}
