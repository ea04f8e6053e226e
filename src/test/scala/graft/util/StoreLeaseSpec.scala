package graft.util

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class StoreLeaseSpec extends SparkSpec {

  private val base = Fixtures.dir + "/spec_store_lease"

  private def emb(rows: Range): DataFrame = {
    import spark.implicits._
    rows.map(i => (i.toLong, Array.tabulate(16)(j =>
      ((i * 31 + j * 7) % 100) / 100.0f))).toDF("vec_id", "embedding")
  }

  test("acquire is first-wins under a genuine N-thread race") {
    Fs.rmRecursive(new java.io.File(base))
    val dir = s"$base/race"
    Fs.mkdirs(spark, dir)
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val n = 8
    val start = new CountDownLatch(1)
    val done = new CountDownLatch(n)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = Executors.newFixedThreadPool(n)
    (0 until n).foreach { i =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try {
            StoreLease.acquire(spark, dir, s"racer-$i")
            wins.incrementAndGet(): Unit
          } catch { case _: IllegalStateException => () }
          finally done.countDown()
        }
      }): Unit
    }
    start.countDown()
    assert(done.await(30, TimeUnit.SECONDS), "racers did not finish")
    pool.shutdown()
    assert(wins.get() == 1, s"${wins.get()} racers acquired the lease")
    assert(StoreLease.heldBy(spark, dir).isDefined)
    StoreLease.release(spark, dir)
    assert(StoreLease.heldBy(spark, dir).isEmpty)
  }

  test("release is idempotent; break clears a dead holder's lease; " +
      "the fail-loud message names the holder") {
    Fs.rmRecursive(new java.io.File(base))
    val dir = s"$base/ops"
    Fs.mkdirs(spark, dir)
    StoreLease.release(spark, dir) // nothing held — no-op
    StoreLease.acquire(spark, dir, "first-writer")
    val e = intercept[IllegalStateException] {
      StoreLease.acquire(spark, dir, "second-writer")
    }
    assert(e.getMessage.contains("first-writer"),
      s"holder not named in: ${e.getMessage}")
    assert(StoreLease.heldBy(spark, dir).exists(_.contains("first-writer")))
    StoreLease.break(spark, dir) // operator-confirmed dead holder
    StoreLease.acquire(spark, dir, "after-break")
    StoreLease.release(spark, dir)
  }

  test("the owner line is written atomically with the lock: a reader " +
      "immediately after acquire never sees an empty holder") {
    Fs.rmRecursive(new java.io.File(base))
    val dir = s"$base/atomic"
    Fs.mkdirs(spark, dir)
    StoreLease.acquire(spark, dir, "atomic-writer")
    val held = StoreLease.heldBy(spark, dir)
    assert(held.exists(h => h.contains("pid=") && h.contains("atomic-writer")),
      s"holder line missing or empty: $held")
    StoreLease.release(spark, dir)
  }

  test("non-atomic scheme guard: warns by default, fails hard under " +
      "-Dgraft.lease.requireAtomic=true, and tracks the primitive's " +
      "own declaration (simulated non-atomic filesystem)") {
    // the default primitive declares plain object-store schemes
    // non-atomic: loud-warn path must not throw
    StoreLease.requireAtomicCreate("s3a")
    // flag-gated hard failure
    val prev = sys.props.put("graft.lease.requireAtomic", "true")
    try {
      val e = intercept[IllegalStateException] {
        StoreLease.requireAtomicCreate("s3a")
      }
      assert(e.getMessage.contains("conditional-put"),
        s"remedy not named in: ${e.getMessage}")
      // a SIMULATED non-atomic local filesystem: a primitive that
      // declares file: non-atomic makes every acquire on file: fail
      // while the flag is up — the guard follows the primitive, not a
      // hardcoded list
      val old = StoreLease.setPrimitive(new LockPrimitive {
        def tryCreate(fs: org.apache.hadoop.fs.FileSystem,
            p: org.apache.hadoop.fs.Path, owner: String): Boolean =
          HadoopAtomicCreate.tryCreate(fs, p, owner)
        val nonAtomicSchemes: Set[String] = Set("file")
      })
      try {
        Fs.rmRecursive(new java.io.File(base))
        val dir = s"$base/nonatomic"
        Fs.mkdirs(spark, dir)
        intercept[IllegalStateException] {
          StoreLease.acquire(spark, dir, "doomed-writer")
        }
        assert(StoreLease.heldBy(spark, dir).isEmpty,
          "guard failure must not leave a lock behind")
      } finally StoreLease.setPrimitive(old): Unit
    } finally {
      prev match {
        case Some(v) => sys.props.put("graft.lease.requireAtomic", v): Unit
        case None => sys.props.remove("graft.lease.requireAtomic"): Unit
      }
    }
  }

  test("a plugged conditional-put primitive is the acquisition path " +
      "and an atomic one silences the scheme guard") {
    Fs.rmRecursive(new java.io.File(base))
    val dir = s"$base/plugged"
    Fs.mkdirs(spark, dir)
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val old = StoreLease.setPrimitive(new LockPrimitive {
      def tryCreate(fs: org.apache.hadoop.fs.FileSystem,
          p: org.apache.hadoop.fs.Path, owner: String): Boolean = {
        calls.incrementAndGet(): Unit
        HadoopAtomicCreate.tryCreate(fs, p, owner)
      }
      val nonAtomicSchemes: Set[String] = Set.empty // conditional-put
    })
    try {
      // an atomic primitive silences the guard even under the flag
      val prev = sys.props.put("graft.lease.requireAtomic", "true")
      try StoreLease.requireAtomicCreate("s3a")
      finally {
        prev match {
          case Some(v) => sys.props.put("graft.lease.requireAtomic", v): Unit
          case None => sys.props.remove("graft.lease.requireAtomic"): Unit
        }
      }
      StoreLease.acquire(spark, dir, "plugged-writer")
      assert(calls.get() == 1, s"primitive called ${calls.get()} times")
      intercept[IllegalStateException] {
        StoreLease.acquire(spark, dir, "second-writer")
      }
      assert(calls.get() == 2)
      StoreLease.release(spark, dir)
    } finally StoreLease.setPrimitive(old): Unit
  }

  test("HardLinkConditionalPut: first-wins under an N-thread race, " +
      "the loser reads the winner's full owner line, and a non-file " +
      "scheme fails loud instead of downgrading") {
    Fs.rmRecursive(new java.io.File(base))
    val dir = s"$base/hardlink"
    Fs.mkdirs(spark, dir)
    val old = StoreLease.setPrimitive(HardLinkConditionalPut)
    try {
      // the conditional-put primitive declares atomic everywhere it
      // runs: the scheme guard stays silent even under the hard flag
      val prev = sys.props.put("graft.lease.requireAtomic", "true")
      try StoreLease.requireAtomicCreate("s3a")
      finally prev match {
        case Some(v) => sys.props.put("graft.lease.requireAtomic", v): Unit
        case None => sys.props.remove("graft.lease.requireAtomic"): Unit
      }
      import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
      val n = 8
      val start = new CountDownLatch(1)
      val done = new CountDownLatch(n)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val pool = Executors.newFixedThreadPool(n)
      (0 until n).foreach { i =>
        pool.submit(new Runnable {
          def run(): Unit = {
            start.await()
            try {
              StoreLease.acquire(spark, dir, s"cput-racer-$i")
              wins.incrementAndGet(): Unit
            } catch { case _: IllegalStateException => () }
            finally done.countDown()
          }
        }): Unit
      }
      start.countDown()
      assert(done.await(30, TimeUnit.SECONDS), "racers did not finish")
      pool.shutdown()
      assert(wins.get() == 1, s"${wins.get()} racers acquired the lease")
      // the loser observes the winner's complete owner line — the
      // stage-then-publish order means no empty-holder window exists
      val holder = StoreLease.heldBy(spark, dir).get
      assert(holder.contains("op=cput-racer-") && holder.contains("pid="),
        s"owner line incomplete: $holder")
      // no staged temp keys left behind
      val leftovers = new java.io.File(base).listFiles()
        .filter(_.getName.contains(".tmp"))
      assert(leftovers.isEmpty,
        s"staged keys leaked: ${leftovers.map(_.getName).mkString(",")}")
      StoreLease.release(spark, dir)
      // a second acquire-release cycle works after contention
      StoreLease.acquire(spark, dir, "after-race")
      StoreLease.release(spark, dir)
      // non-file scheme: loud refusal, not silent check-then-put
      val fakeFs = new org.apache.hadoop.fs.RawLocalFileSystem {
        override def getScheme: String = "s3a"
      }
      fakeFs.initialize(java.net.URI.create("file:///"),
        spark.sessionState.newHadoopConf())
      intercept[UnsupportedOperationException] {
        HardLinkConditionalPut.tryCreate(fakeFs,
          new org.apache.hadoop.fs.Path(s"$dir.__lock2"), "x")
      }
    } finally StoreLease.setPrimitive(old): Unit
  }

  test("vector store: a held lease makes append/delete/compactFiles " +
      "fail LOUD and search stays lock-free") {
    Fs.rmRecursive(new java.io.File(base))
    val dir = s"$base/vector"
    val corpus = emb(0 until 64)
    graft.llm.VectorIndex.build(corpus, dir)
    StoreLease.acquire(spark, dir, "in-flight-append")
    intercept[IllegalStateException] {
      graft.llm.VectorIndex.append(emb(64 until 80), dir)
    }
    intercept[IllegalStateException] {
      graft.llm.VectorIndex.delete(emb(0 until 4), dir)
    }
    intercept[IllegalStateException] {
      graft.llm.VectorIndex.compactFiles(spark, dir)
    }
    // reads don't take the lease
    val ix = graft.llm.VectorIndex.load(spark, dir)
    assert(graft.llm.VectorIndex.search(ix, emb(0 until 2), corpus, k = 1)
      .count() == 2)
    StoreLease.release(spark, dir)
    graft.llm.VectorIndex.append(emb(64 until 80), dir)
    // the incremental fingerprint is intact after the serialized append
    val b0 = graft.llm.VectorIndex.buildsThisProcess
    graft.llm.VectorIndex.ensure(emb(0 until 80), dir): Unit
    assert(graft.llm.VectorIndex.buildsThisProcess == b0,
      "serialized append drifted the fingerprint")
  }

  test("graph store: a held lease makes append/delete fail LOUD") {
    Fs.rmRecursive(new java.io.File(base))
    val dir = s"$base/graph"
    val corpus = emb(0 until 64).localCheckpoint(true)
    graft.llm.GraphAnn.ensure(corpus, dir): Unit
    StoreLease.acquire(spark, dir, "in-flight-append")
    intercept[IllegalStateException] {
      graft.llm.GraphAnn.append(emb(100 until 108), corpus, dir)
    }
    intercept[IllegalStateException] {
      graft.llm.GraphAnn.delete(emb(0 until 4), dir)
    }
    // beam search (read) unaffected
    val g = graft.llm.GraphAnn.load(spark, dir)
    assert(graft.llm.GraphAnn.beamSearch(emb(0 until 2), g, corpus, k = 1)
      .count() > 0)
    StoreLease.release(spark, dir)
    graft.llm.GraphAnn.append(emb(100 until 108), corpus, dir)
  }
}
