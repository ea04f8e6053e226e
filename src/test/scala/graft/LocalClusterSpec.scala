package graft

import org.scalatest.Tag
import org.scalatest.funsuite.AnyFunSuite

/** Opt-in marker for tests that fork real executor JVMs and
  * stop/start SparkContexts — incompatible with the shared-session
  * test JVM, so build.sbt excludes the tag from the default `sbt
  * test` run. Opt in with:
  *
  *   sbt 'set Test / testOptions := Seq()' "testOnly graft.LocalClusterSpec"
  */
object ClusterTest extends Tag("graft.ClusterTest")

/** Repeatable spec form of [[LocalClusterSmoke]] (round-11 verdict
  * asked for exactly this promotion): the multi-executor deployment
  * proof as tagged tests instead of a one-off main. Uses its OWN
  * `local-cluster[2,2,2048]` sessions — two real executor JVMs, real
  * wire serialization — never [[TestSpark]]'s shared local[4] one.
  */
class LocalClusterSpec extends AnyFunSuite {

  private val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
    "/root/testdata/sf0.001")

  test("m6 CV pipeline + shuffle-heavy agg run on two real executor JVMs",
      ClusterTest) {
    val spark = LocalClusterSmoke.newClusterSession()
    try {
      assert(LocalClusterSmoke.pipelineCheck(spark, sfDir) > 0)
    } finally {
      spark.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
    }
  }

  test("VectorIndex store built by one cluster session is searchable " +
      "from a fresh session (no hidden driver locality)", ClusterTest) {
    val (nStored, recall) = LocalClusterSmoke.storedIndexRoundTrip(sfDir)
    assert(nStored > 0)
    assert(recall >= 0.6, s"cross-session stored-index recall $recall")
  }

  test("GraphAnn store built by one cluster session beam-searches from " +
      "a fresh session without rebuild", ClusterTest) {
    val (nNodes, recall) = LocalClusterSmoke.storedGraphRoundTrip(sfDir)
    assert(nNodes > 0)
    assert(recall >= 0.6, s"cross-session stored-graph recall $recall")
  }

  test("filtered (label, cell) store built by one cluster session " +
      "pre-filter-searches from a fresh session without rebuild",
      ClusterTest) {
    val (nStored, recall) = LocalClusterSmoke.storedFilteredRoundTrip(sfDir)
    assert(nStored > 0)
    assert(recall >= 0.6, s"cross-session filtered-store recall $recall")
  }

  test("dedup signature store built by one cluster session probes from " +
      "a fresh session without rebuild: re-crawls drop, new docs survive",
      ClusterTest) {
    val (nStored, accuracy) = LocalClusterSmoke.storedDedupRoundTrip(sfDir)
    assert(nStored > 0)
    assert(accuracy == 1.0, s"cross-session dedup probe accuracy $accuracy")
  }

  test("text posting store built by one cluster session searches from " +
      "a fresh session without rebuild, identical to the storeless " +
      "scorer", ClusterTest) {
    val (nPostings, agree) = LocalClusterSmoke.storedTextRoundTrip(sfDir)
    assert(nPostings > 0)
    assert(agree == 1.0, "cross-session store search diverged")
  }

  test("two cluster sessions contend for a store's writer lease through " +
      "the conditional-put reference primitive: the rival blocks the " +
      "append LOUD, break() recovers", ClusterTest) {
    val (blocked, appended) = LocalClusterSmoke.leaseContentionRoundTrip(sfDir)
    assert(blocked,
      "session B's append did not fail loud naming the rival holder")
    assert(appended, "append after break() did not land")
  }
}
