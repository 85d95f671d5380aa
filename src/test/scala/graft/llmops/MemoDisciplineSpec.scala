package graft.llmops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The session-keyed memo discipline (VectorSearch.embeddingsBase,
  * MinHashLSH.wordSetsBase, SetSim.orderedBase, and friends): each LIVE
  * session gets its own cached base keyed by (identityHashCode(session),
  * dir) with an `eq` check on serve, so a session churn (new session,
  * same JVM — the restart shape test suites and notebook reconnects
  * produce) can never be served a frame bound to a different session.
  * The stopped-session sweep itself needs a stopped SparkContext, which
  * a shared-context suite cannot produce safely; its logic is the
  * filterInPlace + eq-check pair this spec pins from the live side.
  */
class MemoDisciplineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("shared bases are memoized per session and never served across sessions") {
    val a = spark.newSession()
    val b = spark.newSession()

    val ea1 = VectorSearch.embeddingsBase(a, sf)
    val ea2 = VectorSearch.embeddingsBase(a, sf)
    assert(ea1 eq ea2, "second lookup on the same session must be a memo hit")
    val eb = VectorSearch.embeddingsBase(b, sf)
    assert(!(eb eq ea1), "a fresh session must get its own base")
    assert((ea1.sparkSession eq a) && (eb.sparkSession eq b),
      "served frame bound to the wrong session")

    val wa = MinHashLSH.wordSetsBase(a, sf)
    val wb = MinHashLSH.wordSetsBase(b, sf)
    assert(!(wa eq wb) && (wa.sparkSession eq a) && (wb.sparkSession eq b))

    val oa = SetSim.orderedBase(a, sf)
    val ob = SetSim.orderedBase(b, sf)
    assert(!(oa eq ob) && (oa.sparkSession eq a) && (ob.sparkSession eq b))

    val (cba, codesA) = VectorSearch.pqIndex(a, sf)
    val (cbb, codesB) = VectorSearch.pqIndex(b, sf)
    assert(!(codesA eq codesB) &&
      (cba.sparkSession eq a) && (cbb.sparkSession eq b))
    assert(VectorSearch.pqIndex(a, sf)._2 eq codesA, "second lookup must memo-hit")

    // populating B's generation must not unpersist A's (the CacheBin
    // keys are session-scoped): A's base is still marked for caching
    assert(ea1.storageLevel.useMemory,
      "session A's cached base was unpersisted by session B's population")
    // and both compute the same corpus
    assert(ea1.count() == eb.count())
  }
}
