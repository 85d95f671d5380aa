package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The growing-index property of x_stream_curation — the one thing the
  * static-index streaming twin cannot show: a batch-2 document whose
  * duplicate was only ADMITTED in batch 1 must be rejected by the index
  * as it stood AFTER batch 1's append.
  */
class StreamCurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("batch 2 rejects resends of batch-1 admissions (index grew)") {
    val log = StreamOps.xStreamCuration.build(spark, sf)
      .orderBy("batch").collect()
    assert(log.length == 2)
    val Array(b1, b2) = log
    def f(r: org.apache.spark.sql.Row, c: String) =
      r.getLong(r.fieldIndex(c))
    // batch 1 has no resends: nothing to index-reject beyond standing
    // collisions; batch 2 carries the resend of every 10th batch-1 doc,
    // and each resend whose original was ADMITTED must be index-rejected
    assert(f(b2, "n_index_rej") >= 1,
      s"no cross-batch rejection: ${log.mkString(", ")}")
    // the index only ever grows, by exactly the admitted count
    assert(f(b2, "index_size") == f(b1, "index_size") + f(b2, "n_admitted"))
    // full accounting: every seen doc got exactly one verdict
    Seq(b1, b2).foreach { r =>
      assert(f(r, "n_seen") == f(r, "n_quality_rej") + f(r, "n_within_dup") +
        f(r, "n_index_rej") + f(r, "n_admitted"))
    }
  }
}
