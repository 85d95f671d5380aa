package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Independent single-threaded reference trainer: same semantics
    * (word-histogram BPE, ties on count desc then pair asc, stop at
    * count <= 1), written against plain Scala collections.
    */
  private def refTrain(texts: Seq[String], n: Int): Seq[(String, String)] = {
    var hist: Map[List[String], Long] = texts
      .flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) =>
        w.map(_.toString).toList -> ws.size.toLong
      }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    for (_ <- 1 to n) {
      val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      hist.foreach { case (toks, c) =>
        toks.zip(toks.tail).foreach { p =>
          pairs.update(p, pairs.getOrElse(p, 0L) + c)
        }
      }
      if (pairs.nonEmpty) {
        val (best, c) = pairs.toSeq.minBy { case ((a, b), cnt) => (-cnt, a, b) }
        if (c > 1) {
          merges += best
          hist = hist.groupMapReduce {
            case (toks, _) => Bpe.mergeOnce(toks, best._1, best._2)
          }(_._2)(_ + _)
        }
      }
    }
    merges.toSeq
  }

  test("mergeOnce fuses every non-overlapping adjacent pair left-to-right") {
    assert(Bpe.mergeOnce(List("a", "a", "a"), "a", "a") == List("aa", "a"))
    assert(Bpe.mergeOnce(List("a", "b", "a", "b"), "a", "b") == List("ab", "ab"))
    assert(Bpe.mergeOnce(List("x"), "a", "b") == List("x"))
    assert(Bpe.mergeOnce(Nil, "a", "b") == Nil)
  }

  test("mergeOnce survives a very long token run (stack safety)") {
    val long = List.fill(200000)("a")
    assert(Bpe.mergeOnce(long, "a", "a").length == 100000)
  }

  test("distributed trainer matches the independent reference on a tiny corpus") {
    val texts = Seq(
      "low low low low low lower lower newest newest newest",
      "newest newest newest widest widest widest low")
    val df = texts.toDF("text")
    val got = Bpe.trainMerges(df, "text", 8)
    val want = refTrain(texts, 8)
    assert(got == want, s"got $got want $want")
    // the classic example learns frequent subword units
    assert(got.nonEmpty && got.length >= 4)
  }

  test("local tie-break orders strings by UTF-8 bytes like Spark orderBy") {
    val emoji = "😀" // U+1F600, UTF-8 F0 9F 98 80
    val lig = "ﬀ"         // U+FB00,  UTF-8 EF AC 80
    // UTF-16 code-unit order says emoji < lig; UTF-8 byte order (what a
    // Spark string orderBy uses) says the opposite — the local path must
    // follow Spark or the two trainers diverge on non-BMP ties
    assert(emoji.compareTo(lig) < 0)
    assert(Bpe.utf8Order.compare(emoji, lig) > 0)
    // agreement with Spark's actual sort on the same pair
    val sorted = Seq(emoji, lig).toDF("s").orderBy("s")
      .as[String].collect().toSeq
    assert(sorted == Seq(emoji, lig).sorted(Bpe.utf8Order))
  }

  test("forced-distributed trainer learns the same merges as the local path") {
    val texts = Seq(
      "low low low low low lower lower newest newest newest",
      "newest newest newest widest widest widest low")
    val df = texts.toDF("text")
    // driverHistMax = 0 forces the distributed aggregation loop
    val dist = Bpe.trainMerges(df, "text", 8, driverHistMax = 0)
    val local = Bpe.trainMerges(df, "text", 8)
    assert(dist == local && local == refTrain(texts, 8))
  }

  test("distributed trainer matches the reference on fixture docs") {
    val texts = graft.core.Tables(spark, sf, "documents")
      .select("text").as[String].collect().toSeq
    val got = Bpe.trainMerges(
      graft.core.Tables(spark, sf, "documents"), "text", 10)
    assert(got == refTrain(texts, 10))
  }

  test("x_bpe_tokenize invariants hold on every fixture doc") {
    val rows = Bpe.xBpeTokenize.build(spark, sf)
      .as[(Long, Long, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, nWords, reconstructs, le) =>
      assert(reconstructs, s"doc $id failed reconstruction")
      assert(le, s"doc $id token count exceeds char count")
      assert(nWords > 0)
    }
    // merges actually compress: applying them to a known word shrinks it
    val merges = Bpe.trainMerges(
      graft.core.Tables(spark, sf, "documents"), "text", 24)
    val sample = graft.core.Tables(spark, sf, "documents")
      .select("text").as[String].head().split(" ").filter(_.length > 3).head
    assert(Bpe.applyMerges(sample, merges).length < sample.length)
  }
}
