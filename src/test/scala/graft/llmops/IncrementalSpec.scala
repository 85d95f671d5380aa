package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Fixture-level checks for the incremental/cross-set dedup family —
  * the sf0.001 oracle run covers the declared queries end-to-end; these
  * tests pin the SEMANTICS on planted data where the expected answer is
  * known by construction.
  */
class IncrementalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def doc(n: Int, salt: String) =
    (0 until 40).map(i => s"w$salt${i * 7 % 31}").mkString(" ")

  test("bloom prefilter dedup: exact-dup batch rows dropped, new rows kept, " +
      "false positives never drop a non-dup") {
    // corpus: ids 0-3; batch: 4 = exact dup of 0, 5-6 new
    val rows = Seq(
      (0L, doc(0, "a")), (1L, doc(1, "b")), (2L, doc(2, "c")), (3L, doc(3, "d")),
      (4L, doc(0, "a")), // exact dup of corpus doc 0
      (5L, doc(5, "x")), (6L, doc(6, "y")))
    val docs = rows.toDF("doc_id", "text")
    val cut = 4L
    val corpus = docs.filter(col("doc_id") < cut)
      .withColumn("h", xxhash64(col("text")))
    val batch = docs.filter(col("doc_id") >= cut)
      .withColumn("h", xxhash64(col("text")))
    val bloom = corpus
      .agg(graft.functions.Bloom.bloomAgg(col("h"), 1000L, 1L << 20).as("bf"))
    val probed = batch
      .withColumn("maybe", graft.functions.Bloom.mightContain(bloom, col("h")))
    // the planted dup MUST be bloom-positive (no false negatives)
    assert(probed.filter(col("doc_id") === 4 && col("maybe")).count() == 1)
    val negatives = probed.filter(!col("maybe")).select("doc_id")
    val positives = probed.filter(col("maybe"))
      .join(corpus.select("text"), Seq("text"), "left_anti")
      .select("doc_id")
    val survivors = negatives.union(positives).as[Long].collect().toSet
    assert(survivors == Set(5L, 6L))
  }

  test("bloom prefilter with an EMPTY corpus keeps every batch row " +
      "(null sketch must not eat the stream)") {
    val batch = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .withColumn("h", xxhash64(col("text")))
    val empty = batch.filter(col("doc_id") < 0) // zero corpus rows
    val bloom = empty
      .agg(graft.functions.Bloom.bloomAgg(col("h"), 1000L, 1L << 20).as("bf"))
    val probed = batch
      .withColumn("maybe", coalesce(
        graft.functions.Bloom.mightContain(bloom, col("h")), lit(false)))
    assert(probed.filter(!col("maybe")).count() == 2,
      "empty corpus -> every row is definitely new")
  }

  test("components accepts integer ids and rejects non-integral ones") {
    val intEdges = Seq((1, 2), (2, 3)).toDF("a_id", "b_id") // IntegerType
    val got = DedupFamilies.components(intEdges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    val strEdges = Seq(("a", "b")).toDF("a_id", "b_id")
    val e = intercept[IllegalArgumentException] {
      DedupFamilies.components(strEdges)
    }
    assert(e.getMessage.contains("must be integral"))
  }

  test("incremental near-dup finds exactly the cross-watermark pairs") {
    // 0 and 2 are near-dups; 1 is unrelated; watermark puts 2 in the batch
    val base = doc(0, "z").split(" ")
    val near = base.clone(); near(3) = "EDITED"
    val docs = Seq(
      (0L, base.mkString(" ")), (1L, doc(1, "q")),
      (2L, near.mkString(" ")), (3L, doc(3, "r")))
      .toDF("doc_id", "text")
    val cut = 2L
    val sets = MinHashLSH.hashSets(Shingles.wordShingles(docs, 3)).cache()
    val bands = MinHashLSH.bandKeys(MinHashLSH.signaturesFromSets(sets))
    val index = bands.filter(col("doc_id") < cut)
      .select(col("band"), col("bh"), col("doc_id").as("a_id"))
    val incoming = bands.filter(col("doc_id") >= cut)
      .select(col("band"), col("bh"), col("doc_id").as("b_id"))
    val cand = index.join(incoming, Seq("band", "bh"))
      .select("a_id", "b_id").distinct()
    val pairs = MinHashLSH.exactJaccardFromSets(cand, sets)
      .filter(col("jaccard") >= MinHashLSH.TAU)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 2L)))
    sets.unpersist()
  }

  test("mix sample keeps a whole group whose count fits its budget " +
      "(keep fraction 1.0 -> five-hex-digit threshold)") {
    // 10 'xx' docs with weight 1.0 and budget 200 -> keep = 1.0 -> the
    // threshold is 0x10000 (five hex digits); the pre-fix 4-wide lpad
    // TRUNCATED it to "1000" and silently dropped ~94% of the group
    val docs = (0 until 10).map(i => (i.toLong, "xx")).toDF("doc_id", "lang")
    val kept = Curation.mixSample(docs, "doc_id", "lang",
      Map("xx" -> 1.0), budget = 200.0)
    assert(kept.count() == 10, "a group under its budget must be kept whole")
    // and a fractional keep still selects a strict, deterministic subset
    val many = (0 until 2000).map(i => (i.toLong, "yy")).toDF("doc_id", "lang")
    val frac = Curation.mixSample(many, "doc_id", "lang",
      Map("yy" -> 0.5), budget = 200.0)
    val n1 = frac.count()
    assert(n1 > 0 && n1 < 2000)
    assert(Curation.mixSample(many, "doc_id", "lang",
      Map("yy" -> 0.5), budget = 200.0).count() == n1) // reproducible
  }

  test("native shingle-hash sets are bit-identical to the exploded path") {
    // real corpus text (incl. multi-byte zh chars for the char variant)
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    for (k <- Seq(3, 8)) {
      val exploded = MinHashLSH.hashSets(Shingles.wordShingles(docs, k))
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
        .sortBy(_._1)
      val native = MinHashLSH.wordSets(docs, k)
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
        .sortBy(_._1)
      assert(native.length == exploded.length, s"k=$k row counts differ")
      native.zip(exploded).foreach { case (n, e) =>
        assert(n == e, s"k=$k doc ${n._1} differs from exploded path")
      }
    }
    // char variant vs the SQL substring spelling used by x_char_ngram
    val charExploded = MinHashLSH.hashSets(
      docs.filter(length(col("text")) >= 5)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, length(text)-4), i -> substring(text, i, 5))"
        )).as("sh")))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
      .sortBy(_._1)
    val charNative = MinHashLSH.charSets(docs, 5)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
      .sortBy(_._1)
    assert(charNative.length == charExploded.length)
    charNative.zip(charExploded).foreach { case (n, e) =>
      assert(n == e, s"char doc ${n._1} differs from exploded path")
    }
    // edge cases: fewer than k words / empty / consecutive-space texts
    val edge = Seq((1L, "one two"), (2L, ""), (3L, "a  b c"), (4L, "x y z"))
      .toDF("doc_id", "text")
    val edgeNative = MinHashLSH.wordSets(edge, 3)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    val edgeExploded = MinHashLSH.hashSets(Shingles.wordShingles(edge, 3))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    assert(edgeNative == edgeExploded)
    assert(edgeNative.keySet == Set(3L, 4L)) // <3 words drop out
  }

  test("hot-bucket cap bounds pair generation and surfaces excluded buckets") {
    // 60 near-identical docs (one distinct token each) — every band
    // bucket holds all 60, so uncapped candidates are 60*59/2 = 1770
    // pairs from a single templated family; two unrelated docs ride along
    val family = (0 until 60).map { i =>
      val w = doc(0, "t").split(" "); w(0) = s"uniq$i"
      (i.toLong, w.mkString(" "))
    }
    val docs = (family ++ Seq((100L, doc(1, "u")), (101L, doc(2, "v"))))
      .toDF("doc_id", "text")
    val sets = MinHashLSH.hashSets(Shingles.wordShingles(docs, 3)).cache()
    val bands = MinHashLSH.bandKeys(MinHashLSH.signaturesFromSets(sets))
    val uncapped = MinHashLSH.candidates(bands).count()
    assert(uncapped >= 1770, s"family should explode uncapped, got $uncapped")
    val capped = MinHashLSH.cappedCandidates(bands, maxBucket = 10).count()
    assert(capped == 0, s"all family buckets exceed the cap, got $capped")
    val oversized = MinHashLSH.oversizedBuckets(bands, 10)
      .collect()
    // one-token edits perturb some band signatures, so buckets hold most
    // (not all) of the 60-doc family
    assert(oversized.nonEmpty && oversized.forall(_.getLong(2) >= 40))
    // a cap above the bucket size changes nothing
    assert(MinHashLSH.cappedCandidates(bands, 100).count() == uncapped)
    sets.unpersist()
  }

  test("split leakage: only pairs straddling the split are reported") {
    // two near-dup families: {0,1} same side, {2,3} straddling
    val a = doc(0, "m").split(" "); val a2 = a.clone(); a2(5) = "EDIT1"
    val b = doc(0, "n").split(" "); val b2 = b.clone(); b2(7) = "EDIT2"
    val docs = Seq(
      (10L, a.mkString(" ")), (11L, a2.mkString(" ")),
      (20L, b.mkString(" ")), (21L, b2.mkString(" ")))
      .toDF("doc_id", "text")
    // deterministic split fixture: ids 10, 11, 21 train; 20 holdout
    val holdout = col("doc_id") === 20L
    val sets = MinHashLSH.hashSets(Shingles.wordShingles(docs, 3)).cache()
    val bands = MinHashLSH.bandKeys(MinHashLSH.signaturesFromSets(sets))
      .withColumn("holdout", holdout)
    val cand = bands.as("x").join(bands.as("y"), Seq("band", "bh"))
      .filter(col("x.doc_id") < col("y.doc_id") &&
        col("x.holdout") =!= col("y.holdout"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    val leaks = MinHashLSH.exactJaccardFromSets(cand, sets)
      .filter(col("jaccard") >= MinHashLSH.TAU)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(leaks == Set((20L, 21L)))
    sets.unpersist()
  }
}
