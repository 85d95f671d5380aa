package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class WordPieceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Independent reference segmenter: a RECURSIVE spelling of greedy
    * longest-match-first (the shipped one is an iterative while-walk) —
    * agreement pins the walk itself, not a shared implementation.
    */
  private def refSegment(w: String, vocab: Set[String], maxPiece: Int)
      : List[String] = {
    def go(pos: Int): List[String] =
      if (pos >= w.length) Nil
      else {
        val l = (math.min(maxPiece, w.length - pos) to 1 by -1).find { l =>
          val cand = if (pos == 0) w.substring(0, l)
                     else "##" + w.substring(pos, pos + l)
          vocab.contains(cand)
        }.getOrElse(sys.error(s"stuck at $pos in '$w'"))
        val piece = if (pos == 0) w.substring(0, l)
                    else "##" + w.substring(pos, pos + l)
        piece :: go(pos + l)
      }
    go(0)
  }

  test("segment matches the recursive reference on hand vocabularies") {
    // BERT's canonical example shape: un + ##aff + ##able
    val v1 = Set("un", "##aff", "##able", "u", "n", "##a", "##f", "##b",
      "##l", "##e", "##u", "##n", "a", "f", "b", "l", "e")
    assert(WordPieceSegment_check("unaffable", v1) == "un|##aff|##able")
    // longest-match-first commits greedily even when a shorter first
    // piece would give fewer total pieces — the defining non-optimality
    val v2 = Set("abc", "ab", "a", "b", "c", "d",
      "##cd", "##c", "##d", "##b", "##a")
    assert(WordPieceSegment_check("abcd", v2) == "abc|##d")
    // position sensitivity: "ab" initial-only — mid-word must fall to chars
    val v3 = Set("ab", "a", "b", "##a", "##b")
    assert(WordPieceSegment_check("abab", v3) == "ab|##a|##b")
    for ((w, v) <- Seq(("unaffable", v1), ("abcd", v2), ("abab", v3)))
      assert(WordPieceSegment_check(w, v) ==
        refSegment(w, v, WordPiece.MAX_PIECE).mkString("|"))
  }

  private def WordPieceSegment_check(w: String, v: Set[String]): String =
    graft.functions.WordPieceSegment.segment(w, v, WordPiece.MAX_PIECE)._2

  test("trained model: coverage, reconstruction, greedy invariants (sf0.001)") {
    val docs = graft.core.Tables(spark, sf, "documents")
    val (vocab, segs) = WordPiece.trainedModel(spark, sf)
    val vset = vocab.map(_._1).toSet

    // coverage: every char present in the rendered form(s) of the
    // POSITIONS it occurs at (a char only ever seen word-initially has
    // no continuation entry, and vice versa — zero-frequency forms are
    // correctly absent)
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct().as[String].collect()
    words.foreach { w =>
      assert(vset.contains(w.substring(0, 1)),
        s"missing initial single '${w.head}'")
      w.drop(1).foreach { c =>
        assert(vset.contains("##" + c), s"missing continuation single '##$c'")
      }
    }
    assert(vocab.map(_._1).distinct.length == vocab.length, "dup vocab pieces")

    val rows = segs.select(col("w"), col("n_pieces"), col("seg"))
      .as[(String, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (w, np, seg) =>
      val pieces = seg.split('|')
      assert(pieces.length.toLong == np, s"$w: n_pieces mismatch")
      // reconstruction: stripping markers yields the exact word
      assert(pieces.head + pieces.tail.map(_.stripPrefix("##")).mkString == w,
        s"$w: seg '$seg' does not reconstruct")
      // only the first piece is unmarked
      assert(!pieces.head.startsWith("##") &&
        pieces.tail.forall(_.startsWith("##")), s"$w: marker placement")
      // greedy property at every boundary: no LONGER piece matched
      var pos = 0
      pieces.foreach { p =>
        val core = if (pos == 0) p else p.stripPrefix("##")
        ((core.length + 1) to math.min(WordPiece.MAX_PIECE, w.length - pos))
          .foreach { l =>
            val longer = if (pos == 0) w.substring(0, l)
                         else "##" + w.substring(pos, pos + l)
            assert(!vset.contains(longer),
              s"$w at $pos: took '$p' but longer '$longer' is in vocab")
          }
        pos += core.length
      }
      // and the walk agrees with the independent recursive reference
      assert(refSegment(w, vset, WordPiece.MAX_PIECE).mkString("|") == seg)
    }
  }

  test("apply: per-doc piece counts are consistent with the word table") {
    val (_, segs) = WordPiece.trainedModel(spark, sf)
    val byWord = segs.select(col("w"), col("n_pieces"))
      .as[(String, Long)].collect().toMap
    val out = WordPiece.xWordpieceApply.build(spark, sf)
      .as[(Long, Long, Long)].collect()
    val docs = graft.core.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    assert(out.length == docs.length)
    val expect = docs.map { case (id, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      (id, ws.length.toLong, ws.map(byWord).sum)
    }.sortBy(_._1)
    assert(out.sortBy(_._1).toSeq == expect.toSeq)
  }

  test("fertility: per-lang rows aggregate the word table exactly") {
    val (_, segs) = WordPiece.trainedModel(spark, sf)
    val byWord = segs.select(col("w"), col("n_pieces"))
      .as[(String, Long)].collect().toMap
    val docs = graft.core.Tables(spark, sf, "documents")
      .select(col("lang"), col("text")).as[(String, String)].collect()
    val expect = docs.groupBy(_._1).view.mapValues { ds =>
      val ws = ds.flatMap(_._2.split(" ")).filter(_.nonEmpty)
      (ws.length.toLong, ws.map(byWord).sum)
    }.toMap
    val out = WordPiece.xTokenizerFertility.build(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(out.length == expect.size)
    out.foreach { case (lang, nw, np, fert) =>
      val (enw, enp) = expect(lang)
      assert((nw, np) == (enw, enp), s"lang $lang")
      assert(fert == 1000000L * np / nw)
      assert(fert >= 1000000L, "every word is at least one piece")
    }
    info(s"fertility: " + out.map(o => s"${o._1}=${o._4 / 1e6}").mkString(" "))
  }
}
