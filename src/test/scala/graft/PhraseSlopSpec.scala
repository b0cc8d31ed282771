package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.Analyzer
import graft.codec.{PostingsCodec, SegmentPostings}
import graft.search.{Bm25, PhraseScorer, Scorer}

/** Phrase + slop kernel semantics against hand-computed fixtures (reference
  * behavior: offset-adjusted positions, abs-distance <= slop for 2 terms —
  * so slop 2 matches transposed adjacent terms, phrase_scorer.rs:144-190).
  */
class PhraseSlopSpec extends AnyFunSuite {

  private def phraseCount(texts: Seq[String], phrase: Seq[String], slop: Int): Map[Int, Int] = {
    val tokens = texts.map(t => Analyzer.tokenize(t))
    val enc = phrase.map { term =>
      val perDoc = tokens.zipWithIndex.flatMap { case (toks, doc) =>
        val ps = toks.filter(_.text == term).map(_.position).toArray
        if (ps.isEmpty) None else Some((doc, ps))
      }
      if (perDoc.isEmpty) return Map.empty
      PostingsCodec.encode(perDoc.map(_._1).toArray, perDoc.map(_._2.length).toArray,
        perDoc.flatMap(_._2).toArray, _ => 0.toByte, withFreqs = true)
    }
    val scorers = enc.map(e =>
      new SegmentPostings(e.docFreq, e.postings, e.skip, e.positions,
        readFreqs = true): graft.codec.PositionedPostings).toArray
    val ps = new PhraseScorer(scorers, null, null, slop)
    val out = scala.collection.mutable.Map[Int, Int]()
    while (ps.doc != Scorer.Terminated) {
      out(ps.doc) = ps.phraseFreqForTest
      ps.advance()
    }
    out.toMap
  }

  test("exact phrase") {
    val texts = Seq("a b c", "b a", "x a b a b", "a x b")
    assert(phraseCount(texts, Seq("a", "b"), 0) == Map(0 -> 1, 2 -> 2))
  }

  test("slop 1 allows one gap, slop 2 allows transposition") {
    val texts = Seq("a b", "a x b", "b a", "a x x x b")
    assert(phraseCount(texts, Seq("a", "b"), 1).keySet == Set(0, 1))
    // "b a": a at 1, b at 0 -> adjusted b' = -1, dist |1 - (-1)| = 2
    assert(phraseCount(texts, Seq("a", "b"), 2).keySet == Set(0, 1, 2))
    // "a x x x b": adjusted distance 3
    assert(phraseCount(texts, Seq("a", "b"), 3).keySet == Set(0, 1, 2, 3))
  }

  test("three-term exact phrase") {
    val texts = Seq("a b c", "a b x c", "c b a", "a b c a b c")
    assert(phraseCount(texts, Seq("a", "b", "c"), 0) == Map(0 -> 1, 3 -> 2))
  }
}
