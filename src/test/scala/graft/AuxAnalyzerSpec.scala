package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.Analyzer

/** Auxiliary analyzers (§2.5): ngram / regex / facet tokenizers, alphanum
  * and stop-word filters — fixtures mirror the reference's doc examples.
  */
class AuxAnalyzerSpec extends AnyFunSuite {

  test("ngram tokenizer: the reference's hello examples") {
    // min 2, max 3 (ngram_tokenizer.rs:10-16)
    assert(Analyzer.ngramTokens("hello", 2, 3).map(_.text).toSeq ==
      Seq("he", "hel", "el", "ell", "ll", "llo", "lo"))
    // prefix_only, min 2 max 5 (:17-23)
    assert(Analyzer.ngramTokens("hello", 2, 5, prefixOnly = true).map(_.text).toSeq ==
      Seq("he", "hel", "hell", "hello"))
    // non-ascii codepoint boundaries (:24-30)
    assert(Analyzer.ngramTokens("hεllo", 2, 2).map(_.text).toSeq ==
      Seq("hε", "εl", "ll", "lo"))
    // offsets are char offsets at codepoint frontiers
    val t = Analyzer.ngramTokens("hεllo", 2, 2).head
    assert(t.offsetFrom == 0 && t.offsetTo == 2)
    assert(Analyzer.ngramTokens("a", 2, 3).isEmpty)
    intercept[IllegalArgumentException](Analyzer.ngramTokens("x", 0, 2))
    intercept[IllegalArgumentException](Analyzer.ngramTokens("x", 3, 2))
  }

  test("regex tokenizer emits matches with ordinal positions") {
    val toks = Analyzer.regexTokens("ab12cd34", "[0-9]+")
    assert(toks.map(_.text).toSeq == Seq("12", "34"))
    assert(toks.map(_.position).toSeq == Seq(0, 1))
    assert(toks.map(t => (t.offsetFrom, t.offsetTo)).toSeq == Seq((2, 4), (6, 8)))
  }

  test("facet tokenizer emits self plus ancestors, root-first") {
    assert(Analyzer.facetTokens("/america/north_america/canada").map(_.text).toSeq ==
      Seq("/america", "/america/north_america", "/america/north_america/canada"))
    assert(Analyzer.facetTokens("/a").map(_.text).toSeq == Seq("/a"))
    assert(Analyzer.facetTokens("/").isEmpty)
  }

  test("alphanum-only and stop-word filters keep position gaps") {
    val toks = Analyzer.whitespaceTokens("good the x-ray beats λ42 beam")
    val alnum = Analyzer.alphaNumOnly(toks)
    assert(alnum.map(_.text).toSeq == Seq("good", "the", "beats", "λ42", "beam"))
    assert(alnum.map(_.position).toSeq == Seq(0, 1, 3, 4, 5)) // "x-ray" leaves a gap
    val stopped = Analyzer.removeStopWords(alnum, Analyzer.EnglishStopWords)
    assert(stopped.map(_.text).toSeq == Seq("good", "beats", "λ42", "beam"))
    assert(stopped.map(_.position).toSeq == Seq(0, 3, 4, 5))
  }

  test("foreachTerm (build hot path) is bit-identical to the default chain") {
    def viaForeach(s: String): (Seq[(String, Int)], Int) = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
      val kept = Analyzer.foreachTerm(s)((t, p) => out += ((t, p)))
      (out.toSeq, kept)
    }
    def viaChain(s: String): (Seq[(String, Int)], Int) = {
      val toks = Analyzer.tokenize(s)
      (toks.map(t => (t.text, t.position)).toSeq, toks.length)
    }
    val fixed = Seq(
      "", "   ", "hello world", "Hello WORLD MixedCase",
      "a" * 39, "a" * 40, "b " + "c" * 39 + " d" + "e" * 40, // remove_long edges
      "über Straße ΛΌΓΟΣ λόγος", "日本語 テスト 42",
      "x" + "é" * 20, "y" + "é" * 19,              // utf-8 byte-length edges
      "tab\tnl\npunct,.;!?", "num123mix ABC123def",
      "😀 emoji 𝒜math", "end.")
    fixed.foreach { s => assert(viaForeach(s) == viaChain(s), s"mismatch on: $s") }
    val rnd = new scala.util.Random(20260819)
    val alphabet = "abAB12 \t.é世😀Α"
    (1 to 300).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(120))(alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(viaForeach(s) == viaChain(s), s"mismatch on fuzz: $s")
    }
  }
}
