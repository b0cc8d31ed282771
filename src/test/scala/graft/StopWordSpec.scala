package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.Analyzer

/** Built-in per-language stop lists vs the reference's
  * `StopWordFilter::new(Language)` data (stop_word_filter/stopwords.rs;
  * English = the Lucene list, mod.rs:41-48).
  */
class StopWordSpec extends AnyFunSuite {

  test("list sizes match the reference's vendored data exactly") {
    // distinct-word counts (the reference data carries 5 duplicate Finnish
    // words and 1 duplicate Hungarian word; a set collapses them — the
    // filter behavior is identical either way)
    val expect = Map(
      "danish" -> 94, "dutch" -> 101, "english" -> 33, "finnish" -> 229,
      "french" -> 154, "german" -> 231, "hungarian" -> 198, "italian" -> 279,
      "norwegian" -> 172, "portuguese" -> 203, "russian" -> 159,
      "spanish" -> 308, "swedish" -> 114)
    assert(Analyzer.builtinStopWords.view.mapValues(_.size).toMap == expect)
  }

  test("membership spot checks, ISO-code lookup, absent languages -> None") {
    assert(Analyzer.stopWordsFor("en").get.contains("the"))
    assert(!Analyzer.stopWordsFor("en").get.contains("fox"))
    assert(Analyzer.stopWordsFor("danish").get.contains("og"))
    assert(Analyzer.stopWordsFor("ru").get.contains("и")) // Cyrillic "i"
    assert(Analyzer.stopWordsFor("de").get.contains("und"))
    assert(Analyzer.stopWordsFor("tr").isEmpty) // reference has no Turkish list
    assert(Analyzer.stopWordsFor("klingon").isEmpty)
  }

  test("reference doc example: 'the fox is crafty' -> fox crafty") {
    // stop_word_filter/mod.rs doc test, with the built-in English list
    // (which contains both 'the' and 'is')
    val out = Analyzer.removeStopWords(
      Analyzer.tokenize("the fox is crafty"), Analyzer.stopWordsFor("en").get)
    assert(out.map(_.text).toSeq == Seq("fox", "crafty"))
    // dropped tokens leave position gaps (positions come from tokenize)
    assert(out.map(_.position).toSeq == Seq(1, 3))
  }

  test("en_stop chain is registered and resolves") {
    val c = Analyzer.chainTerms("en_stop")
    assert(c("The Fox IS crafty") == Seq("fox", "crafty")) // lowercased first
    assertThrows[IllegalArgumentException](Analyzer.chain("tr_stop"))
  }
}
