package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.Analyzer
import graft.index._
import graft.search._

/** AsciiFoldingFilter parity examples + PreTokenizedString ingestion. */
class FoldPreTokSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("ascii folding: reference mapping examples") {
    // decomposable diacritics strip to the base letter
    assert(Analyzer.asciiFold("Ràmon") == "Ramon")
    assert(Analyzer.asciiFold("Méthode") == "Methode")
    assert(Analyzer.asciiFold("über") == "uber")
    assert(Analyzer.asciiFold("señor") == "senor")
    assert(Analyzer.asciiFold("Ångström") == "Angstrom")
    // non-decomposable special cases
    assert(Analyzer.asciiFold("œuvre") == "oeuvre")
    assert(Analyzer.asciiFold("straße") == "strasse")
    assert(Analyzer.asciiFold("Ælfred") == "AElfred")
    assert(Analyzer.asciiFold("søster") == "soster")
    assert(Analyzer.asciiFold("Łódź") == "Lodz")
    assert(Analyzer.asciiFold("Þór") == "THor")
    // pure ASCII passes through by reference equality (fast path)
    val s = "plain ascii"
    assert(Analyzer.asciiFold(s) eq s)
    // unmapped non-Latin passes through
    assert(Analyzer.asciiFold("日本語") == "日本語")
    // as a token filter: positions survive
    val toks = Analyzer.asciiFoldTokens(Analyzer.tokenize("Crème brûlée"))
    assert(toks.map(_.text).toSeq == Seq("creme", "brulee"))
    assert(toks.map(_.position).toSeq == Seq(0, 1))
  }

  test("split compound words: reference doc example semantics") {
    import scala.collection.mutable.ArrayBuffer
    val dict = Set("dampf", "schiff", "fahrt", "brot", "backen", "automat")
    def split(text: String): Seq[String] =
      Analyzer.splitCompoundWords(Analyzer.tokenize(text), dict).map(_.text).toSeq
    // fully decomposable -> parts (the reference's doctest)
    assert(split("dampfschifffahrt") == Seq("dampf", "schiff", "fahrt"))
    // not fully decomposable ("back" missing) -> unchanged
    assert(split("brotbackautomat") == Seq("brotbackautomat"))
    // untouched words pass through; parts keep the original position
    val toks = Analyzer.splitCompoundWords(Analyzer.tokenize("die dampfschifffahrt heute"), dict)
    assert(toks.map(_.text).toSeq == Seq("die", "dampf", "schiff", "fahrt", "heute"))
    assert(toks.filter(t => Set("dampf", "schiff", "fahrt")(t.text)).map(_.position).distinct.size == 1)
    // greedy leftmost-longest: prefers the longest dictionary word at each cut
    val d2 = Set("foo", "foobar", "bar", "baz")
    assert(Analyzer.splitCompoundWords(ArrayBuffer(graft.analysis.Token("foobarbaz", 0, 0, 9)), d2)
      .map(_.text).toSeq == Seq("foobar", "baz"))
    assert(Analyzer.splitCompoundWords(ArrayBuffer(graft.analysis.Token("foobarqux", 0, 0, 9)), d2)
      .map(_.text).toSeq == Seq("foobarqux"))
  }

  test("pre-tokenized ingestion: user tokens verbatim, positions = indices") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pretok").toString
    // tokens deliberately NOT what the analyzer would produce (mixed case
    // kept? no — user chose lowercase BPE-ish pieces incl. punctuation-glued)
    val rows = Seq(
      ("u0", "ignored raw text", Seq("hel", "lo", "world", "x-1")),
      ("u1", "also ignored", Seq("world", "of", "spark")),
      ("u2", "more", Seq("hel", "lo", "again")))
      .toDF("url", "text", "toks")
      .withColumn("lang", lit("en"))
      .withColumn("warc_ts", to_timestamp(lit("2025-01-01 00:00:00")))
    IndexBuilder.build(spark, rows, dir,
      IndexConfig(numPartitions = 2, preTokenizedField = Some("toks")))

    val s = new Searcher(spark, dir)
    def urls(q: Query): Set[String] = {
      s.allMatches(q, scored = false).join(s.docmapDF, Seq("segment", "docId"))
        .select("url").as[String].collect().toSet
    }
    // raw-text tokens are NOT indexed; user tokens are
    assert(urls(Query.Term("text", "ignored")).isEmpty)
    assert(urls(Query.Term("text", "x-1")) == Set("u0"))
    assert(urls(Query.Term("text", "world")) == Set("u0", "u1"))
    // positions: the user's adjacency, not the analyzer's
    assert(urls(Query.Phrase("text", Seq("hel", "lo"))) == Set("u0", "u2"))
    assert(urls(Query.Phrase("text", Seq("lo", "world"))) == Set("u0"))
    assert(urls(Query.Phrase("text", Seq("world", "hel"))).isEmpty)
    // norms come from the token count (3, 3, 4): manifest totals agree
    assert(s.manifest.totalTokens == 10L)
  }
}
