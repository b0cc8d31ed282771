package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.Analyzer
import graft.index._
import graft.search._

/** Named analyzer chains (TokenizerManager analog,
  * `/root/reference/src/tokenizer/tokenizer_manager.rs:56-81`): registered
  * names resolve to full chains, the index records its text analyzer in the
  * manifest, and the query parser analyzes with the SAME chain — so an
  * `en_stem` index matches across English morphology end-to-end.
  */
class AnalyzerChainSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("chain resolution: default, raw, whitespace, stemmers") {
    def texts(name: String, in: String): Seq[String] =
      Analyzer.chain(name)(in).map(_.text).toSeq
    assert(texts("default", "Hello, World-Wide!") == Seq("hello", "world", "wide"))
    assert(texts("raw", "Hello, World-Wide!") == Seq("Hello, World-Wide!"))
    assert(texts("whitespace", "Hello, World-Wide!") == Seq("Hello,", "World-Wide!"))
    // en_stem = default + Porter2 (the reference's registered en_stem)
    assert(texts("en_stem", "Running runners consistently") ==
      Seq("run", "runner", "consist"))
    // code and full-name forms resolve to the same stemmer
    assert(texts("de_stem", "Aufeinanderfolgenden") == texts("german_stem", "Aufeinanderfolgenden"))
    // positions survive filters (stemming keeps ordinals)
    val toks = Analyzer.chain("en_stem")("jumping over lazy dogs")
    assert(toks.map(_.position).toSeq == Seq(0, 1, 2, 3))
    intercept[IllegalArgumentException] { Analyzer.chain("nope") }
    intercept[IllegalArgumentException] { Analyzer.chain("zz_stem") }
  }

  test("en_stem index + parser: matches across morphology, manifest records the chain") {
    import spark.implicits._
    val texts = Seq(
      "running fast through the woods",   // 0
      "he runs every day",                // 1
      "a long run yesterday",             // 2
      "completely unrelated words here",  // 3
      "the runner was running late")      // 4
    val dir = java.nio.file.Files.createTempDirectory("graft-anlz").toString
    val df = texts.zipWithIndex.map { case (t, i) =>
      (i.toString, t, "en", java.sql.Timestamp.valueOf("2025-01-01 00:00:00"))
    }.toDF("url", "text", "lang", "warc_ts")
    val m = IndexBuilder.build(spark, df, dir,
      IndexConfig(numPartitions = 2, textAnalyzer = "en_stem"))
    assert(m.textAnalyzer == "en_stem")

    val s = new Searcher(spark, dir)
    val parser = new QueryParser(m.textField, analyzer = m.textAnalyzer)
    def urls(q: Query): Set[String] = {
      s.allMatches(q, scored = false).join(s.docmapDF, Seq("segment", "docId"))
        .select("url").as[String].collect().toSet
    }
    // "running", "runs", "run" all hit the same stemmed term space
    assert(urls(parser.parse("running")) == Set("0", "1", "2", "4"))
    assert(urls(parser.parse("runs")) == Set("0", "1", "2", "4"))
    // phrase analyzed through the chain: "runner was running" -> stems align
    assert(urls(parser.parse("\"runner was running\"")) == Set("4"))
    // MoreLikeThis seeds from the index's own chain
    val mlt = MoreLikeThis.query(s, "text", "running runs runner",
      MoreLikeThis.Config(minTermFreq = 1, minDocFreq = 1))
    assert(urls(mlt).contains("4"))
    // resume with a different analyzer refuses (mixed term spaces)
    val e = intercept[IllegalArgumentException] {
      IndexBuilder.build(spark, df, dir, IndexConfig(numPartitions = 2))
    }
    assert(e.getMessage.contains("analyzer"))
  }

  test("whitespace analyzer is case- and punctuation-preserving end-to-end") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-anlz-ws").toString
    val df = Seq(("0", "Foo-Bar baz", "en"), ("1", "foo-bar baz", "en"))
      .toDF("url", "text", "lang")
      .withColumn("warc_ts", org.apache.spark.sql.functions.lit(
        java.sql.Timestamp.valueOf("2025-01-01 00:00:00")))
    val m = IndexBuilder.build(spark, df, dir,
      IndexConfig(numPartitions = 1, textAnalyzer = "whitespace"))
    val s = new Searcher(spark, dir)
    val parser = new QueryParser(m.textField, analyzer = m.textAnalyzer)
    def urls(q: Query): Set[String] =
      s.allMatches(q, scored = false).join(s.docmapDF, Seq("segment", "docId"))
        .select("url").as[String].collect().toSet
    assert(urls(parser.parse("Foo-Bar")) == Set("0"))
    assert(urls(parser.parse("foo-bar")) == Set("1"))
    assert(urls(parser.parse("baz")) == Set("0", "1"))
  }
}
