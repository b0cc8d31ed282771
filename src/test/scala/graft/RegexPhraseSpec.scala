package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.Analyzer
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.{Bm25, PhraseScorer, Query, Searcher}

/** Carrying-slop fold + RegexPhraseQuery semantics.
  *
  * The carrying-slop vectors are the reference's own unit fixtures
  * (`/root/reference/src/query/phrase_query/phrase_scorer.rs:640-695`,
  * test_carry_slop_intersection) — the fold must reproduce them exactly,
  * including the kept-both-sides position/slop lists.
  */
class RegexPhraseSpec extends AnyFunSuite {

  // ------------------------------------------------- carrying-slop fixtures

  /** Reference test harness shape: seed slops at zero, fold rights in order,
    * return (last count, (slop, pos) pairs).
    */
  private def foldCarry(slots: Seq[Seq[Int]], slop: Int): (Int, Seq[(Int, Int)]) = {
    var left = slots.head.toArray
    var slops = Array.fill(left.length)(0)
    var count = 0
    for (right <- slots.tail) {
      val (c, nl, ns) = PhraseScorer.carryingSlop(left, slops, right.toArray, slop, updateLeft = true)
      count = c
      left = nl
      slops = ns
    }
    (count, slops.zip(left).toSeq)
  }

  test("carrying-slop fold matches the reference's fixtures") {
    assert(foldCarry(Seq(Seq(1), Seq()), 1) == ((0, Seq())))
    assert(foldCarry(Seq(Seq(1), Seq(2)), 1) == ((1, Seq((1, 1), (1, 2)))))
    assert(foldCarry(Seq(Seq(1), Seq(3)), 1) == ((0, Seq())))
    // order still matters
    assert(foldCarry(Seq(Seq(1), Seq(2), Seq(2)), 1) == ((1, Seq((1, 2)))))
    assert(foldCarry(Seq(Seq(2), Seq(1), Seq(2)), 1) == ((1, Seq((1, 2)))))
    assert(foldCarry(Seq(Seq(2), Seq(2), Seq(1)), 1) == ((1, Seq((1, 1), (1, 2)))))
    assert(foldCarry(Seq(Seq(2), Seq(2), Seq(1), Seq(2)), 1) == ((1, Seq((1, 2)))))
    assert(foldCarry(Seq(Seq(1), Seq(2), Seq(2), Seq(2)), 1) == ((1, Seq((1, 2)))))
    assert(foldCarry(Seq(Seq(1), Seq(2), Seq(1)), 1) == ((1, Seq((1, 1)))))
    assert(foldCarry(Seq(Seq(11), Seq(10, 12)), 1) == ((1, Seq((1, 10), (1, 11), (1, 12)))))
    assert(foldCarry(Seq(Seq(10, 12), Seq(11)), 1) == ((1, Seq((1, 10), (1, 11), (1, 12)))))
    assert(foldCarry(Seq(Seq(5, 7, 11), Seq(1, 5, 10, 12)), 1) ==
      ((2, Seq((0, 5), (1, 10), (1, 11), (1, 12)))))
  }

  // ------------------------------------------------- regex phrase end-to-end

  lazy val spark = TestSpark.spark

  private val texts = Seq(
    "alan just got a part time job",      // 0: part(4) time(5) adjacent
    "this is my favorite part of the job", // 1: no time
    "partial times are hard",              // 2: times != time
    "deal part time part time deal",       // 3: two occurrences
    "paint time now",                      // 4: paint time adjacent
    "part of time")                        // 5: gap of 1 (slop 2 in carrying terms? dist 1 after offset)

  lazy val indexDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rephrase").toString
    val df = texts.zipWithIndex.map { case (t, i) =>
      (i.toString, t, "en", java.sql.Timestamp.valueOf("2025-01-01 00:00:00"))
    }.toDF("url", "text", "lang", "warc_ts")
    IndexBuilder.build(spark, df, dir, IndexConfig(numPartitions = 2))
    dir
  }
  lazy val searcher = new Searcher(spark, indexDir)

  private def matchedUrls(q: Query): Set[String] = {
    import spark.implicits._
    searcher.allMatches(q, scored = false)
      .join(searcher.docmapDF, Seq("segment", "docId"))
      .select("url").as[String].collect().toSet
  }

  test("regex phrase, slop 0: pa.* time") {
    val q = Query.RegexPhrase("text", Seq("pa.*", "time"))
    assert(matchedUrls(q) == Set("0", "3", "4"))
  }

  test("regex phrase slop bridges the gap") {
    val q = Query.RegexPhrase("text", Seq("pa.*", "time"), slop = 1)
    assert(matchedUrls(q) == Set("0", "3", "4", "5"))
  }

  test("slot with no dictionary match -> empty") {
    assert(matchedUrls(Query.RegexPhrase("text", Seq("zzz.*", "time"))).isEmpty)
    assert(searcher.topDocs(Query.RegexPhrase("text", Seq("zzz.*", "time")), 5).isEmpty)
  }

  test("three-slot regex phrase uses carrying slop") {
    // "deal part time part time deal": deal(0) part(1) time(2)... and deal(5)
    // chain de.* -> part -> time with budget 0 matches only doc 3 at slot 0
    val q = Query.RegexPhrase("text", Seq("de.*", "pa.*", "time"))
    assert(matchedUrls(q) == Set("3"))
    // slop 3 lets "alan just got a part time job"? no 'de*' token at all -> still just 3
    assert(matchedUrls(Query.RegexPhrase("text", Seq("de.*", "pa.*", "time"), slop = 3)) == Set("3"))
  }

  test("scores use the literal patterns' BM25 weight and union phrase freq") {
    val q = Query.RegexPhrase("text", Seq("pa.*", "time"))
    val hits = searcher.topDocs(q, 10)
    assert(hits.map(_.url).toSet == Set("0", "3", "4"))
    val m = searcher.manifest
    // weight statistics come from the LITERAL pattern strings as terms
    // (regex_phrase_query.rs:145-149): "pa.*" is no dictionary term (df 0)
    // but "time" is one (df 4 here) and its real df feeds the idf sum
    val dfTime = texts.count(t => Analyzer.terms(t).contains("time")).toLong
    assert(dfTime == 4L)
    val w = Bm25.forTerms(Seq(0L, dfTime), m.totalDocs, m.totalTokens)
    val byUrl = hits.map(h => h.url -> h.score).toMap
    def score(url: String, freq: Int): Float = {
      val toks = Analyzer.terms(texts(url.toInt))
      w.score(graft.index.FieldNorms.fieldNormToId(toks.length.toLong), freq)
    }
    assert(byUrl("0") == score("0", 1))
    assert(byUrl("3") == score("3", 2)) // two occurrences
    assert(byUrl("4") == score("4", 1))
  }

  test("max expansions enforced across slots") {
    intercept[IllegalArgumentException] {
      searcher.plan(Query.RegexPhrase("text", Seq(".*", "time"), 0, maxExpansions = 3))
    }
  }

  test("regex literal-prefix extraction (dictionary-seek pushdown) is sound") {
    import Searcher.literalPrefix
    assert(literalPrefix("table") == "table")
    assert(literalPrefix("ta.le") == "ta")
    assert(literalPrefix("tab.*") == "tab")
    assert(literalPrefix("tabl?e") == "tab") // quantifier drops the 'l'
    assert(literalPrefix("tab+le") == "ta")
    assert(literalPrefix("ta{2}ble") == "t")
    assert(literalPrefix("pa(rt|int)") == "pa") // nested pipe keeps prefix
    assert(literalPrefix("part|paint") == "")   // top-level pipe voids it
    assert(literalPrefix("p[ai]rt") == "p")
    assert(literalPrefix("\\w+ime") == "")
    assert(literalPrefix(".*me") == "")
    // end-to-end: prefixed and prefix-free regexes agree with brute force
    for (p <- Seq("pa.*t", "pa(rt|int)", "part|paint", "t.mes?")) {
      val want = texts.zipWithIndex.collect { case (t, i)
        if Analyzer.terms(t).exists(_.matches(s"(?:$p)")) => i.toString
      }.toSet
      assert(matchedUrls(Query.Regexp("text", p)) == want, p)
    }
  }
}
