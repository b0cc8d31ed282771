package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.search.Snippets

/** Snippet fragment algorithm pinned against the reference's own unit tests
  * (`/root/reference/src/snippet/mod.rs:506-700`): fragment boundaries,
  * per-occurrence scores, earliest-on-tie selection, html escaping, empty
  * cases, and range collapsing.
  */
class SnippetFixtureSpec extends AnyFunSuite {

  // mod.rs:493-503 TEST_TEXT, verbatim
  private val TestText =
    "Rust is a systems programming language sponsored by\nMozilla which describes it as a \"safe, concurrent, practical language\", supporting functional and\nimperative-procedural paradigms. Rust is syntactically similar to C++[according to whom?],\nbut its designers intend it to provide better memory safety while still maintaining\nperformance.\n\nRust is free and open-source software, released under an MIT License, or Apache License\n2.0. Its designers have refined the language through the experiences of writing the Servo\nweb browser layout engine[14] and the Rust compiler. A large proportion of current commits\nto the project are from community members.[15]\n\nRust won first place for \"most loved programming language\" in the Stack Overflow Developer\nSurvey in 2016, 2017, and 2018."

  test("test_snippet (mod.rs:506): fragment count, first score/stop, html") {
    val terms = Map("rust" -> 1.0, "language" -> 0.9)
    val fragments = Snippets.searchFragments(TestText, terms, 100)
    assert(fragments.size == 7)
    assert(math.abs(fragments.head.score - 1.9) < 1e-9)
    assert(fragments.head.stopOffset == 89)
    val snippet = Snippets.selectBest(fragments, TestText)
    assert(snippet.fragment ==
      "Rust is a systems programming language sponsored by\nMozilla which describes it as a \"safe")
    assert(snippet.toHtml ==
      "<b>Rust</b> is a systems programming <b>language</b> sponsored by\nMozilla which describes it as a &quot;safe")
  }

  test("test_snippet_scored_fragment (mod.rs:537): weight flips the winner") {
    {
      val fragments = Snippets.searchFragments(TestText, Map("rust" -> 1.0, "language" -> 0.9), 20)
      assert(math.abs(fragments.head.score - 1.0) < 1e-9)
      assert(fragments.head.stopOffset == 17)
      assert(Snippets.selectBest(fragments, TestText).toHtml == "<b>Rust</b> is a systems")
    }
    {
      val fragments = Snippets.searchFragments(TestText, Map("rust" -> 0.9, "language" -> 1.0), 20)
      assert(math.abs(fragments.head.score - 0.9) < 1e-9)
      assert(fragments.head.stopOffset == 17)
      assert(Snippets.selectBest(fragments, TestText).toHtml == "programming <b>language</b>")
    }
  }

  test("fragment boundary fixtures (mod.rs:580-649)") {
    // term in second fragment
    val f1 = Snippets.searchFragments("a b c d e f g", Map("c" -> 1.0), 3)
    assert(f1.size == 1 && f1.head.startOffset == 4 && f1.head.stopOffset == 7)
    val s1 = Snippets.selectBest(f1, "a b c d e f g")
    assert(s1.fragment == "c d" && s1.toHtml == "<b>c</b> d")
    // term at the end of a fragment
    val f2 = Snippets.searchFragments("a b c d e f f g", Map("f" -> 1.0), 3)
    assert(f2.size == 2 && f2.head.startOffset == 8 && f2.head.stopOffset == 11)
    val s2 = Snippets.selectBest(f2, "a b c d e f f g")
    assert(s2.fragment == "e f" && s2.toHtml == "e <b>f</b>")
    // second fragment has the highest score
    val f3 = Snippets.searchFragments("a b c d e f g", Map("f" -> 1.0, "a" -> 0.9), 7)
    assert(f3.size == 2 && math.abs(f3.head.score - 0.9) < 1e-9 && f3.head.stopOffset == 7)
    val s3 = Snippets.selectBest(f3, "a b c d e f g")
    assert(s3.fragment == "e f g" && s3.toHtml == "e <b>f</b> g")
  }

  test("empty cases (mod.rs:650-682)") {
    for (terms <- Seq(Map("z" -> 1.0), Map.empty[String, Double])) {
      val f = Snippets.searchFragments("a b c d", terms, 3)
      assert(f.isEmpty)
      val s = Snippets.selectBest(f, "a b c d")
      assert(s.fragment == "" && s.toHtml == "" && s.isEmpty)
    }
  }

  test("collapse_overlapped_ranges (mod.rs:777 + doc examples)") {
    import Snippets.collapseOverlappedRanges
    assert(collapseOverlappedRanges(Seq((0, 1), (2, 3))) == Seq((0, 1), (2, 3)))
    assert(collapseOverlappedRanges(Seq((0, 1), (1, 2))) == Seq((0, 1), (1, 2))) // adjacent stay
    assert(collapseOverlappedRanges(Seq((0, 2), (1, 3))) == Seq((0, 3)))
    assert(collapseOverlappedRanges(Seq((0, 3), (1, 2))) == Seq((0, 3)))
    assert(collapseOverlappedRanges(Seq((0, 3), (3, 6), (0, 3), (3, 6))) == Seq((0, 3), (3, 6)))
    assert(collapseOverlappedRanges(Seq((2, 4), (1, 3), (2, 4), (0, 2))) == Seq((0, 4)))
  }

  test("query-driven weights 1/(1+df) + index-analyzer highlighting") {
    import org.apache.spark.sql.functions.lit
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-snipgen").toString
    val df = Seq(("0", "a"), ("1", "a"), ("2", "a b")).toDF("url", "text")
      .withColumn("lang", lit("en"))
      .withColumn("warc_ts", lit(java.sql.Timestamp.valueOf("2025-01-01 00:00:00")))
    graft.index.IndexBuilder.build(spark, df, dir, graft.index.IndexConfig(numPartitions = 1))
    val s = new graft.search.Searcher(spark, dir)
    val gen = Snippets.forQuery(s,
      graft.search.Query.should(
        graft.search.Query.Term("text", "a"), graft.search.Query.Term("text", "b")), "text")
    val sn = gen("a b")
    // df(a)=3 -> 0.25, df(b)=1 -> 0.5 (mod.rs test_snippet_generator_term_score)
    assert(sn.toHtml == "<b>a</b> <b>b</b>")
    val frags = Snippets.searchFragments("a b", Map("a" -> 0.25, "b" -> 0.5), 150)
    assert(math.abs(frags.head.score - 0.75) < 1e-9)
  }
}
