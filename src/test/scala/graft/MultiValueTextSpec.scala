package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.index._
import graft.search._

/** Multi-valued TEXT field — the reference's repeated `add_text` on one
  * field (examples/basic_search.rs: `title => "Frankenstein", title =>
  * "The Modern Prometheus"`). Token positions continue across values with
  * POSITION_GAP = 1 (`src/postings/postings_writer.rs:18,158`), so phrases
  * match within a value but never across a value boundary, and the
  * fieldnorm is the total kept-token count over all values.
  */
class MultiValueTextSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-mv").toString
    val src = Seq(
      // the reference example's shape: two title values
      ("u1", Seq("Frankenstein", "The Modern Prometheus"), "en"),
      ("u2", Seq("Of Mice and Men"), "en"),
      ("u3", Seq("The Old Man and the Sea", "A Sequel That Never Was"), "en"),
      ("u4", Seq.empty[String], "en"), // no values -> empty field
      ("u5", Seq("", "modern times"), "en") // empty first value still gaps
    ).toDF("url", "vals", "lang")
      .withColumn("warc_ts", lit(null).cast("timestamp"))
    IndexBuilder.build(spark, src, d,
      IndexConfig(numPartitions = 1, textValuesField = Some("vals")))
    d
  }

  test("terms match across all values; phrases match within one value") {
    val s = new Searcher(spark, dir)
    assert(s.topDocs(Query.Term("text", "frankenstein"), 10).map(_.url).toSet == Set("u1"))
    assert(s.topDocs(Query.Term("text", "prometheus"), 10).map(_.url).toSet == Set("u1"))
    assert(s.topDocs(Query.Term("text", "modern"), 10).map(_.url).toSet == Set("u1", "u5"))
    // within-value phrase: fine
    assert(s.count(Query.Phrase("text", Seq("modern", "prometheus"))) == 1L)
    assert(s.count(Query.Phrase("text", Seq("old", "man"))) == 1L)
  }

  test("phrases never match across a value boundary (POSITION_GAP)") {
    val s = new Searcher(spark, dir)
    // "frankenstein the" spans value 1 -> value 2 of u1: positions 0 and 2
    assert(s.count(Query.Phrase("text", Seq("frankenstein", "the"))) == 0L)
    // "sea a" spans u3's boundary
    assert(s.count(Query.Phrase("text", Seq("sea", "a"))) == 0L)
    // but slop 1 CAN bridge the single-position gap — the reference's
    // semantics exactly (the gap is one position, not infinity)
    assert(s.count(Query.Phrase("text", Seq("frankenstein", "the"), slop = 1)) == 1L)
  }

  test("fieldnorm counts tokens over ALL values (BM25 length)") {
    val s = new Searcher(spark, dir)
    val hit = s.topDocs(Query.Term("text", "frankenstein"), 1).head
    // independent arithmetic: u1=1+3 tokens, u2=4, u3=6+5, u4=0, u5=0+2
    // -> 21 total over 5 docs; docFreq(frankenstein)=1; u1's norm must be
    // the SUM over values (4), not the last value's count
    val w = graft.search.Bm25.forTerms(Seq(1L), 5L, 21L)
    val expected = w.score(graft.index.FieldNorms.fieldNormToId(4L) & 0xff, 1)
    assert(hit.score == expected)
  }

  test("empty values only add gaps; empty value list indexes nothing") {
    val s = new Searcher(spark, dir)
    // u5: value "" (0 tokens) then "modern times" -> positions 1, 2
    assert(s.count(Query.Phrase("text", Seq("modern", "times"))) == 1L)
    assert(s.topDocs(Query.Term("text", "times"), 10).map(_.url).toSet == Set("u5"))
    // u4 has no values: no text terms, but the doc exists under its key
    assert(s.count(Query.Term("url", "u4")) == 1L)
  }
}
