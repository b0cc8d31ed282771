package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.Analyzer
import graft.corpus.WebCorpus
import graft.index._
import graft.search._

/** Dynamic JSON field indexing: path-prefixed terms (analyzed strings with
  * positions, typed numbers), `path:value` / phrase / numeric-range parser
  * syntax, and prefix-clamped open ranges that never leak into sibling
  * paths. Oracle: driver-side recomputation from the corpus.
  */
class JsonFieldSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private val N = 300
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-json").toString
    val src = WebCorpus.generate(spark, N.toLong, 3).toDF()
      .withColumn("attrs", concat(
        lit("{\"tags\": \""),
        expr("array_join(slice(filter(split(lower(text), '[^a-z0-9]+'), x -> x <> ''), 1, 3), ' ')"),
        lit("\", \"meta\": {\"n\": "), length(col("text")),
        lit(", \"m2\": "), length(col("text")) * 2, lit("}}")))
    IndexBuilder.build(spark, src, d,
      IndexConfig(numPartitions = 4, jsonFields = Seq("attrs")))
    d
  }

  // corpus oracle: url -> (first-3 tokens, text length)
  private lazy val corpus: Map[String, (Seq[String], Long)] =
    (0L until N.toLong).map { i =>
      val d = WebCorpus.genDoc(i)
      d.url -> ((Analyzer.terms(d.text).take(3).toSeq, d.text.length.toLong))
    }.toMap

  private val parser = new QueryParser("text", jsonFields = Set("attrs"),
    conjunctionByDefault = true)

  private def engineUrls(q: Query): Set[String] = {
    import spark.implicits._
    val s = new Searcher(spark, dir)
    s.allMatches(q, scored = false).join(s.docmapDF, Seq("segment", "docId"))
      .select("url").as[String].collect().toSet
  }

  test("path term query matches analyzed json string tokens") {
    val tok = corpus.values.flatMap(_._1).groupBy(identity).maxBy(_._2.size)._1
    val got = engineUrls(parser.parse(s"attrs.tags:$tok"))
    val want = corpus.collect { case (u, (ts, _)) if ts.contains(tok) => u }.toSet
    assert(want.nonEmpty && got == want)
  }

  test("phrase inside a json string value uses positions") {
    val (ts, _) = corpus.values.head
    val bigram = ts.take(2)
    val got = engineUrls(parser.parse(s"""attrs.tags:"${bigram.mkString(" ")}""""))
    val want = corpus.collect {
      case (u, (t, _)) if t.sliding(2).contains(bigram) => u
    }.toSet
    assert(want.nonEmpty && got == want)
    // reversed bigram must not match the same docs via bag-of-words
    val rev = engineUrls(parser.parse(s"""attrs.tags:"${bigram.reverse.mkString(" ")}""""))
    val wantRev = corpus.collect {
      case (u, (t, _)) if t.sliding(2).contains(bigram.reverse) => u
    }.toSet
    assert(rev == wantRev)
  }

  test("numeric path literal matches the typed term") {
    val len = corpus.values.head._2
    val got = engineUrls(parser.parse(s"attrs.meta.n:$len"))
    assert(got == corpus.collect { case (u, (_, l)) if l == len => u }.toSet)
  }

  test("jsonExists on a path matches every doc carrying it, none leak") {
    // every doc has meta.n and tags; a fabricated path matches nothing
    assert(engineUrls(Query.jsonExists("attrs", "meta.n")) == corpus.keySet)
    assert(engineUrls(Query.jsonExists("attrs", "tags")) ==
      corpus.collect { case (u, (ts, _)) if ts.nonEmpty => u }.toSet)
    assert(engineUrls(Query.jsonExists("attrs", "meta.nope")).isEmpty)
    // prefix of a real path is NOT the path ("meta" has no direct value)
    assert(engineUrls(Query.jsonExists("attrs", "meta.m")).isEmpty)
  }

  test("numeric path ranges, incl. open ends, never leak into sibling paths") {
    val lens = corpus.values.map(_._2)
    val (lo, hi) = (lens.min + (lens.max - lens.min) / 3, lens.min + 2 * (lens.max - lens.min) / 3)
    assert(engineUrls(parser.parse(s"attrs.meta.n:[$lo TO $hi]")) ==
      corpus.collect { case (u, (_, l)) if l >= lo && l <= hi => u }.toSet)
    // open low end: meta.n <= lo — m2 = 2n values in range must NOT ride in
    assert(engineUrls(parser.parse(s"attrs.meta.n:[* TO $lo]")) ==
      corpus.collect { case (u, (_, l)) if l <= lo => u }.toSet)
    // open high end
    assert(engineUrls(parser.parse(s"attrs.meta.n:[$hi TO *]")) ==
      corpus.collect { case (u, (_, l)) if l >= hi => u }.toSet)
    // sibling path ranges address their own values
    assert(engineUrls(parser.parse(s"attrs.meta.m2:[${2 * lo} TO ${2 * hi}]")) ==
      corpus.collect { case (u, (_, l)) if 2 * l >= 2 * lo && 2 * l <= 2 * hi => u }.toSet)
  }
}
