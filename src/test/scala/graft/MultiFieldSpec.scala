package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.Analyzer
import graft.corpus.WebCorpus
import graft.index._
import graft.search._

/** Multi-TEXT-field schemas (`/root/reference/src/schema/schema.rs`
  * add_text_field — e.g. title + body): each extra field gets its own
  * postings with positions, its own fieldnorms and its own BM25 length
  * statistics; any engine query can name it. Checked against independent
  * arithmetic (marker terms by doc id) and a from-scratch BM25 oracle
  * computed from the title field's OWN stats, across merge.
  */
class MultiFieldSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private val N = 200

  import MultiFieldSpec.titleFor

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-mf").toString
    val tUdf = udf(MultiFieldSpec.titleFor _)
    val src = WebCorpus.generate(spark, N.toLong, 3).toDF()
      .withColumn("title", tUdf(expr("cast(substring(url, length(url) - 7) as long)")))
    IndexBuilder.build(spark, src, d, IndexConfig(numPartitions = 3,
      textFields = Seq("title")))
    d
  }

  private def urlOf(i: Long): String = WebCorpus.genDoc(i).url

  test("title terms match by field; body terms don't leak into title") {
    val s = new Searcher(spark, dir)
    val want = (0L until N.toLong).filter(_ % 5 == 3).map(urlOf).toSet
    val got = s.topDocs(Query.Term("title", "ttl3"), N).map(_.url).toSet
    assert(got == want)
    // the marker is not a body term
    assert(s.count(Query.Term("text", "ttl3")) == 0L)
    // a body term queried against title matches only docs whose first two
    // tokens contain it
    val bodyTerm = Analyzer.terms(WebCorpus.genDoc(7L).text).head
    val wantT = (0L until N.toLong)
      .filter(i => Analyzer.terms(WebCorpus.genDoc(i).text).take(2).contains(bodyTerm))
      .map(urlOf).toSet
    assert(s.topDocs(Query.Term("title", bodyTerm), N).map(_.url).toSet == wantT)
  }

  test("cross-field boolean: title AND body") {
    val s = new Searcher(spark, dir)
    val want = (0L until N.toLong).filter { i =>
      i % 5 == 1 && Analyzer.terms(WebCorpus.genDoc(i).text).contains("alpha")
    }.map(urlOf).toSet
    val got = s.topDocs(
      Query.must(Query.Term("title", "ttl1"), Query.Term("text", "alpha")), N)
      .map(_.url).toSet
    assert(got == want)
  }

  test("title BM25 uses the title field's own stats and norms (f32-exact)") {
    val s = new Searcher(spark, dir)
    // independent stats: every title has exactly 3 tokens
    val df = (0L until N.toLong).count(_ % 5 == 2)
    val w = Bm25.forOneTerm(df.toLong, N.toLong, 3L * N / N.toFloat)
    val expected = w.score(FieldNorms.fieldNormToId(3L), 1)
    val hits = s.topDocs(Query.Term("title", "ttl2"), N)
    assert(hits.nonEmpty)
    hits.foreach(h => assert(h.score == expected,
      s"${h.url}: ${h.score} != $expected"))
    // and it differs from what body stats would give (different avg length)
    val wrong = Bm25.forOneTerm(df.toLong, N.toLong,
      s.manifest.totalTokens.toFloat / N.toFloat)
    assert(wrong.score(FieldNorms.fieldNormToId(3L), 1) != expected)
  }

  test("phrase on the title field honors title positions") {
    val s = new Searcher(spark, dir)
    // "ttl0 <first body token of doc 0>" is adjacent in doc 0's title
    val t0 = Analyzer.terms(WebCorpus.genDoc(0L).text).head
    val want = (0L until N.toLong).filter { i =>
      i % 5 == 0 && Analyzer.terms(WebCorpus.genDoc(i).text).head == t0
    }.map(urlOf).toSet
    val got = s.topDocs(Query.Phrase("title", Seq("ttl0", t0)), N).map(_.url).toSet
    assert(got == want && want.contains(urlOf(0L)))
  }

  test("multi-field postings, norms and scores survive merge") {
    val s0 = new Searcher(spark, dir)
    val before = s0.topDocs(Query.Term("title", "ttl2"), N)
      .map(h => (h.url, h.score)).sortBy(_._1)
    val m = SegmentMerger.mergeUntilStable(spark,
      dir, SegmentMerger.LogMergePolicy(minNumSegments = 2, maxFanIn = 16))
    assert(m.segments.size < 3)
    val s1 = new Searcher(spark, dir)
    val after = s1.topDocs(Query.Term("title", "ttl2"), N)
      .map(h => (h.url, h.score)).sortBy(_._1)
    assert(after.toSeq == before.toSeq)
    // cross-field boolean still exact post-merge
    val want = (0L until N.toLong).filter { i =>
      i % 5 == 1 && Analyzer.terms(WebCorpus.genDoc(i).text).contains("alpha")
    }.map(urlOf).toSet
    assert(s1.topDocs(
      Query.must(Query.Term("title", "ttl1"), Query.Term("text", "alpha")), N)
      .map(_.url).toSet == want)
  }
  test("per-field analyzers: title stems with en_stem while body stays default") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-mfa").toString
    val src = Seq(
      ("u1", new java.sql.Timestamp(0L), "the running dogs", "Running Dogs Daily", "en"),
      ("u2", new java.sql.Timestamp(0L), "a sleeping cat", "Sleeping Cats Weekly", "en"))
      .toDF("url", "warc_ts", "text", "title", "lang")
    IndexBuilder.build(spark, src, d, IndexConfig(numPartitions = 1,
      textFields = Seq("title"), textFieldAnalyzers = Map("title" -> "en_stem")))
    val s = new Searcher(spark, d)
    assert(s.manifest.textFields == Seq("title") &&
      s.manifest.textFieldAnalyzers == Map("title" -> "en_stem"))
    // index side: title terms are stemmed, body terms are not
    assert(s.count(Query.Term("title", "run")) == 1L)
    assert(s.count(Query.Term("title", "running")) == 0L)
    assert(s.count(Query.Term("text", "running")) == 1L)
    assert(s.count(Query.Term("text", "run")) == 0L)
    // parser side: fieldAnalyzers analyzes each field with its own chain,
    // so the same literal matches through both fields' morphologies
    val p = new QueryParser("text", defaultFields = Seq("title", "text"),
      fieldAnalyzers = s.manifest.textFieldAnalyzers)
    assert(s.count(p.parse("title:runs")) == 1L)  // runs -> run (stemmed field)
    assert(s.count(p.parse("text:runs")) == 0L)   // body chain keeps 'runs'
    assert(s.count(p.parse("running")) == 1L)     // title copy stems, body copy matches verbatim
    assert(s.count(p.parse("cats")) == 1L)        // only the stemmed title copy hits
  }
}

object MultiFieldSpec {
  /** title = marker "ttl<i%5>" + the first two body tokens — the marker
    * never appears in body text (vocabulary is w\d{5} + sentinels). Lives
    * in the companion so the synthesis UDF closure stays serializable.
    */
  def titleFor(i: Long): String = {
    val toks = graft.analysis.Analyzer.terms(graft.corpus.WebCorpus.genDoc(i).text)
    (s"ttl${i % 5}" +: toks.take(2)).mkString(" ")
  }
}
