package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.WebCorpus
import graft.index.{IndexBuilder, IndexConfig}
import graft.search._

/** Explanation API: tree wording per the reference (`bm25.rs:196-226`,
  * `boolean_weight.rs:445-463`), values consistent with the engine's own
  * f32 scores.
  */
class ExplainSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  lazy val indexDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-explain").toString
    IndexBuilder.build(spark, WebCorpus.generate(spark, 300L, 2).toDF(), dir,
      IndexConfig(numPartitions = 2))
    dir
  }
  lazy val searcher = new Searcher(spark, indexDir)

  test("term explanation reproduces the exact hit score with Lucene wording") {
    val q = Query.Term("text", "alpha")
    val hit = searcher.topDocs(q, 1).head
    val e = searcher.explain(q, hit.segment, hit.docId).get
    assert(e.value == hit.score) // f32-exact: same weight, same norm, same tf
    assert(e.description == "TermQuery, product of...")
    assert(e.details.map(_.description) == Seq(
      "(K1+1)",
      "idf, computed as log(1 + (N - n + 0.5) / (n + 0.5))",
      "freq / (freq + k1 * (1 - b + b * dl / avgdl))"))
    val idf = e.details(1)
    assert(idf.details.map(_.description) == Seq(
      "n, number of docs containing this term", "N, total number of docs"))
    assert(idf.details(1).value == 300.0f)
    // product of the factors reconstructs the score (up to f32 rounding)
    val prod = e.details.map(_.value).product
    assert(math.abs(prod - e.value) <= 1e-4f * math.abs(e.value))
    assert(e.context.exists(_.contains("alpha")))
    // render + json shapes
    assert(e.render.contains("TermQuery"))
    assert(e.toJson.startsWith("{\"value\":"))
  }

  test("boolean explanation sums matching positive legs") {
    val q = Query.should(Query.Term("text", "alpha"), Query.Term("text", "beta"))
    val hit = searcher.topDocs(q, 1).head
    val e = searcher.explain(q, hit.segment, hit.docId).get
    assert(e.value == hit.score)
    assert(e.description == "BooleanClause. sum of ...")
    assert(e.details.nonEmpty)
    val childSum = e.details.map(_.value).sum
    assert(math.abs(childSum - e.value) <= 1e-4f * math.abs(e.value))
  }

  test("non-matching doc and by-url lookup") {
    val q = Query.Term("text", "alpha")
    val matches = searcher.allMatches(q, scored = false)
      .select("segment", "docId").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val miss = (0 until searcher.manifest.segments.head.numDocs)
      .map(d => (searcher.manifest.segments.head.segment, d))
      .find(a => !matches.contains(a))
    miss.foreach { case (s, d) => assert(searcher.explain(q, s, d).isEmpty) }

    val hit = searcher.topDocs(q, 1).head
    val byUrl = searcher.explain(q, hit.url).get
    assert(byUrl.value == hit.score)
    assert(searcher.explain(q, "https://no.such/url").isEmpty)
  }

  test("boost and phrase explanations") {
    val qb = Query.Boost(Query.Term("text", "alpha"), 2.0f)
    val hb = searcher.topDocs(qb, 1).head
    val eb = searcher.explain(qb, hb.segment, hb.docId).get
    assert(eb.value == hb.score)

    val qp = Query.Phrase("text", Seq("alpha", "beta"))
    val hits = searcher.topDocs(qp, 1)
    if (hits.nonEmpty) {
      val ep = searcher.explain(qp, hits.head.segment, hits.head.docId).get
      assert(ep.description == "Phrase Scorer")
      assert(ep.value == hits.head.score)
    }
  }
}
