package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.Analyzer
import graft.corpus.WebCorpus
import graft.index._
import graft.search._

/** Hierarchical facet collector: direct-child counts of a root facet over
  * matched docs, with multi-valued comma-separated paths, subtree
  * aggregation through ancestor terms, and merge survival. Oracle:
  * driver-side recomputation.
  */
class FacetSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private val N = 300
  // facet paths per doc: /<lang>/h<i%5> plus a second path /topic/t<i%3>
  private def facetsOf(i: Long, lang: String): Seq[String] =
    Seq(s"/$lang/h${i % 5}", s"/topic/t${i % 3}")

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-facet").toString
    val src = WebCorpus.generate(spark, N.toLong, 3).toDF()
      .withColumn("i", regexp_extract(col("url"), "p(\\d+)", 1).cast("long"))
      .withColumn("facet", concat(
        lit("/"), col("lang"), lit("/h"), col("i") % 5,
        lit(",/topic/t"), col("i") % 3))
      .drop("i")
    IndexBuilder.build(spark, src, d,
      IndexConfig(numPartitions = 4, facetFields = Seq("facet")))
    d
  }

  private lazy val corpus: Map[String, (Seq[String], Seq[String])] =
    (0L until N.toLong).map { i =>
      val d = WebCorpus.genDoc(i)
      d.url -> ((Analyzer.terms(d.text).toSeq, facetsOf(i, d.lang)))
    }.toMap

  private def oracle(tok: String, root: String): Map[String, Long] = {
    val pfx = root + "/"
    corpus.values.collect { case (toks, facets) if toks.contains(tok) =>
      facets.flatMap { p =>
        // the doc counts toward each DIRECT child of root it has a path under
        if (p.startsWith(pfx)) {
          val end = p.indexOf('/', pfx.length)
          Some(if (end < 0) p else p.substring(0, end))
        } else None
      }.distinct
    }.flatten.groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
  }

  private def got(tok: String, root: String): Map[String, Long] =
    new Searcher(spark, dir).facetCounts(Query.Term("text", tok), "facet", root)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("direct-child counts under a lang root match the oracle") {
    val o = oracle("alpha", "/en")
    assert(o.nonEmpty)
    assert(got("alpha", "/en") == o)
  }

  test("multi-valued second path counts independently") {
    assert(got("alpha", "/topic") == oracle("alpha", "/topic"))
  }

  test("root children aggregate whole subtrees and survive merge") {
    // root "": direct children are the langs + /topic; a doc with /en/h2
    // counts toward /en via the indexed ancestor term
    val before = got("beta", "")
    assert(before == oracle("beta", ""))
    SegmentMerger.mergeUntilStable(spark, dir,
      SegmentMerger.LogMergePolicy(minNumSegments = 2, maxFanIn = 4))
    assert(got("beta", "") == before)
    assert(got("alpha", "/en") == oracle("alpha", "/en"))
  }
}
