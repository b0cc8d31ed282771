package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.WebCorpus
import graft.index.{IndexBuilder, IndexConfig, IndexManifest, SegmentMeta, SegmentMerger}
import graft.search._

/** Merge correctness: a merged index must answer every query identically to
  * the pre-merge index (same urls, same f32 scores) — docId rebase changes
  * addresses but not scores, and tie-break order is preserved because the
  * rebase is order-preserving on (segmentOrdinal, docId)
  * (cf. reference merger proptests, `src/indexer/merger.rs`).
  */
class MergeSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("merge preserves all query results; fan-in recorded; resumable search") {
    val dir = java.nio.file.Files.createTempDirectory("graft-merge").toString
    val docs = WebCorpus.generate(spark, 500L, 3)
    val m0 = IndexBuilder.build(spark, docs.toDF(), dir, IndexConfig(numPartitions = 6))
    assert(m0.segments.size == 6)
    val s0 = new Searcher(spark, dir)

    val queries: Seq[(String, Query)] = Seq(
      "alpha" -> Query.Term("text", "alpha"),
      "+alpha +beta" -> Query.must(Query.Term("text", "alpha"), Query.Term("text", "beta")),
      "or3" -> Query.should(Query.Term("text", "w00003"), Query.Term("text", "w00004"),
        Query.Term("text", "w00005")))
    val before = queries.map { case (n, q) =>
      n -> s0.topDocs(q, 10).map(h => (h.url, h.score)).toList
    }.toMap
    val countsBefore = queries.map { case (n, q) => n -> s0.count(q) }.toMap
    val phraseBefore = s0.count(Query.Phrase("text", Seq("alpha", "beta")))

    // round 1: fan-in 3 -> 2 segments; round 2: fan-in 2 -> 1 segment
    val plan1 = SegmentMerger.plan(m0, 3)
    val m1 = SegmentMerger.merge(spark, dir, plan1)
    assert(m1.segments.size == 2)
    assert(m1.segments.forall(_.mergeFanIn == 3))
    val s1 = new Searcher(spark, dir)
    queries.foreach { case (n, q) =>
      assert(s1.topDocs(q, 10).map(h => (h.url, h.score)).toList == before(n), s"round1 $n")
      assert(s1.count(q) == countsBefore(n), s"round1 count $n")
    }

    val m2 = SegmentMerger.merge(spark, dir, SegmentMerger.plan(m1, 2))
    assert(m2.segments.size == 1)
    assert(m2.segments.head.mergeFanIn == 2)
    assert(m2.totalDocs == 500L)
    val s2 = new Searcher(spark, dir)
    queries.foreach { case (n, q) =>
      assert(s2.topDocs(q, 10).map(h => (h.url, h.score)).toList == before(n), s"round2 $n")
    }
    // phrase still works after merge (positions concatenated correctly)
    assert(s2.count(Query.Phrase("text", Seq("alpha", "beta"))) == phraseBefore)
  }

  test("log merge policy buckets by size like the reference") {
    def meta(id: Int, n: Int) = SegmentMeta(id, n, n.toLong * 10, 1000L, 1L, 0.0, 1)
    // one over-sized segment (excluded), three ~100k, four ~10k, three tiny
    val metas = Seq(meta(0, 2000000), meta(1, 100000), meta(2, 90000), meta(3, 80000),
      meta(4, 10000), meta(5, 9000), meta(6, 8000), meta(7, 7000),
      meta(8, 100), meta(9, 90), meta(10, 80))
    val mf = IndexManifest(IndexManifest.FormatVersion, 1L, "url", "text",
      Seq("url", "lang"), 4, metas)
    val policy = SegmentMerger.LogMergePolicy(
      minNumSegments = 3, maxDocsBeforeMerge = 1000000, minLayerSize = 8, maxFanIn = 4)
    val groups = SegmentMerger.planLog(mf, policy)
    assert(groups.map(_.oldSegments) ==
      Seq(Seq(1, 2, 3), Seq(4, 5, 6, 7), Seq(8, 9, 10)))
    assert(groups.map(_.newSegment) == Seq(11, 12, 13))
    // maxFanIn chunks a wide level into bounded groups
    val chunked = SegmentMerger.planLog(mf, policy.copy(maxFanIn = 3))
    assert(chunked.map(_.oldSegments) ==
      Seq(Seq(1, 2, 3), Seq(4, 5, 6), Seq(7), Seq(8, 9, 10)).filter(_.size >= 2))
    // a level below minNumSegments does not merge
    val sparse = mf.copy(segments = Seq(meta(1, 100000), meta(2, 90000)))
    assert(SegmentMerger.planLog(sparse, policy).isEmpty)
  }

  test("kill during merge: partial new-segment output is cleaned; results identical") {
    def build(dir: String): IndexManifest = {
      val docs = WebCorpus.generate(spark, 400L, 3)
      IndexBuilder.build(spark, docs.toDF(), dir, IndexConfig(numPartitions = 4))
    }
    val policy = SegmentMerger.LogMergePolicy(minNumSegments = 2, maxFanIn = 2)
    val q = Query.should(Query.Term("text", "alpha"), Query.Term("text", "beta"))

    // control: clean hierarchical merge
    val dirA = java.nio.file.Files.createTempDirectory("graft-mA").toString
    build(dirA)
    val mA = SegmentMerger.mergeUntilStable(spark, dirA, policy)
    val hitsA = new Searcher(spark, dirA).topDocs(q, 10).map(h => (h.url, h.score)).toList

    // crashed attempt: same build; the first planned round died after writing
    // PART of a new segment dir (simulated junk) but before the manifest swap
    val dirB = java.nio.file.Files.createTempDirectory("graft-mB").toString
    val m0 = build(dirB)
    val firstRound = SegmentMerger.planLog(m0, policy)
    assert(firstRound.nonEmpty)
    val partial = new java.io.File(s"$dirB/postings/segment=${firstRound.head.newSegment}")
    assert(partial.mkdirs())
    java.nio.file.Files.writeString(partial.toPath.resolve("part-junk.parquet"), "truncated")
    // resume: rerun the merge from the (unchanged) manifest
    val mB = SegmentMerger.mergeUntilStable(spark, dirB, policy)
    assert(mB.segments.map(_.numDocs).sum == mA.segments.map(_.numDocs).sum)
    val hitsB = new Searcher(spark, dirB).topDocs(q, 10).map(h => (h.url, h.score)).toList
    assert(hitsB == hitsA)
    assert(!partial.toPath.resolve("part-junk.parquet").toFile.exists())
  }
}
