package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.WebCorpus
import graft.index.{IndexBuilder, IndexConfig, SegmentMerger}
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
}
