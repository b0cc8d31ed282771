package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.WebCorpus
import graft.index._
import graft.search._

/** INDEX_WRITER_LOCK analog (`/root/reference/src/directory/lock.rs`):
  * one manifest mutator per index directory, enforced via atomic
  * create-if-absent; plus Iceberg-style snapshot rollback.
  */
class WriterLockSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("second writer is busy; release frees; stale lock can be broken") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lock").toString
    val l1 = WriterLock.acquire(spark, dir, holder = "w1")
    val e = intercept[WriterLock.LockBusyException] {
      WriterLock.acquire(spark, dir, holder = "w2")
    }
    assert(e.getMessage.contains("w1"))
    l1.release()
    val l2 = WriterLock.acquire(spark, dir, holder = "w2")
    l2.release()
    // a crashed holder's stale lock breaks after staleMs
    WriterLock.acquire(spark, dir, holder = "dead") // never released
    Thread.sleep(30)
    val l3 = WriterLock.acquire(spark, dir, holder = "janitor", staleMs = 10)
    l3.release()
    // withLock releases on failure
    intercept[RuntimeException] {
      WriterLock.withLock(spark, dir)(throw new RuntimeException("boom"))
    }
    WriterLock.withLock(spark, dir)(()) // re-acquirable
  }

  test("mutators take the lock: a held lock rejects build, merge, delete") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lock2").toString
    val docs = WebCorpus.generate(spark, 100L, 2)
    val m = IndexBuilder.build(spark, docs.toDF(), dir, IndexConfig(numPartitions = 2))
    val held = WriterLock.acquire(spark, dir, holder = "other-driver")
    intercept[WriterLock.LockBusyException] {
      IndexBuilder.build(spark, docs.toDF(), dir, IndexConfig(numPartitions = 2))
    }
    intercept[WriterLock.LockBusyException] {
      Deleter.deleteKey(spark, dir, "anything")
    }
    intercept[WriterLock.LockBusyException] {
      SegmentMerger.merge(spark, dir, SegmentMerger.plan(m, 2))
    }
    held.release()
    // and everything works again after release
    Deleter.deleteKey(spark, dir, WebCorpus.genDoc(0L).url)
    SegmentMerger.mergeUntilStable(spark, dir,
      SegmentMerger.LogMergePolicy(minNumSegments = 2, maxFanIn = 4))
    assert(new Searcher(spark, dir).manifest.totalDocs == 99L)
  }

  test("rollback republishes a retained snapshot as a new commit") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rollb").toString
    val docs = WebCorpus.generate(spark, 300L, 3)
    val m1 = IndexBuilder.build(spark, docs.toDF(), dir, IndexConfig(numPartitions = 4))
    val q = Query.should(Query.Term("text", "alpha"), Query.Term("text", "beta"))
    val baseline = new Searcher(spark, dir).topDocs(q, 10).map(h => (h.url, h.score)).toList

    // a "bad" mutation: delete a doc, then a retention merge
    Deleter.deleteKey(spark, dir, WebCorpus.genDoc(1L).url)
    SegmentMerger.merge(spark, dir, SegmentMerger.plan(
      IndexManifest.read(spark, dir).get, 4), keepOld = true)
    assert(new Searcher(spark, dir).manifest.totalDocs == 299L)

    val m4 = Snapshots.rollback(spark, dir, m1.commitSeq)
    assert(m4.commitSeq > m1.commitSeq)
    assert(m4.segmentIds == m1.segmentIds && m4.deletes.isEmpty)
    // rank-identical to the pre-mutation state, and itself a snapshot
    val after = new Searcher(spark, dir).topDocs(q, 10).map(h => (h.url, h.score)).toList
    assert(after == baseline)
    assert(Snapshots.list(spark, dir).contains(m4.commitSeq))
    // rolling back to an expired/unknown snapshot fails loudly
    intercept[IllegalArgumentException] { Snapshots.rollback(spark, dir, 999L) }

    // delete_all_documents: empty commit, recoverable via the snapshot log
    val wiped = Deleter.deleteAll(spark, dir)
    assert(wiped.segments.isEmpty && wiped.deletes.isEmpty)
    assert(new Searcher(spark, dir).count(q) == 0L)
    val restored = Snapshots.rollback(spark, dir, m4.commitSeq)
    assert(new Searcher(spark, dir).topDocs(q, 10).map(h => (h.url, h.score)).toList == baseline)
    assert(restored.commitSeq > wiped.commitSeq)
  }
}
