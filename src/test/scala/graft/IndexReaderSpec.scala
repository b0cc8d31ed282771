package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.WebCorpus
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.{IndexReader, Query, ReloadPolicy, Warmer}
import graft.streaming.StreamingIndexer

/** IndexReader reload semantics (`src/reader/mod.rs`): Manual pins a
  * snapshot until reload(); OnCommitWithDelay swaps to new commits within
  * the staleness bound; warmers run on every opened snapshot before
  * queries see it.
  */
class IndexReaderSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("manual vs on-commit reload; warmers run per snapshot") {
    val dir = java.nio.file.Files.createTempDirectory("graft-reader").toString
    val docs = WebCorpus.generate(spark, 300L, 2)
    IndexBuilder.build(spark, docs.toDF(), dir, IndexConfig(numPartitions = 2))

    var warmCalls = 0
    val warmer = new Warmer {
      override def warm(s: graft.search.Searcher): Unit = { warmCalls += 1 }
    }
    val manual = IndexReader(spark, dir, ReloadPolicy.Manual, Seq(warmer))
    val onCommit = IndexReader(spark, dir, ReloadPolicy.OnCommitWithDelay(0L), Seq(warmer))
    assert(warmCalls == 2, "both readers warm their initial snapshot")

    val q = Query.Term("text", "alpha")
    val before = manual.searcher().count(q)
    assert(before > 0)
    assert(onCommit.searcher().count(q) == before)

    // a new commit: append a second batch of docs
    val more = WebCorpus.generate(spark, 200L, 2).toDF()
      .withColumn("url", org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("b-"), org.apache.spark.sql.functions.col("url")))
    StreamingIndexer.appendBatch(spark, more, dir, IndexConfig(numPartitions = 2), batchId = 0L)

    // manual: still the old snapshot
    assert(manual.searcher().count(q) == before)
    // on-commit (delay 0): sees the new commit, count grows
    val after = onCommit.searcher().count(q)
    assert(after > before, s"on-commit reader must see the append ($after vs $before)")
    assert(warmCalls == 3, "reload warms the new snapshot")

    // manual reload catches up
    manual.reload()
    assert(manual.searcher().count(q) == after)
    assert(warmCalls == 4)
  }
}
