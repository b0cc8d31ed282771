package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.PipelineOps

/** Curation ops: repetition quality filter, benchmark decontamination,
  * deterministic mixture sampling.
  */
class CurationSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("repetitionScore: repeated boilerplate scores high, unique text zero") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // all 3-grams unique
      (2L, "spam spam spam spam spam spam spam spam"), // one distinct 3-gram
      (3L, "one two three one two three one two three") // heavy repetition
    ).toDF("doc_id", "text")
    val r = PipelineOps.repetitionScore(docs)
      .select("doc_id", "dup_ngram_frac").as[(Long, Double)].collect().toMap
    assert(r(1L) == 0.0)
    assert(r(2L) > 0.8)
    assert(r(3L) > 0.5)
  }

  test("contamination: finds the planted overlap, excludes self-pairs") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "intro text then the quick brown fox jumps over the lazy dog outro"), // contains bench
      (2L, "completely unrelated words nothing shared here at all"),
      (100L, "the quick brown fox jumps over the lazy dog") // the bench doc itself
    ).toDF("doc_id", "text")
    val hits = PipelineOps.contamination(docs, bench, 3)
      .select("doc_id", "bench_id").as[(Long, Long)].collect().toSet
    assert(hits == Set((1L, 100L))) // doc 2 clean; self-pair excluded
  }

  test("stratifiedSample: deterministic across repartition, respects weights") {
    val docs = (0L until 4000L).map(i => (i, if (i % 2 == 0) "en" else "de", s"d$i"))
      .toDF("doc_id", "lang", "text")
    val w = Map("en" -> 0.5, "de" -> 0.1)
    val a = PipelineOps.stratifiedSample(docs, "lang", w)
      .select("doc_id").as[Long].collect().toSet
    val b = PipelineOps.stratifiedSample(docs.repartition(17), "lang", w)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b) // row-deterministic: partitioning can't change the sample
    val en = a.count(_ % 2 == 0).toDouble / 2000
    val de = a.count(_ % 2 == 1).toDouble / 2000
    assert(math.abs(en - 0.5) < 0.05 && math.abs(de - 0.1) < 0.03)
    // unlisted strata drop entirely
    val none = PipelineOps.stratifiedSample(docs, "lang", Map("fr" -> 1.0))
    assert(none.count() == 0L)
  }
}
