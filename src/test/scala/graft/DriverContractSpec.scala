package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke contract: entry() returns rows; every queries() entry
  * has either an oracle or is explicitly approximate; query fns run at
  * sf0.001.
  */
class DriverContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns rows") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSet == Set("rank", "doc_id", "score"))
  }

  test("every query has an oracle unless approximate") {
    val approximateOk = Set("q_ann_lsh", "q_ann_ivf", "q_ann_pq", "q_ann_ivfpq",
      "q_knn_graph_ivf", "q_percentiles_sketch", "q_snippets", "q_mlt")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- approximateOk
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without query: $orphans")
  }

  test("all queries execute at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n >= 0, name)
    }
  }
}
