package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.agg.AggRequest

class AggRequestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("terms agg with metric sub-agg") {
    val req = """{"aggs": {"langs": {"terms": {"field": "lang", "size": 3},
                 "aggs": {"len": {"avg": {"field": "n_chars"}}}}}}"""
    val out = AggRequest.run(docs, req)("langs").collect()
    assert(out.length == 3)
    val expected = docs.groupBy("lang").count()
      .orderBy(org.apache.spark.sql.functions.col("count").desc, org.apache.spark.sql.functions.col("lang"))
      .limit(3).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.map(r => (r.getAs[String]("langs_key"), r.getAs[Long]("doc_count"))).toSeq ==
      expected.toSeq)
    assert(out.forall(r => r.getAs[Double]("len_avg") > 0))
  }

  test("histogram agg") {
    val req = """{"aggs": {"h": {"histogram": {"field": "n_chars", "interval": 100}}}}"""
    val out = AggRequest.run(docs, req)("h").collect()
    assert(out.map(_.getAs[Long]("doc_count")).sum == docs.count())
  }

  test("range agg with stats sub-agg") {
    val req = """{"aggs": {"r": {"range": {"field": "n_chars",
      "ranges": [{"to": 200}, {"from": 200, "to": 400}, {"from": 400}]},
      "aggs": {"s": {"stats": {"field": "n_chars"}}}}}}"""
    val out = AggRequest.run(docs, req)("r").collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[Long]("doc_count")).sum == docs.count())
    assert(out.forall(r => r.getAs[Long]("s_count") == r.getAs[Long]("doc_count")))
  }

  test("top-level metrics: stats, percentiles, cardinality") {
    val req = """{"aggs": {
      "st": {"stats": {"field": "n_chars"}},
      "pc": {"percentiles": {"field": "n_chars", "percents": [50, 90]}},
      "cd": {"cardinality": {"field": "lang"}}}}"""
    val outs = AggRequest.run(docs, req)
    val st = outs("st").collect()(0)
    assert(st.getAs[Long]("st_count") == docs.count())
    val pc = outs("pc").collect()(0)
    assert(pc.getAs[Double]("pc_p50") <= pc.getAs[Double]("pc_p90"))
    val cd = outs("cd").collect()(0)
    assert(cd.getAs[Long]("cd_cardinality") == 5L)
  }

  test("filter agg") {
    val req = """{"aggs": {"en_only": {"filter": {"query_string": "lang = 'en'"},
      "aggs": {"n": {"value_count": {"field": "doc_id"}}}}}}"""
    val out = AggRequest.run(docs, req)("en_only").collect()(0)
    val expected = docs.where("lang = 'en'").count()
    assert(out.getAs[Long]("doc_count") == expected)
    assert(out.getAs[Long]("n_count") == expected)
  }
}
