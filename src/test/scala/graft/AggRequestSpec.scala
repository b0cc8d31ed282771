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

  test("terms custom order: _key, _count asc, sub-metric target") {
    import org.apache.spark.sql.functions._
    val byKeyDesc = AggRequest.run(docs,
      """{"t": {"terms": {"field": "lang", "size": 100, "order": {"_key": "desc"}}}}""")("t")
      .collect().map(_.getAs[String]("t_key")).toSeq
    assert(byKeyDesc == byKeyDesc.sorted.reverse && byKeyDesc.nonEmpty)

    val byCountAsc = AggRequest.run(docs,
      """{"t": {"terms": {"field": "lang", "size": 2, "order": {"_count": "asc"}}}}""")("t")
      .collect().map(_.getAs[Long]("doc_count")).toSeq
    val allCounts = docs.groupBy("lang").count().collect().map(_.getLong(1)).sorted.toSeq
    assert(byCountAsc == allCounts.take(2))

    // order by avg(n_chars) desc — the survivors of size=2 prove the target
    val bySub = AggRequest.run(docs,
      """{"t": {"terms": {"field": "source", "size": 2, "order": {"m": "desc"}},
        | "aggs": {"m": {"avg": {"field": "n_chars"}}}}}""".stripMargin)("t")
      .collect().map(r => (r.getAs[String]("t_key"), r.getAs[Double]("m_avg")))
    val expected = docs.groupBy("source").agg(avg("n_chars").as("a"))
      .orderBy(col("a").desc, col("source")).limit(2)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(bySub.toSeq == expected.toSeq)

    // per-parent: top-1 source by sum inside each lang == window oracle
    val nested = AggRequest.run(docs,
      """{"l": {"terms": {"field": "lang", "size": 100},
        | "aggs": {"s": {"terms": {"field": "source", "size": 1, "order": {"m": "desc"}},
        |                "aggs": {"m": {"sum": {"field": "n_chars"}}}}}}}""".stripMargin)("l")
      .collect().map(r => (r.getAs[String]("l_key"), r.getAs[String]("s_key"))).toMap
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy(col("m").desc, col("source"))
    val oracle = docs.groupBy("lang", "source").agg(sum("n_chars").as("m"))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(nested == oracle)
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

  test("nested terms: per-parent size, intermediate metrics kept") {
    import org.apache.spark.sql.functions._
    val req = """{"aggs": {"by_lang": {"terms": {"field": "lang", "size": 10},
      "aggs": {"avgc": {"avg": {"field": "n_chars"}},
               "by_src": {"terms": {"field": "source", "size": 2},
                          "aggs": {"sumc": {"sum": {"field": "n_chars"}}}}}}}}"""
    val out = AggRequest.run(docs, req)("by_lang")
    val rows = out.collect()
    // per-parent size: at most 2 source buckets per lang
    val perLang = rows.groupBy(_.getAs[String]("by_lang_key"))
    assert(perLang.values.forall(_.length <= 2))
    // the kept sources are each lang's top-2 by count (desc, key asc)
    val expTop = docs.groupBy("lang", "source").count().collect()
      .groupBy(_.getString(0)).map { case (l, rs) =>
        l -> rs.sortBy(r => (-r.getLong(2), r.getString(1))).take(2)
          .map(r => (r.getString(1), r.getLong(2))).toSeq
      }
    perLang.foreach { case (l, rs) =>
      val got = rs.sortBy(r => (-r.getAs[Long]("doc_count"), r.getAs[String]("by_src_key")))
        .map(r => (r.getAs[String]("by_src_key"), r.getAs[Long]("doc_count"))).toSeq
      assert(got == expTop(l), l)
    }
    // intermediate metrics: parent avg + parent doc_count on every leaf row
    val expLang = docs.groupBy("lang")
      .agg(count(lit(1)).as("c"), avg("n_chars").as("a")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    rows.foreach { r =>
      val (c, a) = expLang(r.getAs[String]("by_lang_key"))
      assert(r.getAs[Long]("by_lang_doc_count") == c)
      assert(math.abs(r.getAs[Double]("avgc_avg") - a) < 1e-9)
    }
  }

  test("top_hits inside terms: per-bucket hits with doc_count") {
    val req = """{"aggs": {"by_lang": {"terms": {"field": "lang", "size": 10},
      "aggs": {"hits": {"top_hits": {"size": 2,
        "sort": [{"n_chars": {"order": "desc"}}, {"doc_id": {"order": "asc"}}],
        "_source": ["doc_id", "n_chars"]}}}}}}"""
    val rows = AggRequest.run(docs, req)("by_lang").collect()
    val perLang = rows.groupBy(_.getAs[String]("by_lang_key"))
    assert(perLang.values.forall(_.length == 2))
    val exp = docs.collect().map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"),
      r.getAs[Long]("n_chars"))).groupBy(_._1)
    perLang.foreach { case (l, rs) =>
      val want = exp(l).sortBy(t => (-t._3, t._2)).take(2).map(t => (t._2, t._3)).toSeq
      val got = rs.sortBy(_.getAs[Int]("hits_rank")).map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[Long]("n_chars"))).toSeq
      assert(got == want, l)
      assert(rs.forall(_.getAs[Long]("doc_count") == exp(l).length.toLong))
    }
  }

  test("nested histogram materializes extended_bounds per parent bucket") {
    val req = """{"aggs": {"by_lang": {"terms": {"field": "lang", "size": 10},
      "aggs": {"h": {"histogram": {"field": "n_chars", "interval": 2000,
        "extended_bounds": {"min": 0, "max": 8000}}}}}}}"""
    val rows = AggRequest.run(docs, req)("by_lang").collect()
    val perLang = rows.groupBy(_.getAs[String]("by_lang_key"))
    // every parent shows the full [0, 8000] bucket range (5 buckets)
    perLang.values.foreach(rs =>
      assert(rs.map(_.getAs[Double]("h_key")).sorted.toSeq ==
        Seq(0.0, 2000.0, 4000.0, 6000.0, 8000.0)))
    assert(rows.map(_.getAs[Long]("doc_count")).sum == docs.count())
  }
}
