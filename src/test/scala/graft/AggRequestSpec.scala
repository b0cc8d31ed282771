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

  test("runJson renders the nested ES result tree (agg_result.rs shape)") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val json = AggRequest.runJson(docs,
      """{"by_lang": {"terms": {"field": "lang", "size": 2},
        | "aggs": {"avgc": {"avg": {"field": "n_chars"}},
        |          "by_src": {"terms": {"field": "source", "size": 2},
        |                     "aggs": {"sumc": {"sum": {"field": "n_chars"}}}}}},
        | "total_chars": {"sum": {"field": "n_chars"}}}""".stripMargin)
    val tree = JsonMethods.parse(json)
    // root metric
    val total = (tree \ "total_chars" \ "value")
    assert(total.isInstanceOf[JDouble] || total.isInstanceOf[JInt])
    // outer terms: 2 buckets ordered by count desc, each with metric + inner buckets
    val JArray(buckets) = (tree \ "by_lang" \ "buckets"): @unchecked
    assert(buckets.length == 2)
    val counts = buckets.map(b => (b \ "doc_count") match {
      case JInt(v) => v.toLong
      case other => fail(s"doc_count $other")
    })
    assert(counts == counts.sortBy(-_), "outer buckets count-desc")
    val first = buckets.head
    assert((first \ "avgc" \ "value").isInstanceOf[JDouble])
    val JArray(inner) = (first \ "by_src" \ "buckets"): @unchecked
    assert(inner.nonEmpty && inner.length <= 2)
    assert((inner.head \ "sumc" \ "value") != JNothing)
    // inner bucket counts sum to <= outer bucket count (size-limited)
    val innerSum = inner.map(b => (b \ "doc_count").asInstanceOf[JInt].num.toLong).sum
    assert(innerSum <= counts.head)
    // oracle cross-check: outer bucket counts match a plain groupBy
    val expect = docs.groupBy("lang").count()
      .orderBy(org.apache.spark.sql.functions.col("count").desc,
        org.apache.spark.sql.functions.col("lang"))
      .limit(2).collect().map(_.getLong(1)).toList
    assert(counts == expect)
  }

  test("runJson: range from/to fields, date_histogram key_as_string, top_hits hits") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val r = JsonMethods.parse(AggRequest.runJson(docs,
      """{"r": {"range": {"field": "n_chars",
        | "ranges": [{"from": 100, "to": 400}]}}}""".stripMargin))
    val JArray(rb) = (r \ "r" \ "buckets"): @unchecked
    assert(rb.length == 3) // *-100, 100-400, 400-*
    assert((rb(1) \ "from") == JDouble(100.0) && (rb(1) \ "to") == JDouble(400.0))
    assert((rb(0) \ "key") == JString("*-100") && (rb(0) \ "from") == JNothing)

    import org.apache.spark.sql.functions._
    val ev = spark.range(3).select(
      timestamp_millis(col("id") * 86400000L).as("ts"), col("id").as("v"))
    val d = JsonMethods.parse(AggRequest.runJson(ev,
      """{"days": {"date_histogram": {"field": "ts", "fixed_interval": "1d"},
        | "aggs": {"top": {"top_hits": {"size": 1,
        |   "sort": [{"v": {"order": "desc"}}], "_source": ["v"]}}}}}""".stripMargin))
    val JArray(db) = (d \ "days" \ "buckets"): @unchecked
    assert(db.length == 3)
    assert((db.head \ "key") == JInt(0) &&
      (db.head \ "key_as_string") == JString("1970-01-01T00:00:00Z"))
    val JArray(hits) = (db.head \ "top" \ "hits"): @unchecked
    assert(hits.length == 1 && (hits.head \ "v") == JInt(0))
  }

  test("histogram default fills empty grid buckets between data min/max") {
    import org.apache.spark.sql.functions._
    // two tight clusters far apart -> guaranteed empty buckets between them
    val d = spark.range(20).select(
      (when(col("id") < 10, col("id")).otherwise(col("id") + 1000)).cast("double").as("v"))
    val out = AggRequest.run(d, """{"h": {"histogram": {"field": "v", "interval": 100}}}""")("h")
      .collect()
    val keys = out.map(_.getAs[Double]("h_key")).toSeq
    assert(keys == (0 to 10).map(_ * 100.0)) // 0,100,...,1000 — all present
    val counts = out.map(r => r.getAs[Double]("h_key") -> r.getAs[Long]("doc_count")).toMap
    assert(counts(0.0) == 10 && counts(1000.0) == 10)
    assert((1 to 9).forall(i => counts(i * 100.0) == 0)) // the filled gap
    // min_doc_count filters instead of filling (histogram.rs:59)
    val filtered = AggRequest.run(d,
      """{"h": {"histogram": {"field": "v", "interval": 100, "min_doc_count": 1}}}""")("h")
      .collect().map(_.getAs[Double]("h_key")).toSeq
    assert(filtered == Seq(0.0, 1000.0))
    // hard_bounds clips the value range (closed interval)
    val hard = AggRequest.run(d,
      """{"h": {"histogram": {"field": "v", "interval": 100,
        | "hard_bounds": {"min": 0, "max": 500}}}}""".stripMargin)("h")
      .collect().map(r => (r.getAs[Double]("h_key"), r.getAs[Long]("doc_count"))).toSeq
    assert(hard == Seq((0.0, 10L))) // cluster at 1010+ clipped away, no gap grid beyond data
  }

  test("date_histogram: offset + min_doc_count + epoch-ms grid") {
    import org.apache.spark.sql.functions._
    val d = spark.range(4).select(
      timestamp_millis(lit(86400000L * 10) + col("id") * 86400000L * 2).as("ts"))
    val out = AggRequest.run(d,
      """{"h": {"date_histogram": {"field": "ts", "fixed_interval": "1d", "min_doc_count": 1}}}""")("h")
      .collect().map(r => r.getAs[java.sql.Timestamp]("h_key").getTime).toSeq
    assert(out == Seq(10, 12, 14, 16).map(_ * 86400000L))
    // default fills the empty in-between days
    val filled = AggRequest.run(d,
      """{"h": {"date_histogram": {"field": "ts", "fixed_interval": "1d"}}}""")("h")
      .collect().map(r => (r.getAs[java.sql.Timestamp]("h_key").getTime, r.getAs[Long]("doc_count")))
    assert(filled.map(_._1).toSeq == (10 to 16).map(_ * 86400000L))
    assert(filled.count(_._2 == 0L) == 3)
    // offset shifts the grid (date_histogram.rs offset; "-6h" -> day-6h grid)
    val off = AggRequest.run(d,
      """{"h": {"date_histogram": {"field": "ts", "fixed_interval": "1d",
        | "offset": "-6h", "min_doc_count": 1}}}""".stripMargin)("h")
      .collect().map(r => r.getAs[java.sql.Timestamp]("h_key").getTime).toSeq
    assert(off == Seq(10, 12, 14, 16).map(_ * 86400000L - 6 * 3600000L + 86400000L) ||
      off == Seq(10, 12, 14, 16).map(_ * 86400000L - 6 * 3600000L))
    assert(AggRequest.durationMs("-6h") == -6 * 3600000L)
    assert(AggRequest.durationMs("500ms") == 500L)
    assert(AggRequest.durationMs("1 day") == 86400000L)
  }

  test("range: implicit *-x / x-* buckets, custom keys, zero-count kept, from/to cols") {
    import org.apache.spark.sql.functions._
    val d = spark.range(100).select((col("id") / 100.0).as("v"))
    val out = AggRequest.run(d,
      """{"r": {"range": {"field": "v", "ranges": [
        | {"key": "tiny", "from": 0.0, "to": 0.1},
        | {"from": 0.1, "to": 0.2},
        | {"from": 2.0, "to": 3.0}]}}}""".stripMargin)("r")
      .collect()
    val rows = out.map(r => (r.getAs[String]("r_key"), r.getAs[Long]("doc_count"))).toSeq
    // request order: implicit head, the three requested, implicit tail
    assert(rows == Seq(("*-0", 0L), ("tiny", 10L), ("0.1-0.2", 10L), ("2-3", 0L), ("3-*", 0L)))
    val tiny = out.find(_.getAs[String]("r_key") == "tiny").get
    assert(tiny.getAs[Double]("r_from") == 0.0 && tiny.getAs[Double]("r_to") == 0.1)
    val head = out.find(_.getAs[String]("r_key") == "*-0").get
    assert(head.isNullAt(head.fieldIndex("r_from")) && head.getAs[Double]("r_to") == 0.0)
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

  test("keyed buckets render as a map; terms carry sum_other_doc_count " +
      "(reference range.rs:677-711 / histogram.rs:1358-1391 fixtures)") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    import spark.implicits._
    // the reference's own corpus shape: fraction_f64 = i/100, score_f64 = i
    val frame = (0 until 100).map(i => (i / 100.0, i.toDouble, s"t${i % 13}"))
      .toDF("fraction_f64", "score_f64", "text")

    val ranges = JsonMethods.parse(AggRequest.runJson(frame,
      """{"range": {"range": {"field": "fraction_f64",
        | "ranges": [{"from": 0.0, "to": 0.1}, {"from": 0.1, "to": 0.2}],
        | "keyed": true}}}""".stripMargin)) \ "range" \ "buckets"
    def dc(k: String): BigInt = (ranges \ k \ "doc_count").asInstanceOf[JInt].num
    assert(ranges.isInstanceOf[JObject] &&
      ranges.asInstanceOf[JObject].obj.map(_._1).toSet ==
        Set("*-0", "0-0.1", "0.1-0.2", "0.2-*"))
    assert(dc("*-0") == 0 && dc("0-0.1") == 10 && dc("0.1-0.2") == 10 && dc("0.2-*") == 80)

    val hist = JsonMethods.parse(AggRequest.runJson(frame,
      """{"histogram": {"histogram": {"field": "score_f64", "interval": 50.0,
        | "keyed": true}}}""".stripMargin)) \ "histogram" \ "buckets"
    assert(hist.asInstanceOf[JObject].obj.map(_._1) == List("0", "50"))
    assert((hist \ "0" \ "doc_count").asInstanceOf[JInt].num == 50)

    // 13 distinct terms, size 5 → sum_other covers the other 8 buckets
    val terms = JsonMethods.parse(AggRequest.runJson(frame,
      """{"t": {"terms": {"field": "text", "size": 5,
        | "show_term_doc_count_error": true}}}""".stripMargin)) \ "t"
    val kept = (terms \ "buckets").asInstanceOf[JArray].arr
      .map(b => (b \ "doc_count").asInstanceOf[JInt].num.toLong).sum
    assert((terms \ "sum_other_doc_count").asInstanceOf[JInt].num.toLong == 100L - kept)
    assert((terms \ "doc_count_error_upper_bound").asInstanceOf[JInt].num == 0)
  }

  test("terms numeric `missing` fills null numeric keys (Key::F64, term_agg.rs:311)") {
    import spark.implicits._
    val frame = Seq[java.lang.Double](1.0, null, 1.0, 2.0, null).toDF("n")
    val out = AggRequest.run(frame,
      """{"t": {"terms": {"field": "n", "size": 10, "missing": -1}}}""")("t")
      .collect().map(r => (r.getAs[Double]("t_key"), r.getAs[Long]("doc_count"))).toSeq
    // default order: _count desc, key ASC tiebreak → -1.0 before 1.0
    assert(out == Seq((-1.0, 2L), (1.0, 2L), (2.0, 1L)))
  }

  test("reference end-to-end fixtures: agg_tests.rs level1_simple + level2 " +
      "(9-doc corpus, term-filtered, exact reference expectations)") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // get_test_index_2_segments corpus (aggregation/mod.rs:561-660)
    val corpus = Seq(
      ("cool", 1L, 1.0, 1L), ("cool", 3L, 3.0, 3L), ("cool", 5L, 5.0, 5L),
      ("nohit", 6L, 6.0, 6L), ("cool", 7L, 7.0, 7L), ("cool", 11L, 11.0, 11L),
      ("cool", 14L, 14.0, 14L), ("cool", 44L, 44.5, 44L), ("nohit", 44L, 44.5, 44L)
    ).toDF("text", "score", "score_f64", "score_i64")
    val cool = corpus.where(col("text") === "cool") // the TermQuery("cool")

    // level1_simple: avg + range with implicit *-3 / 20-* buckets
    val l1 = JsonMethods.parse(AggRequest.runJson(cool,
      """{"average": {"avg": {"field": "score"}},
        | "range": {"range": {"field": "score",
        |   "ranges": [{"from": 3.0, "to": 7.0}, {"from": 7.0, "to": 20.0}]}}}"""
        .stripMargin))
    assert((l1 \ "average" \ "value").asInstanceOf[JDouble].num == 12.142857142857142)
    val l1b = (l1 \ "range" \ "buckets").asInstanceOf[JArray].arr
    assert(l1b.map(b => ((b \ "key").asInstanceOf[JString].s,
      (b \ "doc_count").asInstanceOf[JInt].num.toInt)) ==
      List(("*-3", 1), ("3-7", 2), ("7-20", 3), ("20-*", 1)))

    // level2: three parallel ranges, each with avg + terms sub-aggs
    val rangesJson =
      """"ranges": [{"to": 3.0}, {"from": 3.0, "to": 7.0}, {"from": 7.0, "to": 19.0},
        | {"from": 19.0, "to": 20.0}, {"from": 20.0}]""".stripMargin
    val subs =
      """"aggs": {"average_in_range": {"avg": {"field": "score"}},
        | "term_agg": {"terms": {"field": "text"}}}""".stripMargin
    val l2 = JsonMethods.parse(AggRequest.runJson(cool,
      s"""{"average": {"avg": {"field": "score"}},
         | "range": {"range": {"field": "score", $rangesJson}, $subs},
         | "rangef64": {"range": {"field": "score_f64", $rangesJson}, $subs},
         | "rangei64": {"range": {"field": "score_i64", $rangesJson}, $subs}}"""
        .stripMargin))
    def bucket(agg: String, i: Int): JValue =
      (l2 \ agg \ "buckets").asInstanceOf[JArray].arr(i)
    def dc(agg: String, i: Int): Int =
      (bucket(agg, i) \ "doc_count").asInstanceOf[JInt].num.toInt
    for (agg <- Seq("range", "rangef64", "rangei64")) {
      assert((bucket(agg, 1) \ "key").asInstanceOf[JString].s == "3-7" && dc(agg, 1) == 2)
      assert(dc(agg, 2) == 3) // 7-19: scores 7, 11, 14
      assert((l2 \ agg \ "buckets").asInstanceOf[JArray].arr.length == 5) // no implicit
      assert((bucket(agg, 4) \ "key").asInstanceOf[JString].s == "20-*" && dc(agg, 4) == 1)
      assert(dc(agg, 3) == 0) // 19-20 empty, kept
      assert((bucket(agg, 3) \ "average_in_range" \ "value") == JNull)
      assert((bucket(agg, 4) \ "average_in_range" \ "value")
        .asInstanceOf[JDouble].num == 44.0)
      // 7-19 avg equal across the three aggs = (7+11+14)/3
      assert((bucket(agg, 2) \ "average_in_range" \ "value")
        .asInstanceOf[JDouble].num == 32.0 / 3.0)
      // term_agg inside a non-empty bucket: one "cool" bucket, no others
      assert((bucket(agg, 2) \ "term_agg" \ "buckets").asInstanceOf[JArray]
        .arr.map(b => ((b \ "key").asInstanceOf[JString].s,
          (b \ "doc_count").asInstanceOf[JInt].num.toInt)) == List(("cool", 3)))
      assert((bucket(agg, 2) \ "term_agg" \ "sum_other_doc_count")
        .asInstanceOf[JInt].num == 0)
    }
    assert((l2 \ "average" \ "value").asInstanceOf[JDouble].num == 12.142857142857142)

    // empty result set runs clean (reference's query_with_no_hits pass)
    val empty = JsonMethods.parse(AggRequest.runJson(
      corpus.where(col("text") === "thistermdoesnotexist"),
      s"""{"range": {"range": {"field": "score", $rangesJson}, $subs}}"""))
    assert((empty \ "range" \ "buckets").asInstanceOf[JArray]
      .arr.forall(b => (b \ "doc_count").asInstanceOf[JInt].num == 0))
  }

  test("reference terms fixtures: include/exclude, sum_other, min_doc_count " +
      "(term_agg.rs:1240-1396)") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    import spark.implicits._
    val corpus = (Seq.fill(5)("terma") ++ Seq.fill(2)("termb") :+ "termc")
      .toDF("string_id")
    def run(req: String): (List[(String, Int)], Long) = {
      val t = JsonMethods.parse(AggRequest.runJson(corpus,
        s"""{"my_texts": {"terms": {"field": "string_id"$req}}}""")) \ "my_texts"
      ((t \ "buckets").asInstanceOf[JArray].arr.map(b =>
        ((b \ "key").asInstanceOf[JString].s,
          (b \ "doc_count").asInstanceOf[JInt].num.toInt)),
        (t \ "sum_other_doc_count").asInstanceOf[JInt].num.toLong)
    }
    assert(run("") == (List(("terma", 5), ("termb", 2), ("termc", 1)), 0L))
    assert(run(""", "size": 2""") == (List(("terma", 5), ("termb", 2)), 1L))
    assert(run(""", "include": ["terma", "termc"]""") ==
      (List(("terma", 5), ("termc", 1)), 0L))
    assert(run(""", "exclude": ["termc"]""") == (List(("terma", 5), ("termb", 2)), 0L))
    assert(run(""", "include": "termb"""") == (List(("termb", 2)), 0L))
    assert(run(""", "include": "term.*", "exclude": "termc"""") ==
      (List(("terma", 5), ("termb", 2)), 0L))
    // min_doc_count-filtered buckets do not feed sum_other (reference's
    // documented behavior, term_agg.rs:1394)
    assert(run(""", "size": 2, "min_doc_count": 3""") == (List(("terma", 5)), 0L))
  }

  test("top_hits honors from offset and docvalue_fields globs (top_hits.rs:117-124)") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    import spark.implicits._
    val frame = Seq((1L, 10L), (2L, 30L), (3L, 20L), (4L, 40L)).toDF("doc_id", "n_chars")
    val res = JsonMethods.parse(AggRequest.runJson(frame,
      """{"h": {"top_hits": {"size": 2, "from": 1,
        | "sort": [{"n_chars": {"order": "desc"}}],
        | "docvalue_fields": ["doc_*"]}}}""".stripMargin)) \ "h" \ "hits"
    val hits = res.asInstanceOf[JArray].arr
    // global order by n_chars desc = 4,2,3,1; from=1 size=2 → docs 2, 3
    assert(hits.map(h => (h \ "doc_id").asInstanceOf[JInt].num.toLong) == List(2L, 3L))
    assert(hits.map(h => (h \ "h_rank").asInstanceOf[JInt].num.toInt) == List(2, 3))
    // the glob expanded against frame columns: no n_chars leak-through
    assert(hits.forall(h => (h \ "n_chars") == JNothing))
  }

  test("bool terms keys render as 0/1 with key_as_string (intermediate_agg_result.rs:84)") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    import spark.implicits._
    val frame = Seq(true, true, false).toDF("flag")
    val res = JsonMethods.parse(AggRequest.runJson(frame,
      """{"t": {"terms": {"field": "flag", "size": 10}}}""")) \ "t" \ "buckets"
    val arr = res.asInstanceOf[JArray].arr
    assert(arr.map(b => ((b \ "key").asInstanceOf[JInt].num.toInt,
      (b \ "key_as_string").asInstanceOf[JString].s,
      (b \ "doc_count").asInstanceOf[JInt].num.toInt)) ==
      List((1, "true", 2), (0, "false", 1)))
  }

  test("bucket limit guard aborts over-budget JSON aggregations (agg_limits.rs)") {
    import spark.implicits._
    val frame = (0 until 100).map(i => (s"t$i", i)).toDF("text", "n")
    val req = """{"t": {"terms": {"field": "text", "size": 100}}}"""
    val e = intercept[IllegalStateException] {
      AggRequest.runJson(frame, req, bucketLimit = 5)
    }
    assert(e.getMessage.contains("bucket limit was exceeded") &&
      e.getMessage.contains("Limit: 5"))
    // within budget: same result as unlimited
    assert(AggRequest.runJson(frame, req, bucketLimit = 100) ==
      AggRequest.runJson(frame, req))
  }

  test("range over a date field: RFC3339 labels + from/to_as_string " +
      "(reference range.rs:759-806 fixture, ms axis)") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    import spark.implicits._
    val day0 = 1546300800000L // 2019-01-01T00:00:00Z
    val ts = (0 until 6).map(i => new java.sql.Timestamp(day0 - 43200000L + i * 43200000L))
      .toDF("date") // 12h grid: 1 doc before day0, 2 inside day0, 3 after
    val res = JsonMethods.parse(AggRequest.runJson(ts,
      s"""{"date_ranges": {"range": {"field": "date",
         | "ranges": [{"to": $day0}, {"from": $day0, "to": ${day0 + 86400000L}}]}}}"""
        .stripMargin)) \ "date_ranges" \ "buckets"
    val arr = res.asInstanceOf[JArray].arr
    assert(arr.map(b => (b \ "key").asInstanceOf[JString].s) == List(
      "*-2019-01-01T00:00:00Z",
      "2019-01-01T00:00:00Z-2019-01-02T00:00:00Z",
      "2019-01-02T00:00:00Z-*"))
    assert((arr(0) \ "from_as_string") == JNothing)
    assert((arr(1) \ "from_as_string").asInstanceOf[JString].s == "2019-01-01T00:00:00Z")
    assert((arr(1) \ "to_as_string").asInstanceOf[JString].s == "2019-01-02T00:00:00Z")
    assert((arr(2) \ "from_as_string").asInstanceOf[JString].s == "2019-01-02T00:00:00Z")
    assert((arr(2) \ "to_as_string") == JNothing)
    assert(arr.map(b => (b \ "doc_count").asInstanceOf[JInt].num.toInt) == List(1, 2, 3))
    // RFC3339 strings accepted as bounds, equivalent to the ms numbers
    val byStr = JsonMethods.parse(AggRequest.runJson(ts,
      """{"date_ranges": {"range": {"field": "date",
        | "ranges": [{"to": "2019-01-01T00:00:00Z"},
        |            {"from": "2019-01-01T00:00:00Z", "to": "2019-01-02T00:00:00Z"}]}}}"""
        .stripMargin)) \ "date_ranges" \ "buckets"
    assert(byStr == res)
  }
}
