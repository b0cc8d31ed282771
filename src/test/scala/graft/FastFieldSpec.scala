package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.corpus.WebCorpus
import graft.index._
import graft.search._

/** General fast fields (`/root/reference/src/fastfield/mod.rs`): typed
  * per-doc columnar values declared at build time, flattened by the Searcher
  * into named docmap columns for sort / filter / aggregation over matches —
  * checked against a driver-side oracle, across merge and delete.
  */
class FastFieldSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("fast fields flatten, sort, filter, aggregate; survive merge and delete") {
    import spark.implicits._
    val n = 300
    val dir = java.nio.file.Files.createTempDirectory("graft-ff").toString
    val src = WebCorpus.generate(spark, n.toLong, 3).toDF()
      .withColumn("nlen", length(col("text")).cast("long"))
      .withColumn("score_d", (length(col("text")) % 97).cast("double") / lit(7.0))
      .withColumn("mirror", col("url"))
    IndexBuilder.build(spark, src, dir, IndexConfig(numPartitions = 4,
      fastLongFields = Seq("nlen"),
      fastDoubleFields = Seq("score_d"),
      fastStringFields = Seq("mirror")))

    val oracle: Map[String, (Seq[String], Long, Double)] = (0L until n.toLong).map { i =>
      val d = WebCorpus.genDoc(i)
      d.url -> ((graft.analysis.Analyzer.terms(d.text).toSeq,
        d.text.length.toLong, (d.text.length % 97).toDouble / 7.0))
    }.toMap

    def checkAll(gone: Set[String] = Set.empty): Unit = {
      val live = oracle -- gone
      val s = new Searcher(spark, dir)
      // manifest carries the declared schema
      assert(s.manifest.fastFields.toSet == Set(
        FastField("nlen", "long"), FastField("score_d", "double"), FastField("mirror", "string")))
      // flattened docmap columns, typed
      val dm = s.docmapDF
      assert(dm.schema("nlen").dataType.typeName == "long")
      assert(dm.schema("score_d").dataType.typeName == "double")
      assert(dm.schema("mirror").dataType.typeName == "string")
      val got = dm.select("url", "nlen", "score_d", "mirror")
        .as[(String, Long, Double, String)].collect()
      assert(got.length == live.size)
      got.foreach { case (u, l, d, m) =>
        val (_, ol, od) = live(u)
        assert(l == ol && d == od && m == u, u)
      }
      // topDocsBy on a fast long field: matches of a term ordered by nlen
      val matched = live.collect { case (u, (toks, len, _)) if toks.contains("alpha") => (u, len) }
      val want = matched.toSeq.sortBy { case (u, len) => (-len, u) }.take(10)
      val top = s.topDocsBy(Query.Term("text", "alpha"), 10,
        Seq(col("nlen").desc, col("url").asc))
        .select("url", "nlen").as[(String, Long)].collect().toSeq
      assert(top == want)
      // filter + aggregate over matches via the docmap join (FilterCollector
      // over a fast field, no postings touched for the predicate)
      val sumLens = s.allMatches(Query.Term("text", "alpha"), scored = false)
        .join(s.docmapDF, Seq("segment", "docId"))
        .where(col("score_d") > 5.0)
        .agg(sum("nlen")).as[Long].head()
      val wantSum = live.values.collect {
        case (toks, len, d) if toks.contains("alpha") && d > 5.0 => len
      }.sum
      assert(sumLens == wantSum)
    }
    checkAll()

    // a delete, then a purging merge: the dead doc's docmap row is dropped,
    // survivors' fast-field values rebase intact (docmap rows copy through
    // the merge with new (segment, docId) addresses)
    val victim = oracle.keys.min
    Deleter.deleteTerm(spark, dir, "url", victim)
    SegmentMerger.mergeUntilStable(spark, dir,
      SegmentMerger.LogMergePolicy(minNumSegments = 2, maxFanIn = 4))
    val s2 = new Searcher(spark, dir)
    assert(s2.manifest.segments.size == 1) // everything consolidated
    checkAll(gone = Set(victim))

  }

  test("Searcher.doc fetch and search-with-aggregations over fast fields") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ff-agg").toString
    val src = WebCorpus.generate(spark, 200L, 2).toDF()
      .withColumn("nlen", length(col("text")).cast("long"))
    IndexBuilder.build(spark, src, dir, IndexConfig(numPartitions = 2,
      fastLongFields = Seq("nlen"), fastStringFields = Seq("lang")))
    val s = new Searcher(spark, dir)

    // doc(): stored fields by address, None for a bad address
    val hit = s.topDocs(Query.Term("text", "alpha"), 1).head
    val row = s.doc(hit.segment, hit.docId).get
    assert(row.getAs[String]("url") == hit.url)
    assert(row.getAs[Long]("nlen") == WebCorpus.genDoc(
      hit.url.split("p").last.toLong).text.length.toLong)
    assert(s.doc(hit.segment, 1 << 30).isEmpty)

    // aggregate(): ES tree over the query's matched set, fast-field inputs
    val json = s.aggregate(Query.Term("text", "alpha"),
      """{"by_lang": {"terms": {"field": "lang", "size": 5},
        | "aggs": {"avg_len": {"avg": {"field": "nlen"}}}}}""".stripMargin)
    val parsed = org.json4s.jackson.JsonMethods.parse(json)
    val buckets = (parsed \ "by_lang" \ "buckets").children
    assert(buckets.nonEmpty)
    val total = buckets.map(b => (b \ "doc_count").values.asInstanceOf[BigInt].toLong).sum
    assert(total == s.count(Query.Term("text", "alpha")))
    val avg = (buckets.head \ "avg_len" \ "value").values.asInstanceOf[Double]
    assert(avg > 0.0)

    // filter agg's query_string is an ENGINE query parsed by the index's
    // parser (bucket/filter.rs:170-193) — the bucket = alpha ∩ beta, not a
    // SQL predicate
    val fjson = s.aggregate(Query.Term("text", "alpha"),
      """{"with_beta": {"filter": {"query_string": "+beta"},
        | "aggs": {"m": {"avg": {"field": "nlen"}}}}}""".stripMargin)
    val fdc = (org.json4s.jackson.JsonMethods.parse(fjson) \ "with_beta" \ "doc_count")
      .values.asInstanceOf[BigInt].toLong
    assert(fdc == s.count(Query.Bool(Seq(
      Occur.Must -> Query.Term("text", "alpha"),
      Occur.Must -> Query.Term("text", "beta")))))
    assert(fdc > 0 && fdc < total)
  }

  test("multi-valued fast fields: tags filter, exploded agg, merge survival") {
    import spark.implicits._
    val n = 200
    val dir = java.nio.file.Files.createTempDirectory("graft-ffmv").toString
    // deterministic tags: doc i carries tag_{i%3} and tag_{i%5}; lens = [len, len%7]
    val src = WebCorpus.generate(spark, n.toLong, 2).toDF()
      .withColumn("tags", array(
        concat(lit("tag_"), (col("url").substr(-8, 8).cast("long") % 3)),
        concat(lit("tag_"), (col("url").substr(-8, 8).cast("long") % 5))))
      .withColumn("lens", array(length(col("text")).cast("long"),
        (length(col("text")) % 7).cast("long")))
    IndexBuilder.build(spark, src, dir, IndexConfig(numPartitions = 2,
      fastLongArrayFields = Seq("lens"), fastStringArrayFields = Seq("tags")))

    val oracle: Map[String, (Seq[String], Seq[String], Seq[Long])] = (0L until n.toLong).map { i =>
      val d = WebCorpus.genDoc(i)
      val tags = Seq(s"tag_${i % 3}", s"tag_${i % 5}")
      val lens = Seq(d.text.length.toLong, (d.text.length % 7).toLong)
      d.url -> ((graft.analysis.Analyzer.terms(d.text).toSeq, tags, lens))
    }.toMap

    def checkAll(): Unit = {
      val s = new Searcher(spark, dir)
      assert(s.manifest.fastFields.toSet ==
        Set(FastField("lens", "longs"), FastField("tags", "strings")))
      // values roundtrip per doc
      val got = s.docmapDF.select("url", "tags", "lens")
        .as[(String, Seq[String], Seq[Long])].collect()
      assert(got.length == n)
      got.foreach { case (u, tg, ln) =>
        val (_, ot, ol) = oracle(u); assert(tg == ot && ln == ol, u)
      }
      // tags filter over engine matches (array_contains on the fast column)
      val matched = s.allMatches(Query.Term("text", "alpha"), scored = false)
        .join(s.docmapDF, Seq("segment", "docId"))
        .where(array_contains(col("tags"), "tag_2"))
        .select("url").as[String].collect().toSet
      val want = oracle.collect { case (u, (toks, tg, _))
        if toks.contains("alpha") && tg.contains("tag_2") => u }.toSet
      assert(matched == want)
      // exploded aggregation: tag -> doc count
      val counts = s.docmapDF.select(explode(col("tags")).as("tag"))
        .groupBy("tag").count().as[(String, Long)].collect().toMap
      val wantCounts = oracle.values.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(counts == wantCounts)
    }
    checkAll()
    SegmentMerger.mergeUntilStable(spark, dir,
      SegmentMerger.LogMergePolicy(minNumSegments = 2, maxFanIn = 4))
    checkAll()
  }

  test("null-lenient ingestion: null text/lang/ts rows index instead of killing the build") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-nulls").toString
    val df = Seq(
      ("u0", "alpha beta", "en"),
      ("u1", null, "en"),             // null text -> doc without the field
      ("u2", "alpha gamma", null),    // null lang -> null docmap cell
      (null, "beta delta", "en"))     // null key -> "" (still addressable)
      .toDF("url", "text", "lang")
      .withColumn("warc_ts",
        when(col("url") === "u2", lit(null).cast("timestamp"))
          .otherwise(lit(java.sql.Timestamp.valueOf("2025-01-01 00:00:00"))))
    val m = IndexBuilder.build(spark, df, dir, IndexConfig(numPartitions = 2))
    assert(m.totalDocs == 4L)
    val s = new Searcher(spark, dir)
    def urls(q: Query) = s.allMatches(q, scored = false)
      .join(s.docmapDF, Seq("segment", "docId")).select("url").as[String].collect().toSet
    assert(urls(Query.Term("text", "alpha")) == Set("u0", "u2"))
    assert(urls(Query.Term("text", "beta")) == Set("u0", ""))
    assert(s.docmapDF.where(col("lang").isNull).count() == 1L)
    assert(s.docmapDF.where(col("warc_ts").isNull).count() == 1L)
  }

  test("unconfigured builds expose no fast-field columns and pay no schema cost") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ff0").toString
    val src = WebCorpus.generate(spark, 50L, 2).toDF()
    IndexBuilder.build(spark, src, dir, IndexConfig(numPartitions = 2))
    val s = new Searcher(spark, dir)
    assert(s.manifest.fastFields.isEmpty)
    assert(s.docmapDF.columns.toSeq == Seq("segment", "docId", "url", "warc_ts", "lang"))
  }
}
