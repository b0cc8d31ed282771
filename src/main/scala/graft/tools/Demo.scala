package graft.tools

import org.apache.spark.sql.SparkSession

/** Runnable surface for the library: generates a corpus slice through Spark,
  * exercises the public analyzer/codec/scoring APIs end-to-end, prints what
  * it sees. Grows with the engine; used by /verify sessions.
  *
  * Usage: sbt "runMain graft.tools.Demo [numDocs]"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val numDocs = if (args.nonEmpty) args(0).toLong else 1000L
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = graft.corpus.WebCorpus.generate(spark, numDocs, 8).cache()
    println(s"corpus: ${docs.count()} docs")
    docs.show(3, truncate = 60)

    // per-row invariant, distributed
    val bad = docs.filter(d => graft.corpus.WebCorpus.extractText(d.html) != d.text).count()
    println(s"extraction invariant violations: $bad")

    // tokenize through the public analyzer, build one posting list for 'alpha'
    val alphaDocs = docs.sort("url").collect().zipWithIndex.collect {
      case (d, i) if graft.analysis.Analyzer.terms(d.text).contains("alpha") => i
    }
    println(s"alpha docFreq (driver check) = ${alphaDocs.length}")
    val enc = graft.codec.PostingsCodec.encode(
      alphaDocs, Array.fill(alphaDocs.length)(1), null, _ => 0.toByte, withFreqs = true)
    val it = new graft.codec.SegmentPostings(enc.docFreq, enc.postings, enc.skip, enc.positions, readFreqs = true)
    var n = 0
    while (!it.isTerminated) { n += 1; it.advance() }
    println(s"decoded postings count = $n (postings ${enc.postings.length} B, skip ${enc.skip.length} B)")

    val w = graft.search.Bm25.forOneTerm(alphaDocs.length.toLong, numDocs, 100.0f)
    println(s"bm25 weight=${w.weight} score(dl=100,tf=1)=${w.score(graft.index.FieldNorms.fieldNormToId(100), 1)}")

    // full pipeline: distributed index build -> manifest -> BM25 top-k search
    import graft.index.{IndexBuilder, IndexConfig}
    import graft.search.{Query, Searcher, Occur}
    val indexDir = java.nio.file.Files.createTempDirectory("graft-demo-index").toString
    val manifest = IndexBuilder.build(spark, docs.toDF(), indexDir, IndexConfig(numPartitions = 8))
    println(s"index built: ${manifest.segments.size} segments, ${manifest.totalDocs} docs, " +
      s"${manifest.segments.map(_.postingsBytes).sum} postings bytes, " +
      f"${manifest.segments.map(_.docsPerSec).min}%.0f..${manifest.segments.map(_.docsPerSec).max}%.0f docs/sec/segment")
    val searcher = new Searcher(spark, indexDir)
    for (q <- Seq[(String, Query)](
        "alpha" -> Query.Term("text", "alpha"),
        "+alpha +beta" -> Query.must(Query.Term("text", "alpha"), Query.Term("text", "beta")),
        "alpha OR gamma" -> Query.should(Query.Term("text", "alpha"), Query.Term("text", "gamma")),
        "+alpha -beta" -> Query.Bool(Seq(Occur.Must -> Query.Term("text", "alpha"),
          Occur.MustNot -> Query.Term("text", "beta"))))) {
      val hits = searcher.topDocs(q._2, 5)
      println(s"query '${q._1}': count=${searcher.count(q._2)} top=" +
        hits.map(h => f"${h.url}#${h.score}%.4f").mkString(", "))
    }

    // parser + hierarchical merge drive
    val parser = new graft.search.QueryParser("text")
    val parsed = parser.parse("+alpha beta -gamma")
    println(s"parsed query: $parsed -> count=${searcher.count(parsed)}")
    val m2 = graft.index.SegmentMerger.merge(spark, indexDir,
      graft.index.SegmentMerger.plan(manifest, 4))
    val postMerge = new graft.search.Searcher(spark, indexDir)
    val hit0 = postMerge.topDocs(Query.Term("text", "alpha"), 3)
    println(s"after merge: ${m2.segments.size} segments (fanIn=${m2.segments.map(_.mergeFanIn).mkString(",")}), " +
      s"alpha top1=${hit0.head.url}#${hit0.head.score}")
    spark.stop()
  }
}
