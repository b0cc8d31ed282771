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
    spark.stop()
  }
}
