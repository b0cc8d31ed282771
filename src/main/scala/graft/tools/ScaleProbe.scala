package graft.tools

import org.apache.spark.sql.SparkSession
import graft.corpus.WebCorpus
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.{Query, Searcher}

/** Diagnostic: break down where build/query time goes at a given core count.
  * Usage: runMain graft.tools.ScaleProbe <cores> <numDocs>
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val numDocs = args(1).toLong
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = WebCorpus.generate(spark, numDocs, 32)
    timed("corpus gen (count only)") { docs.count() }
    timed("corpus gen + tokenize") {
      docs.mapPartitions(it => Iterator.single(it.map(d =>
        graft.analysis.Analyzer.tokenCount(d.text).toLong).sum)).reduce(_ + _)
    }
    val dir = java.nio.file.Files.createTempDirectory(s"probe$cores").toString
    timed(s"full build ($numDocs docs)") {
      IndexBuilder.build(spark, docs.toDF(), dir, IndexConfig(numPartitions = 32), resume = false)
    }
    val searcher = new Searcher(spark, dir)
    timed("first query (cold)") { searcher.topDocs(Query.Term("text", "alpha"), 10) }
    timed("10 queries (warm)") {
      for (_ <- 0 until 10) searcher.topDocs(Query.should(
        Query.Term("text", "alpha"), Query.Term("text", "beta")), 10)
    }
    timed("10 counts (warm)") {
      for (_ <- 0 until 10) searcher.count(Query.must(
        Query.Term("text", "alpha"), Query.Term("text", "beta")))
    }
    spark.stop()
  }
}
