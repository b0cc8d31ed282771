package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the physical plans of the hot paths so pushdown/pruning claims are
  * verifiable: the postings term lookup must show PushedFilters on (field,
  * term) and a pruned ReadSchema; pipeline ops must stay inside
  * WholeStageCodegen.
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sfDir = "/root/testdata/sf0.001"
    val searcher = graft.SparkEntry.searcherFor(spark, sfDir)

    println("==== postings term-lookup scan (docFreqs path) ====")
    val indexDir = "/tmp/graft-index-" + java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    spark.read.parquet(s"$indexDir/postings")
      .where(col("field") === "text" && col("term").isin("spark", "table"))
      .groupBy("field", "term").agg(sum("docFreq"))
      .explain("formatted")

    println("==== docmap fetch (doc-store join) ====")
    searcher.docmapDF.where(col("segment") === 0 && col("docId") === 5).explain("formatted")

    println("==== dedup minhash signatures (explode + groupBy) ====")
    graft.ops.PipelineOps.dedupMinHash(
      spark.read.parquet(s"$sfDir/documents.parquet"), 0.5).explain("formatted")

    println("==== fast-field range (Catalyst-native) ====")
    spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("n_chars") >= 200 && col("n_chars") < 400).select("doc_id")
      .explain("formatted")
    spark.stop()
  }
}
