package graft.tools

import org.apache.spark.sql.SparkSession
import graft.corpus.WebCorpus

/** Stage the deterministic synthetic webtext corpus to Parquet.
  * Usage: CorpusGen <numDocs> <outPath> [partitions=32]
  */
object CorpusGen {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val out = args(1)
    val parts = if (args.length > 2) args(2).toInt else 32
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    WebCorpus.generate(spark, n, parts).toDF()
      .select("url", "warc_ts", "text", "lang")
      .write.mode("overwrite").parquet(out)
    println(s"[corpusgen] $n docs -> $out")
    spark.stop()
  }
}
