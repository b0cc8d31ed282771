package graft.tools

import org.apache.spark.sql.SparkSession
import graft.corpus.WebCorpus

/** Stage the deterministic synthetic webtext corpus to Parquet.
  * Usage: StageCorpus <numDocs> <outPath>
  */
object StageCorpus {
  def main(args: Array[String]): Unit = {
    val numDocs = args(0).toLong
    val out = args(1)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    WebCorpus.generate(spark, numDocs, 32).toDF()
      .select("url", "warc_ts", "text", "lang")
      .write.mode("overwrite").parquet(out)
    println(s"[stage-corpus] $numDocs docs -> $out")
    spark.stop()
  }
}
