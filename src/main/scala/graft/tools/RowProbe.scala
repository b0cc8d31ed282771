package graft.tools

import org.apache.spark.sql.SparkSession

/** Runs named SparkEntry queries and prints their collected rows — for
  * sanity-checking gate rows at SFs the driver does not run.
  * Usage: RowProbe <sfDir> <name>[,<name>...]
  */
object RowProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args(1).split(",")) {
      val df = graft.SparkEntry.queries(name)(spark, args(0))
      val rows = df.limit(20).collect()
      println(s"[rowprobe] $name cols=${df.columns.mkString(",")}")
      rows.foreach(r => println(s"[rowprobe]   $r"))
    }
    spark.stop()
  }
}
