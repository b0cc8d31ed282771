package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.PipelineOps

/** Measures the batched-BPE latency win and pins batched == sequential on
  * real corpus text. Usage: BpeProbe <sfDir> <numMerges> [maxBatch]
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val numMerges = args(1).toInt
    val maxBatch = if (args.length > 2) args(2).toInt else 8
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val (seq, tSeq) = timed(PipelineOps.bpeTrain(docs, numMerges))
    val (bat, tBat) = timed(PipelineOps.bpeTrain(docs, numMerges, maxBatch = maxBatch))
    println(f"[bpe] sequential: ${seq.size} merges in $tSeq%.1f s")
    println(f"[bpe] batch=$maxBatch:  ${bat.size} merges in $tBat%.1f s " +
      f"(${tSeq / tBat}%.2fx)")
    println(s"[bpe] identical merge tables (incl. counts): ${seq == bat}")
    spark.stop()
  }
}
