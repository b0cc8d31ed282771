package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.PipelineOps

/** Measures the batched-BPE latency win and pins batched == sequential on
  * real corpus text. Usage: BpeProbe <sfDir> <numMerges> [maxBatch]
  * [skipSequential]
  *
  * `skipSequential=1` times only the batched side and reports the measured
  * rounds + merges/round distribution — the deep-vocabulary (≥2k merges)
  * mode, where running the 1-merge-per-round sequential twin at the same
  * depth is the very cost the batching removes (exactness at depth is
  * carried by the acceptance rule's fuzz + the sequential-parity runs at
  * lower depth and smaller SFs).
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val numMerges = args(1).toInt
    val maxBatch = if (args.length > 2) args(2).toInt else 8
    val skipSeq = args.length > 3 && args(3) == "1"
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
    val rounds = scala.collection.mutable.ArrayBuffer.empty[Int]
    val stamps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val (bat, tBat) = timed(PipelineOps.bpeTrain(docs, numMerges,
      maxBatch = maxBatch,
      onRound = { n => rounds += n; stamps += System.nanoTime() }))
    println(f"[bpe] batch=$maxBatch:  ${bat.size} merges in $tBat%.1f s over " +
      f"${rounds.size} rounds (${bat.size.toDouble / rounds.size}%.2f merges/round; " +
      f"round sizes min=${rounds.min} p50=${rounds.sorted.apply(rounds.size / 2)} " +
      s"max=${rounds.max})")
    if (stamps.size > 1) {
      val deltas = stamps.sliding(2).map(w => (w(1) - w(0)) / 1e9).toSeq
      val byKind = rounds.tail.zip(deltas).groupBy(_._1 > 1)
      byKind.toSeq.sortBy(_._1).foreach { case (engaged, xs) =>
        val mean = xs.map(_._2).sum / xs.size
        println(f"[bpe] rounds(accepted${if (engaged) ">1" else "=1"}): " +
          f"n=${xs.size} mean wall ${mean}%.2f s")
      }
    }
    if (!skipSeq) {
      val (seq, tSeq) = timed(PipelineOps.bpeTrain(docs, numMerges))
      println(f"[bpe] sequential: ${seq.size} merges in $tSeq%.1f s " +
        f"(batched ${tSeq / tBat}%.2fx faster)")
      println(s"[bpe] identical merge tables (incl. counts): ${seq == bat}")
    }
    spark.stop()
  }
}
