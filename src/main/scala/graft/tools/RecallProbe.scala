package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.PipelineOps

/** Prints the raw recall / cluster-agreement fractions behind the gated
  * driver rows (q_ann_*, q_knn_graph_ivf, q_sem_dedup_ivf,
  * q_mutual_knn_ivf) on a real testdata SF — for choosing honest gate
  * parameters. Usage: RecallProbe <sfDir>
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")

    def recall(name: String, approx: org.apache.spark.sql.DataFrame,
        exact: org.apache.spark.sql.DataFrame, keys: Seq[String]): Unit = {
      val a = approx.select(keys.map(col): _*)
      val x = exact.select(keys.map(col): _*)
      val hits = a.intersect(x).count()
      val nx = x.count()
      println(f"[recall] $name%-22s hits=$hits/$nx  recall=${hits.toDouble / nx}%.3f")
    }

    val exactTop = PipelineOps.cosineTopK(e, 0L, 10)
    recall("ann_lsh(h=1)", PipelineOps.annTopK(e, 0L, 10, 8), exactTop, Seq("vec_id"))
    recall("ann_lsh(h=2)", PipelineOps.annTopK(e, 0L, 10, 8, maxHamming = 2), exactTop, Seq("vec_id"))
    recall("ann_ivf(16,4)", PipelineOps.ivfTopK(e, 0L, 10, 16, 4), exactTop, Seq("vec_id"))
    recall("ann_ivf(16,6)", PipelineOps.ivfTopK(e, 0L, 10, 16, 6), exactTop, Seq("vec_id"))
    recall("ann_ivf(16,8)", PipelineOps.ivfTopK(e, 0L, 10, 16, 8), exactTop, Seq("vec_id"))
    recall("ann_pq", PipelineOps.pqTopK(e, 0L, 10, m = 8, rerank = 50), exactTop, Seq("vec_id"))
    recall("ann_ivfpq(16,4)", PipelineOps.ivfPqTopK(e, 0L, 10, 16, 4, 8, 50), exactTop, Seq("vec_id"))
    recall("ann_ivfpq(16,8)", PipelineOps.ivfPqTopK(e, 0L, 10, 16, 8, 8, 50), exactTop, Seq("vec_id"))

    val exactG = PipelineOps.knnGraph(e, 3)
    recall("knn_graph_ivf(16,4)", PipelineOps.knnGraphIvf(e, 3, 16, 4), exactG, Seq("vec_id", "nb_id"))
    recall("knn_graph_ivf(16,6)", PipelineOps.knnGraphIvf(e, 3, 16, 6), exactG, Seq("vec_id", "nb_id"))

    def agree(name: String, a: org.apache.spark.sql.DataFrame,
        x: org.apache.spark.sql.DataFrame, lab: String): Unit = {
      val j = a.select(col("vec_id"), col(lab).as("al"))
        .join(x.select(col("vec_id"), col(lab).as("xl")), "vec_id")
      val n = j.count()
      val ag = j.where(col("al") === col("xl")).count()
      println(f"[agree] $name%-22s agree=$ag/$n  frac=${ag.toDouble / n}%.3f")
    }
    val sdExact = PipelineOps.semDedup(e, 0.35)
    for (nc <- Seq(8, 16, 32)) {
      agree(s"sem_dedup_ivf(c=$nc)", PipelineOps.semDedup(e, 0.35,
        Some(PipelineOps.embeddingNearDupPairsIvf(e, 0.35, nc))), sdExact, "canonical_id")
    }
    val cpExact = PipelineOps.contrastivePairs(e, 2, 0.3, 0.9, 2, 0.1, 0.3)
    for (np <- Seq(4, 8)) {
      recall(s"contrastive_ivf(16,$np)", PipelineOps.contrastivePairs(
        e, 2, 0.3, 0.9, 2, 0.1, 0.3, candidatePairs = Some(
          PipelineOps.embeddingNearDupPairsIvf(e, 0.1, 16, nprobe = np))),
        cpExact, Seq("vec_id", "pair_id"))
    }

    val mkExact = PipelineOps.mutualKnnClusters(e, 3)
    for ((nc, np) <- Seq((16, 4), (16, 6), (16, 8))) {
      agree(s"mutual_knn_ivf($nc,$np)", PipelineOps.mutualKnnClusters(e, 3, graph = Some(
        PipelineOps.knnGraphIvf(e, 3, nc, np).select(col("vec_id"), col("nb_id")))),
        mkExact, "cluster_id")
    }
    spark.stop()
  }
}
