package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.PipelineOps

/** Dev probe: interleaved best-of timing of the exact-Jaccard AllPairs
  * dedup — the shipped plan (df-ordered prefixes + length + positional
  * filters) vs the round-1 hash-ordered prefix plan. Interleaving + best-of
  * tolerates the host's multi-tenant capacity swings.
  * Usage: runMain graft.tools.DedupProbe [sfDir] [threshold] [reps]
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val t = if (args.length > 1) args(1).toDouble else 0.5
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]").appName("dedup-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    docs.count() // warm

    def old(): Long = {
      val sized = PipelineOps.withTokens(docs)
        .withColumn("sh", array_distinct(expr(PipelineOps.ShinglesExprSpark)))
        .select(col("doc_id"), array_sort(transform(col("sh"), s => xxhash64(s))).as("hs"))
        .withColumn("sz", size(col("hs")))
        .withColumn("plen", (col("sz") - ceil(col("sz") * t) + 1).cast("int"))
      val pref = sized.select(col("doc_id"), explode(slice(col("hs"), lit(1), col("plen"))).as("p"))
      val cand = pref.toDF("ia", "p").join(pref.toDF("ib", "p2"),
        col("p") === col("p2") && col("ia") < col("ib")).select("ia", "ib").distinct()
      cand
        .join(sized.select(col("doc_id").as("ia"), col("hs").as("ha"), col("sz").as("sza")), "ia")
        .join(sized.select(col("doc_id").as("ib"), col("hs").as("hb"), col("sz").as("szb")), "ib")
        .withColumn("inter", size(array_intersect(col("ha"), col("hb"))).cast("double"))
        .select(col("ia"), col("ib"), (col("inter") / (col("sza") + col("szb") - col("inter"))).as("j"))
        .where(col("j") >= t).count()
    }
    def nu(): Long = PipelineOps.ngramJaccardPairs(docs, t).count()

    var bestOld = Double.MaxValue
    var bestNew = Double.MaxValue
    var pairsOld = -1L
    var pairsNew = -1L
    for (_ <- 0 until reps) {
      var t0 = System.nanoTime(); pairsOld = old()
      bestOld = math.min(bestOld, (System.nanoTime() - t0) / 1e9)
      t0 = System.nanoTime(); pairsNew = nu()
      bestNew = math.min(bestNew, (System.nanoTime() - t0) / 1e9)
    }
    println(f"PROBE old best=$bestOld%.2f s pairs=$pairsOld")
    println(f"PROBE new best=$bestNew%.2f s pairs=$pairsNew")
    spark.stop()
  }
}
