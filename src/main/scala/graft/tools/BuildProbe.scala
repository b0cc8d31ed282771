package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import graft.index.{IndexBuilder, IndexConfig}

/** Stage-level timing of one index build. Usage: BuildProbe <cores> <corpusPath> */
object BuildProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val corpus = args(1)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
        println(f"[stage] ${si.stageId}%3d ${si.name.take(60)}%-60s tasks=${si.numTasks}%3d wall=$dur%.1fs")
      }
    })
    spark.range(100000L).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet(corpus)
    val dir = sys.env.getOrElse("BUILD_PROBE_DIR", s"/dev/shm/buildprobe-$cores-${System.nanoTime()}")
    val t0 = System.nanoTime()
    IndexBuilder.build(spark, docs, dir, IndexConfig(numPartitions = 32), resume = false)
    println(f"[stage] TOTAL build ${(System.nanoTime() - t0) / 1e9}%.1f s")
    if (!sys.env.contains("BUILD_PROBE_DIR")) {
      import scala.sys.process._
      Seq("rm", "-rf", dir).!
    }
    spark.stop()
  }
}
