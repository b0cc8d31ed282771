package graft.tools

import org.apache.spark.sql.SparkSession

/** Times named SparkEntry queries in isolation (reps back-to-back, so rep 1
  * carries codegen/footer warmup and later reps show steady state).
  * Usage: EntryTimeProbe <cores> <sfDir> <reps> <queryName>[,<queryName>...]
  */
object EntryTimeProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val sfDir = args(1)
    val reps = args(2).toInt
    val names = args(3).split(",").toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1 << 20).selectExpr("sum(id)").count()
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      for (r <- 1 to reps) {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // analyze + optimize + physical plan
        val t2 = System.nanoTime()
        val n = df.count()
        val t3 = System.nanoTime()
        println(f"[etp] $name%-20s cores=$cores rep=$r build=${(t1 - t0) / 1e9}%5.2f " +
          f"plan=${(t2 - t1) / 1e9}%5.2f exec=${(t3 - t2) / 1e9}%6.2f s rows=$n")
        if (r == 1 && sys.env.contains("GRAFT_ETP_PLANSTATS")) {
          val p = df.queryExecution.optimizedPlan.toString
          val occ = Seq("md5", "transform", "aggregate", "array_min")
            .map(k => s"$k=${k.r.findAllIn(p).size}").mkString(" ")
          println(s"[etp] $name planLen=${p.length} $occ")
        }
      }
    }
    spark.stop()
  }
}
