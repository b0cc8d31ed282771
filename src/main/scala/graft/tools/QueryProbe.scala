package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import graft.search.{Occur, Query, Searcher}

/** Stage-level timing of the batched query path against an existing index.
  * Usage: QueryProbe <cores> <indexDir> [batchMultiplier]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val indexDir = args(1)
    val mult = if (args.length > 2) args(2).toInt else 40
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val taskDurs = new scala.collection.concurrent.TrieMap[Int, scala.collection.mutable.ArrayBuffer[Long]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        taskDurs.getOrElseUpdate(te.stageId, new scala.collection.mutable.ArrayBuffer[Long]())
          .synchronized { taskDurs(te.stageId) += te.taskInfo.duration }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
        if (dur > 0.3) {
          val ds = taskDurs.getOrElse(si.stageId, Nil).toArray.sorted
          val stats = if (ds.isEmpty) "" else
            f" taskMed=${ds(ds.length / 2) / 1000.0}%.2fs taskMax=${ds.last / 1000.0}%.2fs sum=${ds.sum / 1000.0}%.1fs"
          println(f"[qstage] ${si.stageId}%3d tasks=${si.numTasks}%3d wall=$dur%.1fs$stats")
        }
      }
    })
    spark.range(100000L).selectExpr("sum(id)").collect()
    val searcher = new Searcher(spark, indexDir)
    val qs: Seq[Query] = Seq(
      Query.Term("text", "alpha"),
      Query.must(Query.Term("text", "alpha"), Query.Term("text", "beta")),
      Query.should(Query.Term("text", "alpha"), Query.Term("text", "beta"), Query.Term("text", "gamma")),
      Query.Bool(Seq(Occur.Must -> Query.Term("text", "alpha"), Occur.MustNot -> Query.Term("text", "beta"))),
      Query.Phrase("text", Seq("alpha", "beta")),
      Query.should(Query.Term("text", "w00010"), Query.Term("text", "w00050"), Query.Term("text", "w00200")))
    searcher.batchTopDocs(qs, 10) // warm (footers, codegen, df stats) — as Bench does
    if (sys.env.contains("QPROBE_PER_TYPE")) {
      val names = Seq("term", "and2", "or3", "not", "phrase", "rare-or3")
      qs.zip(names).foreach { case (q, name) =>
        val b = Seq.fill(mult)(q)
        val t0 = System.nanoTime()
        searcher.batchTopDocs(b, 10)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[qtype] $name%-9s n=$mult wall=$sec%6.2f s qps=${mult / sec}%7.1f")
      }
    }
    val batch = Seq.fill(mult)(qs).flatten
    val t0 = System.nanoTime()
    val res = searcher.batchTopDocs(batch, 10)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[qprobe] cores=$cores batch=${batch.size} total=$sec%.2f s qps=${batch.size / sec}%.1f hits0=${res.head.length}")
    spark.stop()
  }
}
