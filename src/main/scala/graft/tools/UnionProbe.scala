package graft.tools

import org.apache.spark.sql.SparkSession
import graft.search.{Query, Searcher}

/** A/B probe for the wide-disjunction union kernel: times batchCount over
  * OR-k term queries (the count path runs the union scorer DAG, not WAND).
  * Toggle the kernel with GRAFT_WIDE_UNION (999 = always linear Union,
  * 4 = BufferedUnion for >=4 legs).
  * Usage: UnionProbe <cores> <indexDir> [batch] [legs]
  */
object UnionProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val indexDir = args(1)
    val batch = if (args.length > 2) args(2).toInt else 200
    val legs = if (args.length > 3) args(3).toInt else 8
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val searcher = new Searcher(spark, indexDir)
    // common terms so the unions are dense (worst case for the k-way scan)
    val common = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
      "iota", "kappa", "lambda", "mu")
    val rnd = new scala.util.Random(7)
    val qs: Seq[Query] = (0 until batch).map { _ =>
      val ts = rnd.shuffle(common).take(legs)
      Query.should(ts.map(t => Query.Term("text", t)): _*)
    }
    searcher.batchCount(qs.take(8)) // warm
    val t0 = System.nanoTime()
    val counts = searcher.batchCount(qs)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[uprobe] wide=${sys.env.getOrElse("GRAFT_WIDE_UNION", "4")} cores=$cores " +
      f"batch=$batch legs=$legs total=$sec%.2f s qps=${batch / sec}%.1f sum=${counts.sum}")
    spark.stop()
  }
}
