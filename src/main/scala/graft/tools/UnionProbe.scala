package graft.tools

import org.apache.spark.sql.SparkSession
import graft.search.{Occur, Query, Searcher}

/** A/B probe for the wide-disjunction union kernel: times batchCount over
  * OR-k term queries (the count path runs the union scorer DAG, not WAND).
  * Toggle the kernel with GRAFT_WIDE_UNION (999 = always linear Union,
  * 4 = BufferedUnion for >=4 legs); GRAFT_UNION_DRIVE_RATIO gates the
  * seek-driven case (1000000000 = always buffer, matching the reference).
  * Usage: UnionProbe <cores> <indexDir> [batch] [legs] [mode]
  * mode: dense  — self-driven OR-k over hot terms (union iterates itself)
  *       sparse — self-driven OR-k over rare tail terms: windows are mostly
  *                empty, so refill overhead has nothing to amortize over
  *       driven — +rareTerm (OR-k hot, msm=1): the rare must seeks the
  *                union sparsely, the worst case for window refills
  */
object UnionProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val indexDir = args(1)
    val batch = if (args.length > 2) args(2).toInt else 200
    val legs = if (args.length > 3) args(3).toInt else 8
    val mode = if (args.length > 4) args(4) else "dense"
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
    // hot Zipf vocabulary terms for the union legs; rare tail terms as the
    // selective must that drives sparse seeks in `driven` mode
    val hot = (0 until 16).map(i => f"w$i%05d")
    val rareVocab = (0 until 64).map(i => f"w${5000 + i * 53}%05d")
    val qs: Seq[Query] = (0 until batch).map { i =>
      val ts = rnd.shuffle(mode match {
        case "driven" => hot
        case "sparse" => rareVocab
        case _ => common
      }).take(legs)
      val shoulds = ts.map(t => Query.Term("text", t))
      mode match {
        case "driven" =>
          val rare = Query.Term("text", f"w${6000 + (i * 37) % 4000}%05d")
          Query.Bool((Occur.Must, rare) +: shoulds.map((Occur.Should, _)), minShouldMatch = 1)
        case _ => Query.should(shoulds: _*)
      }
    }
    searcher.batchCount(qs.take(8)) // warm
    val t0 = System.nanoTime()
    val counts = searcher.batchCount(qs)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[uprobe] mode=$mode wide=${sys.env.getOrElse("GRAFT_WIDE_UNION", "4")} " +
      f"ratio=${sys.env.getOrElse("GRAFT_UNION_DRIVE_RATIO", "4")} cores=$cores " +
      f"batch=$batch legs=$legs total=$sec%.2f s qps=${batch / sec}%.1f sum=${counts.sum}")
    spark.stop()
  }
}
