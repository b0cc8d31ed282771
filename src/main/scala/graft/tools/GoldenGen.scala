package graft.tools

import org.apache.spark.sql.SparkSession
import graft.corpus.WebCorpus
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.{Query, QueryParser, Searcher}

/** Generates the committed golden results for the reference query set
  * (FIXTURES.md §3): 10k-doc corpus, 4 partitions, top-10 per query with
  * exact f32 score bits. Output JSON goes to src/test/resources/golden/.
  * GoldenSpec re-runs the set and compares verbatim — the cross-round
  * rank-identity pin.
  */
object GoldenGen {

  val NumDocs = 10000L
  val NumParts = 4
  val K = 10

  def querySet: Seq[(String, String)] = {
    val fixed = Seq(
      "single_alpha" -> "alpha",
      "single_beta" -> "beta",
      "single_gamma" -> "gamma",
      "single_w00000" -> "w00000",
      "single_w09999" -> "w09999",
      "single_missing" -> "zzz",
      "and_alpha_beta" -> "+alpha +beta",
      "and_alpha_beta_gamma" -> "+alpha +beta +gamma",
      "and_w1_w2" -> "+w00001 +w00002",
      "or_default_should" -> "alpha beta",
      "or_alpha_gamma" -> "alpha OR gamma",
      "or_w3_w4_w5" -> "w00003 OR w00004 OR w00005",
      "req_not" -> "+alpha -beta",
      "req_opt" -> "+alpha beta gamma",
      "not_rare" -> "alpha -w00006",
      "phrase_alpha_beta" -> "\"alpha beta\"",
      "phrase_slop2" -> "\"alpha beta\"~2",
      "url_exact" -> ("url:\"" + WebCorpus.genDoc(7L).url + "\""),
      "prefix_w004" -> "w004*",
      "boost_mix" -> "alpha^2 beta")
    val rnd = new scala.util.Random(2026)
    val rand = (0 until 10).map { i =>
      val n = 2 + rnd.nextInt(2)
      val terms = Seq.fill(n)(f"w${rnd.nextInt(300)}%05d")
      val op = if (i % 2 == 0) " OR " else " AND "
      s"rand_$i" -> terms.mkString(op)
    }
    fixed ++ rand
  }

  def run(spark: SparkSession, indexDir: String): Seq[(String, Seq[(Int, String, Int)])] = {
    val searcher = new Searcher(spark, indexDir)
    val parser = new QueryParser("text")
    querySet.map { case (name, qstr) =>
      val hits = searcher.topDocs(parser.parse(qstr), K)
      name -> hits.map(h => (h.rank, h.url, java.lang.Float.floatToIntBits(h.score))).toSeq
    }
  }

  def buildIndex(spark: SparkSession): String = {
    import spark.implicits._
    val dir = "/tmp/graft-golden-index"
    if (graft.index.IndexManifest.read(spark, dir)
        .forall(_.version != graft.index.IndexManifest.FormatVersion)) {
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      val docs = WebCorpus.generate(spark, NumDocs, 8)
      IndexBuilder.build(spark, docs.toDF(), dir, IndexConfig(numPartitions = NumParts))
    }
    dir
  }

  def toJson(results: Seq[(String, Seq[(Int, String, Int)])]): String = {
    val sb = new StringBuilder("{\n")
    results.zipWithIndex.foreach { case ((name, hits), i) =>
      sb.append("  \"").append(name).append("\": [")
      sb.append(hits.map { case (r, u, s) => s"""[$r,"$u",$s]""" }.mkString(","))
      sb.append("]")
      if (i < results.size - 1) sb.append(",")
      sb.append("\n")
    }
    sb.append("}\n").toString
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = buildIndex(spark)
    val results = run(spark, dir)
    val out = java.nio.file.Paths.get("src/test/resources/golden/queries.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.writeString(out, toJson(results))
    println(s"wrote ${results.size} golden queries to $out")
    results.take(3).foreach { case (n, hits) => println(s"  $n: ${hits.take(2)}") }
    spark.stop()
  }
}
