package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.agg.{AggRequest, DDSketch}

/** DDSketch: relative-error guarantee, merge associativity, serialization,
  * and the Catalyst aggregate (whole pipeline incl. partial aggregation).
  */
class DDSketchSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def exactQuantile(sorted: Array[Double], q: Double): Double =
    sorted((q * (sorted.length - 1)).toInt)

  // deterministic pseudo-random mixed-sign data with a heavy tail
  private val data: Array[Double] = {
    val rnd = new scala.util.Random(42)
    Array.tabulate(20000) { i =>
      val base = math.exp(rnd.nextGaussian() * 2.0) // lognormal
      if (i % 7 == 0) -base else if (i % 13 == 0) 0.0 else base
    }
  }

  test("quantiles within the alpha relative-error guarantee") {
    val s = new DDSketch(alpha = 0.01)
    data.foreach(s.add)
    val sorted = data.sorted
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = s.quantile(q)
      val ex = exactQuantile(sorted, q)
      if (ex == 0.0) assert(math.abs(est) <= 1e-9)
      else assert(math.abs(est - ex) <= 0.02 * math.abs(ex) + 1e-9,
        s"q=$q est=$est exact=$ex")
    }
  }

  test("merge of partial sketches equals the single-pass sketch") {
    val whole = new DDSketch()
    data.foreach(whole.add)
    val parts = data.grouped(3000).map { chunk =>
      val p = new DDSketch()
      chunk.foreach(p.add)
      p
    }.toSeq
    val merged = new DDSketch()
    parts.foreach(merged.merge)
    for (q <- Seq(0.05, 0.5, 0.95))
      assert(merged.quantile(q) == whole.quantile(q), s"q=$q")
  }

  test("serialization round-trips") {
    val s = new DDSketch()
    data.take(5000).foreach(s.add)
    val back = DDSketch.deserializeBytes(s.serializeBytes())
    for (q <- Seq(0.1, 0.5, 0.9)) assert(back.quantile(q) == s.quantile(q))
    assert(new DDSketch().quantile(0.5).isNaN)
  }

  test("bin collapse keeps memory bounded, upper quantiles keep the guarantee") {
    // the sigma=2 lognormal spans ~700 natural alpha=0.01 bins per sign;
    // 512 forces low-tail collapse while quantiles above the collapsed
    // region stay within guarantee
    val unbounded = new DDSketch(alpha = 0.01, maxBins = Int.MaxValue)
    data.foreach(unbounded.add)
    val s = new DDSketch(alpha = 0.01, maxBins = 512)
    data.foreach(s.add)
    assert(unbounded.binCounts._1 > 512, "fixture must exceed the bin budget")
    assert(s.binCounts._1 <= 512 && s.binCounts._2 <= 512)
    val sorted = data.sorted
    for (q <- Seq(0.5, 0.95)) {
      val est = s.quantile(q)
      val ex = exactQuantile(sorted, q)
      assert(math.abs(est - ex) <= 0.02 * math.abs(ex), s"q=$q est=$est exact=$ex")
    }
  }

  test("Catalyst aggregate: groupBy + partial aggregation, exact-family parity") {
    import spark.implicits._
    val df = data.toSeq.toDF("v").repartition(8) // force partial/final merge
    val row = df.agg(DDSketch.percentilesAgg(col("v"), Seq(50.0, 90.0)).as("p")).head()
    val got = row.getSeq[Double](0)
    val sorted = data.sorted
    assert(math.abs(got(0) - exactQuantile(sorted, 0.5)) <= 0.02 * math.abs(exactQuantile(sorted, 0.5)))
    assert(math.abs(got(1) - exactQuantile(sorted, 0.9)) <= 0.02 * math.abs(exactQuantile(sorted, 0.9)))

    // ES-style request with sketch: true, bucketed
    val docs = data.zipWithIndex.map { case (v, i) => (i % 3, v) }.toSeq.toDF("g", "v")
    val out = AggRequest.run(docs,
      """{"by_g": {"terms": {"field": "g", "size": 10},
        |  "aggs": {"lat": {"percentiles": {"field": "v", "percents": [50, 90], "sketch": true}}}}}"""
        .stripMargin)("by_g")
    // `__`-prefixed columns are renderer internals (sum_other_doc_count base)
    assert(out.columns.filterNot(_.startsWith("__")).toSet ==
      Set("by_g_key", "doc_count", "lat_p50", "lat_p90"))
    assert(out.count() == 3)
    val g0 = out.where(col("by_g_key") === 0).head()
    val exactG0 = data.zipWithIndex.filter(_._2 % 3 == 0).map(_._1).sorted
    val p50 = g0.getAs[Double]("lat_p50")
    val ex50 = exactQuantile(exactG0, 0.5)
    assert(math.abs(p50 - ex50) <= 0.02 * math.abs(ex50) + 1e-9)
  }
}
