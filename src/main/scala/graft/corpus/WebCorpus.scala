package graft.corpus

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}

/** One Common-Crawl-style web page, the input-table shape from
  * BASELINE.json input_hint:
  * (url:string, warc_ts:timestamp, html:binary, text:string, lang:string).
  */
final case class WebDoc(url: String, warc_ts: Timestamp, html: Array[Byte], text: String, lang: String)

/** Deterministic synthetic webtext corpus (FIXTURES.md §1-2). Fully
  * order-independent: doc i is generated from `new Random(Seed + i)` alone,
  * so any partitioning/parallelism yields the identical corpus — the
  * prerequisite for the N-vs-4N scaling evidence and for docId determinism.
  *
  * Text model: 10,000-term Zipf(s=1.1) vocabulary `w00000..w09999` (hot-term
  * skew for salting tests) + sentinel terms with controlled selectivity —
  * `alpha` ~50% of docs, `beta` ~10%, `gamma` ~1% — mirroring the
  * reference's a/b/c bench corpus (`/root/reference/benches/and_or_queries.rs:29-60`).
  * Doc length 5..400 tokens, log-uniform (covers the exact fieldnorm range
  * <=40 and several geometric buckets).
  */
object WebCorpus {

  val Seed = 42L
  val VocabSize = 10000
  val Epoch = 1735689600000L // 2025-01-01T00:00:00Z

  // Zipf(s=1.1) cumulative distribution over ranks 1..VocabSize
  private lazy val zipfCum: Array[Double] = {
    val w = Array.tabulate(VocabSize)(i => 1.0 / math.pow(i + 1.0, 1.1))
    val cum = new Array[Double](VocabSize)
    var s = 0.0
    var i = 0
    while (i < VocabSize) { s += w(i); cum(i) = s; i += 1 }
    i = 0
    while (i < VocabSize) { cum(i) /= s; i += 1 }
    cum
  }

  private def zipfDraw(u: Double): Int = {
    var lo = 0
    var hi = VocabSize - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (zipfCum(mid) < u) lo = mid + 1 else hi = mid
    }
    lo
  }

  def escapeHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  def unescapeHtml(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")

  /** The per-row invariant's left side: extract the body text back out of the
    * generated html. Byte-identical to `text` for every generated doc.
    */
  def extractText(html: Array[Byte]): String = {
    val s = new String(html, java.nio.charset.StandardCharsets.UTF_8)
    val start = s.indexOf("<p>") + 3
    val end = s.lastIndexOf("</p>")
    unescapeHtml(s.substring(start, end))
  }

  def genText(i: Long): String = {
    val rnd = new scala.util.Random(Seed + i)
    // log-uniform length in [5, 400]
    val len = math.max(5, math.round(math.exp(rnd.nextDouble() * math.log(400.0 / 5.0)) * 5.0).toInt)
    val sb = new java.lang.StringBuilder(len * 7)
    var t = 0
    while (t < len) {
      if (t > 0) sb.append(' ')
      sb.append(f"w${zipfDraw(rnd.nextDouble())}%05d")
      t += 1
    }
    // sentinels with controlled selectivity, at deterministic offsets
    val parts = new scala.collection.mutable.ArrayBuffer[String]()
    parts += sb.toString
    if (rnd.nextDouble() < 0.50) parts.insert(rnd.nextInt(parts.size + 1), "alpha")
    if (rnd.nextDouble() < 0.10) parts.insert(rnd.nextInt(parts.size + 1), "beta")
    if (rnd.nextDouble() < 0.01) parts.insert(rnd.nextInt(parts.size + 1), "gamma")
    // a pinch of case/length edge cases on ~0.5% of docs
    if (rnd.nextDouble() < 0.005) {
      parts += "MixedCASE"
      parts += ("x" * 45) // >= 40 utf-8 bytes -> removed by remove_long
    }
    parts.mkString(" ")
  }

  def genDoc(i: Long): WebDoc = {
    val text = genText(i)
    val host = math.abs((i * 2654435761L) % 97)
    val url = f"https://host$host%02d.example/p$i%08d"
    val html = ("<html><head><title>doc " + i + "</title></head><body><p>" +
      escapeHtml(text) + "</p></body></html>").getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val lang = {
      val h = ((i * 1103515245L + 12345L) >>> 16) % 100
      if (h < 95) "en" else if (h < 98) "de" else "fr"
    }
    WebDoc(url, new Timestamp(Epoch + i * 1000L), html, text, lang)
  }

  /** Distributed generation: `numDocs` docs across `parallelism` tasks; the
    * result is identical for any `parallelism` (per-doc seeding).
    */
  def generate(spark: SparkSession, numDocs: Long, parallelism: Int): Dataset[WebDoc] = {
    import spark.implicits._
    spark.range(0, numDocs, 1, parallelism).mapPartitions(it => it.map(i => genDoc(i.longValue)))
  }
}
