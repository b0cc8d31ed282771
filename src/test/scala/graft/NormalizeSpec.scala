package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.NormalizeText
import graft.ops.PipelineOps

/** normalize_text: NFC + C0/DEL->space + ASCII-space-run collapse + trim,
  * checked against an independent java.util.regex reformulation and for
  * the algebraic properties the pipeline relies on (idempotence, NFC
  * fingerprint convergence). All non-ASCII test characters are built from
  * unicode escapes so no editor/normalizer can silently recompose them.
  */
class NormalizeSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent formulation: the same function via Normalizer + regex
    * (the Scala kernel walks chars manually; this composes replaceAlls).
    */
  private def oracle(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      .replaceAll("[\\x00-\\x1f\\x7f]", " ")
      .replaceAll(" +", " ")
      .replaceAll("^ | $", "")

  private val eAcute = "\u00e9"     // precomposed e-acute
  private val combAcute = "\u0301"  // combining acute
  private val bel = "\u0007"
  private val del = "\u007f"
  private val nbsp = "\u00a0"

  test("directed: controls, tabs, runs, trim, NFC composition") {
    // cafe + U+0301 composes to cafe-acute; BEL and DEL become spaces
    assert(NormalizeText.normalize(
      "  a\t\tb  cafe" + combAcute + "  x" + bel + del + "y  ")
      == "a b caf" + eAcute + " x y")
    assert(NormalizeText.normalize("") == "")
    assert(NormalizeText.normalize(" \t\r\n ") == "")
    assert(NormalizeText.normalize("plain ascii stays") == "plain ascii stays")
    // NBSP is content, not layout: survives and does not collapse
    assert(NormalizeText.normalize("a" + nbsp + nbsp + "b") == "a" + nbsp + nbsp + "b")
    // already-composed text is untouched
    assert(NormalizeText.normalize("caf" + eAcute) == "caf" + eAcute)
  }

  test("decomposed and precomposed inputs converge to one fingerprint") {
    val decomposed = NormalizeText.normalize("re" + combAcute + "sume" + combAcute + " notes")
    val precomposed = NormalizeText.normalize("r" + eAcute + "sum" + eAcute + " notes")
    assert(decomposed == precomposed)
  }

  test("fuzz: matches the independent regex formulation; idempotent") {
    val rnd = new scala.util.Random(42)
    val pool: Array[Char] = (Seq('a', 'b', 'Z', '9', ' ', ' ', ' ', '\t', '\n', '\r') ++
      Seq(0x0000, 0x0007, 0x007f, 0x00e9, 0x0301, 0x0308, 0x00a0, 0x4e2d, 0x00df).map(_.toChar)).toArray
    for (_ <- 0 until 2000) {
      val s = Seq.fill(rnd.nextInt(24))(pool(rnd.nextInt(pool.length))).mkString
      val got = NormalizeText.normalize(s)
      assert(got == oracle(s), s"input=${s.map(c => f"u+${c.toInt}%04x").mkString(" ")}")
      assert(NormalizeText.normalize(got) == got, "idempotence")
    }
  }

  test("DataFrame op + SQL function agree with the direct kernel") {
    val rows = Seq((1L, "  x\t\tcafe" + combAcute + "  "), (2L, "a b"), (3L, ""))
    val df = rows.toDF("doc_id", "text")
    val viaOp = PipelineOps.normalizeText(df)
      .select("doc_id", "norm_text").as[(Long, String)].collect().toMap
    GraftFunctions.registerAll(spark)
    val viaSql = df.selectExpr("doc_id", "normalize_text(text) AS n")
      .as[(Long, String)].collect().toMap
    val want = rows.map { case (id, t) => id -> NormalizeText.normalize(t) }.toMap
    assert(viaOp == want && viaSql == want)
  }
}
