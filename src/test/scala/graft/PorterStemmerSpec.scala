package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.{Analyzer, PorterStemmer}

/** Porter stemmer against the canonical examples from the 1980 paper
  * (one per rule), plus chain composition.
  */
class PorterStemmerSpec extends AnyFunSuite {

  private val golden = Seq(
    // step 1a
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    // step 1b
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file",
    // step 1c
    "happy" -> "happi", "sky" -> "sky",
    // step 2
    "relational" -> "relat", "conditional" -> "condit", "rational" -> "ration",
    "valenci" -> "valenc", "hesitanci" -> "hesit", "digitizer" -> "digit",
    "radicalli" -> "radic", "differentli" -> "differ", "vileli" -> "vile",
    "analogousli" -> "analog", "vietnamization" -> "vietnam",
    "predication" -> "predic", "operator" -> "oper", "feudalism" -> "feudal",
    "decisiveness" -> "decis", "hopefulness" -> "hope", "callousness" -> "callous",
    "formaliti" -> "formal", "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
    // step 3
    "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
    "electriciti" -> "electr", "electrical" -> "electr", "hopeful" -> "hope",
    "goodness" -> "good",
    // step 4
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop", "adjustable" -> "adjust",
    "defensible" -> "defens", "irritant" -> "irrit", "replacement" -> "replac",
    "adjustment" -> "adjust", "dependent" -> "depend", "adoption" -> "adopt",
    "homologou" -> "homolog", "communism" -> "commun", "activate" -> "activ",
    "angulariti" -> "angular", "homologous" -> "homolog", "effective" -> "effect",
    "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll")

  test("canonical rule examples from the paper") {
    golden.foreach { case (in, out) =>
      assert(PorterStemmer.stem(in) == out, s"stem($in)")
    }
  }

  test("non-letter tokens pass through; short words untouched") {
    assert(PorterStemmer.stem("w00042") == "w00042")
    assert(PorterStemmer.stem("be") == "be")
    assert(PorterStemmer.stem("café") == "café")
  }

  test("stemming filter composes with the default chain, keeping positions") {
    val toks = PorterStemmer.stemTokens(Analyzer.tokenize("The relational engines, hopping!"))
    assert(toks.map(_.text).toSeq == Seq("the", "relat", "engin", "hop"))
    assert(toks.map(_.position).toSeq == Seq(0, 1, 2, 3))
  }

  test("idempotent on typical output") {
    golden.map(_._2).foreach { s =>
      // most Porter outputs are fixed points; all inputs at minimum converge
      val once = PorterStemmer.stem(s)
      assert(PorterStemmer.stem(once) == once, s"converge($s)")
    }
  }
}
