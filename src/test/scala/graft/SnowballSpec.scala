package graft

import java.nio.charset.StandardCharsets

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.Analyzer
import graft.analysis.snowball.SnowballStemmer

/** Snowball stemmer family (§2.5, `src/tokenizer/stemmer.rs:12-30`): every
  * supported language is gated against a golden `word \t stem` fixture
  * (`src/test/resources/stem/<lang>.tsv`) generated from PostgreSQL 15's
  * `dict_snowball` build of the same published Snowball algorithms — an
  * oracle independent of this implementation. Zero mismatches required.
  */
class SnowballSpec extends AnyFunSuite {

  private def fixture(lang: String): Seq[(String, String)] = {
    val in = getClass.getResourceAsStream(s"/stem/$lang.tsv")
    assert(in != null, s"missing fixture /stem/$lang.tsv")
    try {
      new java.io.BufferedReader(new java.io.InputStreamReader(in, StandardCharsets.UTF_8))
        .lines().iterator().asScala.filter(_.nonEmpty).map { line =>
          val t = line.indexOf('\t')
          (line.substring(0, t), line.substring(t + 1))
        }.toVector
    } finally in.close()
  }

  for (lang <- SnowballStemmer.supported.toSeq.sorted) {
    test(s"$lang matches its dict_snowball golden fixture exactly") {
      val stem = SnowballStemmer(lang)
      val pairs = fixture(lang)
      assert(pairs.size > 500, s"suspiciously small fixture for $lang")
      val bad = pairs.collect { case (w, want) if stem(w) != want => (w, stem(w), want) }
      assert(bad.isEmpty,
        s"$lang: ${bad.size}/${pairs.size} mismatches; first: ${bad.take(5)}")
    }
  }

  test("unsupported language fails fast") {
    intercept[IllegalArgumentException](SnowballStemmer("klingon"))
  }

  test("stemTokens rewrites text and keeps positions") {
    val toks = Analyzer.tokenize("Häuser laufen schneller")
    val stemmed = Analyzer.stemTokens(toks, "german")
    assert(stemmed.map(_.text) == ArrayBuffer("haus", "lauf", "schnell"))
    assert(stemmed.map(_.position) == toks.map(_.position))
  }
}
