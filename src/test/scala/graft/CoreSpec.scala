package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.Analyzer
import graft.index.FieldNorms
import graft.codec.{Codec, PostingsCodec, SegmentPostings, ByteVector}
import graft.search.Bm25

class AnalyzerSpec extends AnyFunSuite {
  test("simple tokenizer matches reference golden (simple_tokenizer.rs:72-79)") {
    val toks = Analyzer.simpleTokens("Hello, happy tax payer!")
    assert(toks.length == 4)
    assert(toks(0) == analysis.Token("Hello", 0, 0, 5))
    assert(toks(1) == analysis.Token("happy", 1, 7, 12))
    assert(toks(2) == analysis.Token("tax", 2, 13, 16))
    assert(toks(3) == analysis.Token("payer", 3, 17, 22))
  }
  test("default chain lowercases and drops >=40-byte tokens keeping position gaps") {
    val long = "x" * 40
    val toks = Analyzer.tokenize(s"AAA $long Bbb")
    assert(toks.map(_.text) == Seq("aaa", "bbb"))
    assert(toks.map(_.position) == Seq(0, 2)) // gap where the long token sat
    // 39 bytes is kept (strict < 40, remove_long.rs:34-37)
    assert(Analyzer.tokenize("y" * 39).map(_.text) == Seq("y" * 39))
    assert(Analyzer.tokenize("y" * 40).isEmpty)
  }
  test("unicode alnum boundaries") {
    assert(Analyzer.tokenize("C'est déjà l'été 42").map(_.text) ==
      Seq("c", "est", "déjà", "l", "été", "42"))
  }
}

class FieldNormsSpec extends AnyFunSuite {
  test("table endpoints and roundtrip (fieldnorm/code.rs tests)") {
    assert(FieldNorms.Table(0) == 0)
    assert(FieldNorms.Table(40) == 40)
    assert(FieldNorms.Table(41) == 42)
    assert(FieldNorms.Table(255) == 2013265944)
    for (i <- 0 until 41) assert(FieldNorms.fieldNormToId(i.toLong) == i.toByte)
    assert(FieldNorms.fieldNormToId(41L) == 40.toByte)
    assert(FieldNorms.fieldNormToId(42L) == 41.toByte)
    for (id <- 43 until 256) {
      val fn = FieldNorms.Table(id)
      assert(FieldNorms.idToFieldNorm(id) == fn)
      assert((FieldNorms.fieldNormToId(fn.toLong) & 0xff) == id)
      assert((FieldNorms.fieldNormToId(fn.toLong - 1) & 0xff) == id - 1)
      assert((FieldNorms.fieldNormToId(fn.toLong + 1) & 0xff) == id)
    }
    assert((FieldNorms.fieldNormToId(0xffffffffL) & 0xff) == 255)
  }
}

class Bm25Spec extends AnyFunSuite {
  test("idf(1,2) == ln(2) (bm25.rs:236-239)") {
    assert(Bm25.idf(1, 2) == math.log(2.0).toFloat)
  }
  test("score formula sanity") {
    val w = Bm25.forOneTerm(1, 2, 10.0f)
    // dl = 10 = avgdl -> denominator tf + K1
    val s = w.score(FieldNorms.fieldNormToId(10), 1)
    val expected = Bm25.idf(1, 2) * 2.2f * (1.0f / (1.0f + 1.2f))
    assert(math.abs(s - expected) < 1e-6f)
  }
}

class CodecSpec extends AnyFunSuite {
  test("vint roundtrip") {
    val out = new ByteVector()
    val vals = Seq(0L, 1L, 127L, 128L, 300L, 1L << 20, Int.MaxValue.toLong, 1L << 40)
    vals.foreach(Codec.writeVInt(out, _))
    val cur = new Codec.ByteCursor(out.toArray, 0)
    vals.foreach(v => assert(cur.readVLong() == v))
  }
  test("bitpack roundtrip all widths") {
    for (bits <- 0 to 31) {
      val max = if (bits == 0) 0 else (1L << bits) - 1
      val vals = Array.tabulate(128)(i => ((i.toLong * 2654435761L) % (max + 1)).toInt)
      val out = new ByteVector()
      Codec.packBits(vals, 0, 128, bits, out)
      assert(out.size == Codec.packedByteLen(128, bits))
      val back = new Array[Int](128)
      Codec.unpackBits(out.toArray, 0, 128, bits, back, 0)
      assert(back.toSeq == vals.toSeq)
    }
  }

  private def roundtrip(docs: Array[Int], tfs: Array[Int]): Unit = {
    val enc = PostingsCodec.encode(docs, tfs, null, _ => 0.toByte, withFreqs = true)
    val it = new SegmentPostings(enc.docFreq, enc.postings, enc.skip, enc.positions, readFreqs = true)
    var i = 0
    while (i < docs.length) {
      assert(it.doc == docs(i), s"doc $i")
      assert(it.termFreq == tfs(i), s"tf $i")
      it.advance()
      i += 1
    }
    assert(it.doc == PostingsCodec.Terminated)
  }

  test("postings roundtrip: sizes around block boundaries") {
    for (n <- Seq(1, 2, 127, 128, 129, 255, 256, 257, 1000)) {
      val docs = Array.tabulate(n)(i => i * 3 + (i % 3))
      val tfs = Array.tabulate(n)(i => 1 + (i % 13))
      roundtrip(docs, tfs)
    }
  }

  test("postings seek") {
    val n = 1000
    val docs = Array.tabulate(n)(i => i * 5)
    val tfs = Array.fill(n)(2)
    val enc = PostingsCodec.encode(docs, tfs, null, _ => 0.toByte, withFreqs = true)
    val it = new SegmentPostings(enc.docFreq, enc.postings, enc.skip, enc.positions, readFreqs = true)
    assert(it.seek(0) == 0)
    assert(it.seek(1) == 5)
    assert(it.seek(5) == 5)
    assert(it.seek(503) == 505)
    assert(it.seek(4995) == 4995)
    assert(it.seek(4996) == PostingsCodec.Terminated)
  }

  test("positions roundtrip (sequential consumption)") {
    val docs = Array(3, 9, 300)
    val pos = Array(Array(0, 4, 9), Array(7), Array(1, 2, 3, 1000))
    val tfs = pos.map(_.length)
    val enc = PostingsCodec.encode(docs, tfs, pos.flatten, _ => 0.toByte, withFreqs = true)
    val it = new SegmentPostings(enc.docFreq, enc.postings, enc.skip, enc.positions, readFreqs = true)
    assert(it.positionsForCurrent().toSeq == Seq(0, 4, 9))
    it.advance()
    assert(it.positionsForCurrent().toSeq == Seq(7))
    it.advance()
    assert(it.positionsForCurrent().toSeq == Seq(1, 2, 3, 1000))
  }

  test("property: postings roundtrip on random docsets") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 100) {
      val n = 1 + rnd.nextInt(600)
      var prev = -1
      val docs = Array.fill(n) { prev += 1 + rnd.nextInt(50); prev }
      val tfs = Array.fill(n)(1 + rnd.nextInt(9))
      roundtrip(docs, tfs)
    }
  }

  test("property: seek == linear scan") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 100) {
      val n = 1 + rnd.nextInt(400)
      var prev = 0
      val docs = Array.fill(n) { prev += 1 + rnd.nextInt(30); prev }
      val targets = Array.fill(30)(rnd.nextInt(12001)).sorted
      val tfs = Array.fill(docs.length)(1)
      val enc = PostingsCodec.encode(docs, tfs, null, _ => 0.toByte, withFreqs = true)
      val it = new SegmentPostings(enc.docFreq, enc.postings, enc.skip, enc.positions, readFreqs = true)
      targets.foreach { t =>
        val expected = docs.find(_ >= t).getOrElse(PostingsCodec.Terminated)
        assert(it.seek(t) == expected, s"seek($t)")
      }
    }
  }
}

class WebCorpusSpec extends AnyFunSuite {
  import graft.corpus.WebCorpus
  test("extraction invariant: extractText(html) == text byte-identically") {
    (0L until 500L).foreach { i =>
      val d = WebCorpus.genDoc(i)
      assert(WebCorpus.extractText(d.html) == d.text, s"doc $i")
    }
  }
  test("generation is deterministic and selectivities are sane") {
    val docs = (0L until 2000L).map(WebCorpus.genDoc)
    val again = (0L until 2000L).map(WebCorpus.genDoc)
    assert(docs.map(_.text) == again.map(_.text))
    val alpha = docs.count(_.text.split(" ").contains("alpha"))
    val beta = docs.count(_.text.split(" ").contains("beta"))
    val gamma = docs.count(_.text.split(" ").contains("gamma"))
    assert(alpha > 800 && alpha < 1200, s"alpha=$alpha")
    assert(beta > 100 && beta < 300, s"beta=$beta")
    assert(gamma > 2 && gamma < 60, s"gamma=$gamma")
    assert(docs.map(_.url).distinct.size == docs.size)
  }
}
