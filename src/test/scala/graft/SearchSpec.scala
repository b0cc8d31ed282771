package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.search._
import graft.codec.PostingsCodec

/** A scorer over an explicit doc array (test stub). */
class ArrayScorer(docs: Array[Int], scores: Array[Float]) extends Scorer {
  private var i = 0
  def doc: Int = if (i < docs.length) docs(i) else Scorer.Terminated
  def advance(): Int = { i += 1; doc }
  def score: Float = scores(i)
  def cost: Long = docs.length.toLong
}
object ArrayScorer {
  def apply(ds: Int*): ArrayScorer = new ArrayScorer(ds.toArray, Array.fill(ds.length)(1.0f))
}

/** Kernel algebra vs Set operations (reference proptest style,
  * `src/query/union/mod.rs:69-110`).
  */
class KernelAlgebraSpec extends AnyFunSuite {

  private def collect(s: Scorer): List[Int] = {
    val b = List.newBuilder[Int]
    var d = s.doc
    while (d != Scorer.Terminated) { b += d; d = s.advance() }
    b.result()
  }

  test("intersection == set intersection") {
    val rnd = new scala.util.Random(3)
    for (_ <- 0 until 50) {
      val a = (0 until 200).filter(_ => rnd.nextDouble() < 0.3)
      val b = (0 until 200).filter(_ => rnd.nextDouble() < 0.5)
      val c = (0 until 200).filter(_ => rnd.nextDouble() < 0.7)
      val legs: Array[Scorer] = Array(ArrayScorer(a: _*), ArrayScorer(b: _*), ArrayScorer(c: _*))
      val expected = a.toSet & b.toSet & c.toSet
      assert(collect(new Intersection(legs)) == expected.toList.sorted)
    }
  }

  test("union == set union; minShouldMatch == n-of") {
    val rnd = new scala.util.Random(5)
    for (_ <- 0 until 50) {
      val sets = Seq.fill(3)((0 until 150).filter(_ => rnd.nextDouble() < 0.3))
      def legs = sets.map(s => ArrayScorer(s: _*): Scorer).toArray
      assert(collect(new Union(legs, Combiner.Sum)) == sets.flatten.distinct.sorted)
      val atLeast2 = (0 until 150).filter(d => sets.count(_.contains(d)) >= 2)
      assert(collect(new Union(legs, Combiner.Sum, 2)) == atLeast2.toList)
    }
  }

  test("BufferedUnion == Union: docs, bit-exact scores, msm, seeks") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 30) {
      val k = 2 + rnd.nextInt(7)
      val n = 5000 // spans multiple 2048-doc windows
      val sets = Seq.fill(k)((0 until n).filter(_ => rnd.nextDouble() < 0.05))
      def legsOf(): Array[Scorer] = sets.map { s =>
        new ArrayScorer(s.toArray, s.map(d => (d % 13 + 1) * 0.37f).toArray): Scorer
      }.toArray
      for (msm <- Seq(1, 2)) {
        val lin = new Union(legsOf(), Combiner.Sum, msm)
        val buf = new BufferedUnion(legsOf(), Combiner.Sum, msm)
        var d1 = lin.doc
        var d2 = buf.doc
        while (d1 != Scorer.Terminated || d2 != Scorer.Terminated) {
          assert(d1 == d2, s"trial=$trial msm=$msm")
          assert(lin.score == buf.score, s"doc=$d1") // bit-exact f32
          d1 = lin.advance()
          d2 = buf.advance()
        }
      }
      // interleaved seeks (incl. cross-window jumps) agree
      val lin = new Union(legsOf(), Combiner.Sum)
      val buf = new BufferedUnion(legsOf(), Combiner.Sum)
      var t = 0
      while (t < n) {
        t += 1 + rnd.nextInt(700)
        val a = lin.seek(t)
        val b = buf.seek(t)
        assert(a == b, s"seek($t)")
        if (a != Scorer.Terminated) assert(lin.score == buf.score)
      }
    }
  }

  test("exclude == set difference") {
    val rnd = new scala.util.Random(9)
    for (_ <- 0 until 50) {
      val inc = (0 until 150).filter(_ => rnd.nextDouble() < 0.4)
      val exc = (0 until 150).filter(_ => rnd.nextDouble() < 0.4)
      val s = new Exclude(ArrayScorer(inc: _*), ArrayScorer(exc: _*))
      assert(collect(s) == (inc.toSet -- exc.toSet).toList.sorted)
    }
  }

  test("boolean fixture from reference (src/query/mod.rs:79-109 corpus)") {
    // corpus: doc0="a b", doc1="a c", doc2="a b c", doc3="b"
    val a = ArrayScorer(0, 1, 2)
    val b = ArrayScorer(0, 2, 3)
    assert(collect(new Intersection(Array[Scorer](a, b))) == List(0, 2)) // +a +b
    val aOrB = new Union(Array[Scorer](ArrayScorer(0, 1, 2), ArrayScorer(0, 2, 3)), Combiner.Sum)
    assert(collect(aOrB) == List(0, 1, 2, 3))
    val c = ArrayScorer(1, 2)
    assert(collect(new Intersection(Array[Scorer](aOrB2(), c))) == List(1, 2)) // (a OR b) AND c
    def aOrB2() = new Union(Array[Scorer](ArrayScorer(0, 1, 2), ArrayScorer(0, 2, 3)), Combiner.Sum)
  }

  test("TopNComputer: strict threshold + doc-asc tie-break") {
    val t = new TopNComputer(3)
    t.push(1.0f, 1L); t.push(2.0f, 2L); t.push(1.0f, 3L); t.push(1.0f, 4L); t.push(3.0f, 5L)
    val out = t.intoSortedVec().toList
    assert(out == List((3.0f, 5L), (2.0f, 2L), (1.0f, 1L)))
    // overflow path: push 100 docs ascending, scores = doc%10
    val t2 = new TopNComputer(5)
    (0 until 100).foreach(d => t2.push((d % 10).toFloat, d.toLong))
    val expect = (0 until 100).map(d => ((d % 10).toFloat, d.toLong))
      .sortBy { case (s, d) => (-s, d) }.take(5).toList
    assert(t2.intoSortedVec().toList == expect)
  }
}

/** In-memory single-segment oracle harness: builds postings via the codec
  * from token lists, runs WAND vs the brute-force f32 BM25 oracle — the
  * rank-identity proof (FIXTURES.md §5.3, reference block_wand.rs proptest).
  */
class WandOracleSpec extends AnyFunSuite {

  import graft.analysis.Analyzer
  import graft.index.FieldNorms

  /** Build per-term codec postings for a tiny corpus. */
  private def buildPostings(texts: Seq[String]) = {
    val tokens = texts.map(t => Analyzer.terms(t).toSeq)
    val norms = tokens.map(ts => FieldNorms.fieldNormToId(ts.length.toLong)).toArray
    val byTerm = scala.collection.mutable.HashMap[String, scala.collection.mutable.ArrayBuffer[(Int, Int)]]()
    tokens.zipWithIndex.foreach { case (ts, doc) =>
      ts.groupBy(identity).foreach { case (term, occ) =>
        byTerm.getOrElseUpdate(term, scala.collection.mutable.ArrayBuffer()) += ((doc, occ.size))
      }
    }
    val encoded = byTerm.map { case (term, postings) =>
      val sorted = postings.sortBy(_._1)
      term -> PostingsCodec.encode(sorted.map(_._1).toArray, sorted.map(_._2).toArray,
        null, d => norms(d), withFreqs = true)
    }.toMap
    (tokens, norms, encoded)
  }

  private def topKOracle(tokens: Seq[Seq[String]], norms: Array[Byte], terms: Seq[String], k: Int) = {
    val n = tokens.size.toLong
    val totalTokens = tokens.map(_.size.toLong).sum
    val weights = terms.distinct.map { t =>
      val df = tokens.count(_.contains(t)).toLong
      t -> (if (df == 0) null else Bm25.forOneTerm(df, n, totalTokens.toFloat / n.toFloat))
    }.toMap
    val scored = tokens.zipWithIndex.flatMap { case (ts, doc) =>
      var s = 0.0f
      var any = false
      terms.foreach { t =>
        val tf = ts.count(_ == t)
        if (tf > 0 && weights(t) != null) { any = true; s += weights(t).score(norms(doc), tf) }
      }
      if (any) Some((s, doc.toLong)) else None
    }
    scored.sortBy { case (s, d) => (-s, d) }.take(k)
  }

  private def wandTopK(texts: Seq[String], terms: Seq[String], k: Int): List[(Float, Long)] = {
    val (tokens, norms, encoded) = buildPostings(texts)
    val n = tokens.size.toLong
    val totalTokens = tokens.map(_.size.toLong).sum
    val scorers = terms.zipWithIndex.flatMap { case (t, i) =>
      encoded.get(t).map { e =>
        val df = tokens.count(_.contains(t)).toLong
        val w = Bm25.forOneTerm(df, n, totalTokens.toFloat / n.toFloat)
        new TermScorer(
          new graft.codec.SegmentPostings(e.docFreq, e.postings, e.skip, e.positions, readFreqs = true),
          norms, w, 0.0f, i)
      }
    }
    val topN = new TopNComputer(k)
    val cb: (Int, Float) => Float = { (d, s) => topN.push(s, d.toLong); topN.threshold }
    if (scorers.isEmpty) ()
    else if (scorers.size == 1) BlockWand.runSingle(scorers.head, Float.NegativeInfinity, cb)
    else BlockWand.run(scorers, Float.NegativeInfinity, cb)
    topN.intoSortedVec().toList
  }

  test("WAND top-k == brute force, random corpora (exact f32 bits)") {
    val rnd = new scala.util.Random(42)
    val vocab = Array("a", "b", "c", "d", "e", "f", "g")
    for (round <- 0 until 60) {
      val nDocs = 50 + rnd.nextInt(400) // crosses the 128 block boundary
      val texts = Seq.fill(nDocs) {
        val len = 1 + rnd.nextInt(30)
        Seq.fill(len)(vocab(math.min(rnd.nextInt(8), 6))).mkString(" ")
      }
      val nTerms = 1 + rnd.nextInt(3)
      val terms = Seq.fill(nTerms)(vocab(rnd.nextInt(7))).distinct
      val k = 1 + rnd.nextInt(12)
      val (tokens, norms, _) = buildPostings(texts)
      val expected = topKOracle(tokens, norms, terms, k).toList
      val got = wandTopK(texts, terms, k)
      assert(got == expected, s"round=$round terms=$terms k=$k")
    }
  }
}
