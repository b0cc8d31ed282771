package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{BpeKernel, BpeOps}
import graft.ops.PipelineOps

/** BPE apply: greedy lowest-rank adjacent-pair merging (Sennrich et al.
  * 2016 inference rule), checked against an independent list-rewriting
  * implementation and hand-computed goldens for cascades, rank priority,
  * and leftmost tie-breaks.
  */
class BpeSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent formulation: immutable-list rewriting — find the best pair
    * by mapping ALL adjacent pairs to ranks first, then rebuild the list.
    */
  private def naive(word: String, merges: Seq[(String, String)]): List[String] = {
    val rank = merges.zipWithIndex.groupBy { case ((a, b), _) => (a, b) }
      .map { case (k, v) => k -> v.map(_._2).min }
    var ps = word.toList.map(_.toString)
    var continue = true
    while (continue && ps.size > 1) {
      val ranked = ps.zip(ps.tail).zipWithIndex
        .flatMap { case ((a, b), i) => rank.get((a, b)).map(r => (r, i)) }
      if (ranked.isEmpty) continue = false
      else {
        val (_, i) = ranked.minBy { case (r, i) => (r, i) }
        ps = ps.take(i) ++ List(ps(i) + ps(i + 1)) ++ ps.drop(i + 2)
      }
    }
    ps
  }

  test("goldens: cascade, rank priority, leftmost tie-break, no-merge") {
    // cascade: lo then low
    assert(BpeKernel.encodeWord("lower",
      BpeKernel.build(Seq(("l", "o"), ("lo", "w")))).toSeq == Seq("low", "e", "r"))
    // rank priority: (a,b) at rank 0 wins over (b,c) even though (b,c)
    // is also present — a rank-ignorant scan would produce (a)(bc)
    assert(BpeKernel.encodeWord("abc",
      BpeKernel.build(Seq(("a", "b"), ("b", "c")))).toSeq == Seq("ab", "c"))
    assert(BpeKernel.encodeWord("abc",
      BpeKernel.build(Seq(("b", "c"), ("a", "b")))).toSeq == Seq("a", "bc"))
    // leftmost on ties
    assert(BpeKernel.encodeWord("abab",
      BpeKernel.build(Seq(("a", "b")))).toSeq == Seq("ab", "ab"))
    // nothing applicable
    assert(BpeKernel.encodeWord("xyz",
      BpeKernel.build(Seq(("a", "b")))).toSeq == Seq("x", "y", "z"))
    assert(BpeKernel.encodeWord("", BpeKernel.build(Seq(("a", "b")))).isEmpty)
  }

  test("fuzz: kernel == independent list-rewriting implementation") {
    val rnd = new scala.util.Random(7)
    val alpha = "abcd"
    for (_ <- 0 until 1500) {
      val word = Seq.fill(1 + rnd.nextInt(12))(alpha(rnd.nextInt(alpha.length))).mkString
      val nMerges = rnd.nextInt(6)
      val merges = Seq.fill(nMerges) {
        // pieces that can actually arise: short substrings of the alphabet
        def piece() = Seq.fill(1 + rnd.nextInt(2))(alpha(rnd.nextInt(alpha.length))).mkString
        (piece(), piece())
      }
      val got = BpeKernel.encodeWord(word, BpeKernel.build(merges)).toSeq
      val want = naive(word, merges)
      assert(got == want, s"word=$word merges=$merges")
      assert(got.mkString == word, "pieces must concatenate back to the word")
    }
  }

  test("DataFrame op + SQL function agree with the kernel; codegen path") {
    val rows = Seq((1L, "the thin sloth, THE MOTH!"), (2L, "no match here"))
    val df = rows.toDF("doc_id", "text")
    val merges = Seq(("t", "h"), ("th", "e"))
    val direct = rows.map { case (id, t) =>
      id -> graft.functions.ShingleKernel.tokens(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
        .flatMap(w => BpeKernel.encodeWord(w, BpeKernel.build(merges))).toSeq
    }.toMap
    val viaOp = PipelineOps.bpeEncode(df, merges)
      .select("doc_id", "bpe_toks").as[(Long, Seq[String])].collect().toMap
    assert(viaOp == direct)
    GraftFunctions.registerAll(spark)
    val viaSql = df.selectExpr("doc_id", "bpe_tokens(text, array('t h', 'th e')) AS p")
      .as[(Long, Seq[String])].collect().toMap
    assert(viaSql == direct)
    // piece counts feed the token budget
    val n = PipelineOps.bpeEncode(df, merges)
      .select("doc_id", "n_bpe_tokens").as[(Long, Long)].collect().toMap
    assert(n == direct.map { case (k, v) => k -> v.size.toLong })
  }

  /** Independent Sennrich trainer: plain Scala symbol vectors, leftmost
    * non-overlapping merge, (count desc, pair asc) tie law.
    */
  private def naiveTrain(words: Map[String, Long], k: Int): Seq[(String, String, Long)] = {
    var vocab = words.toVector.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var i = 0
    var done = false
    while (i < k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((syms, c) <- vocab; j <- 0 until syms.length - 1)
        counts((syms(j), syms(j + 1))) += c
      if (counts.isEmpty) done = true
      else {
        val ((p, cc), n) = counts.toSeq.minBy { case ((a, b), m) => (-m, a, b) }
        out += ((p, cc, n))
        vocab = vocab.map { case (syms, cn) =>
          val nb = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j + 1 < syms.length && syms(j) == p && syms(j + 1) == cc) {
              nb += p + cc; j += 2
            } else { nb += syms(j); j += 1 }
          }
          (nb.result(), cn)
        }
      }
      i += 1
    }
    out.toSeq
  }

  test("bpeTrain: merge sequence matches an independent Sennrich trainer") {
    // 'th' dominates, then 'the'; cascaded merges must re-count after each
    val docs = Seq(
      (1L, "the the the then there other"),
      (2L, "thin myth math the"),
      (3L, "banana bandana ban")
    ).toDF("doc_id", "text")
    val words = Seq("the", "the", "the", "then", "there", "other",
      "thin", "myth", "math", "the", "banana", "bandana", "ban")
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = naiveTrain(words, 8)
    val got = PipelineOps.bpeTrain(docs, 8)
    assert(got == want)
    assert(got.head._1 == "t" && got.head._2 == "h") // 'th' is the top pair
    // learned merges feed the apply kernel directly
    val pieces = PipelineOps.bpeEncode(docs, got.map(m => (m._1, m._2)))
      .select("n_bpe_tokens").as[Long].collect().sum
    val raw = PipelineOps.bpeEncode(docs, Nil)
      .select("n_bpe_tokens").as[Long].collect().sum
    assert(pieces < raw) // merges shrink the token budget
  }

  test("bpeTrain fuzz: random small-alphabet corpora match the naive trainer") {
    val rnd = new scala.util.Random(20260820)
    for (trial <- 0 until 8) {
      val words = (0 until 12).map { _ =>
        (1 to (1 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val wc = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val want = naiveTrain(wc, 6)
      val got = PipelineOps.bpeTrain(docs, 6)
      assert(got == want, s"trial=$trial words=$words")
    }
  }

  test("batched bpeTrain is EXACTLY sequential (merges, order, counts) and saves rounds") {
    // the guarded prefix batching must never deviate from the Sennrich
    // sequence — same merge tuples INCLUDING pair counts — on any corpus;
    // fuzz over wider alphabets (more disjoint top pairs -> real batches)
    val rnd = new scala.util.Random(20260821)
    for (trial <- 0 until 10) {
      val alpha = 3 + rnd.nextInt(5)
      val words = (0 until 20).map { _ =>
        (1 to (2 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(alpha)).toChar).mkString
      }
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val wc = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val want = naiveTrain(wc, 10)
      val got = PipelineOps.bpeTrain(docs, 10, maxBatch = 8)
      assert(got == want, s"trial=$trial alpha=$alpha words=$words")
    }
    // on prose-like text the batch actually engages: merge table identical
    // AND (documented latency property) fewer driver rounds than merges.
    // Rounds are not directly observable, so pin the equality on the
    // fixture the sequential test uses + a wide-alphabet corpus where the
    // top pairs are symbol-disjoint
    val docs = Seq(
      (1L, "the the the then there other"),
      (2L, "thin myth math the"),
      (3L, "banana bandana ban")
    ).toDF("doc_id", "text")
    val words = Seq("the", "the", "the", "then", "there", "other",
      "thin", "myth", "math", "the", "banana", "bandana", "ban")
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(PipelineOps.bpeTrain(docs, 8, maxBatch = 8) == naiveTrain(words, 8))
  }
}
