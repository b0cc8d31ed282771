package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.PipelineOps

/** Link-graph PageRank, embedding k-means, cluster-balanced sampling and
  * semantic decontamination — each checked against an independent
  * driver-side implementation (never against itself).
  */
class GraphClusterSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  // ------------------------------------------------------------- PageRank

  /** Independent PageRank oracle: plain Scala maps, same published
    * recurrence (uniform init, dangling mass redistributed uniformly).
    */
  private def pageRankOracle(edges: Seq[(String, String)], iters: Int,
      d: Double): Map[String, Double] = {
    val e = edges.filter { case (a, b) => a != b }.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.size.toDouble
    val out = e.groupBy(_._1).map { case (s, es) => s -> es.size.toDouble }
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(out.contains).map(r).sum
      val contrib = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / out(src) }.sum
      }
      r = nodes.map(v =>
        v -> ((1 - d) / n + d * (contrib.getOrElse(v, 0.0) + dangling / n))).toMap
    }
    r
  }

  // a→b, a→c, b→c, c→a, c→e; e is DANGLING (no out-edges); plus a parallel
  // duplicate of a→b and a self-loop d→d (d participates only via d→a)
  private val testEdges = Seq(
    "a" -> "b", "a" -> "c", "b" -> "c", "c" -> "a", "c" -> "e",
    "a" -> "b", "d" -> "d", "d" -> "a")

  test("pageRank matches independent power iteration (dangling + dup edges + self-loop)") {
    import spark.implicits._
    val edges = testEdges.toDF("src", "dst")
    val got = PipelineOps.pageRank(edges, iters = 5, damping = 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = pageRankOracle(testEdges, 5, 0.85)
    assert(got.keySet === want.keySet)
    for ((k, v) <- want) assert(math.abs(got(k) - v) < 1e-12, s"node $k")
    // rank is a probability distribution
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // the hub pointed to by everything outranks the dangling leaf's source
    assert(got("c") > got("e"))
  }

  test("pageRank is invariant under input partitioning") {
    import spark.implicits._
    val e1 = testEdges.toDF("src", "dst").repartition(7)
    val e2 = testEdges.toDF("src", "dst").coalesce(1)
    val a = PipelineOps.pageRank(e1, 3).collect()
      .map(r => r.getString(0) -> math.rint(r.getDouble(1) * 1e9)).toMap
    val b = PipelineOps.pageRank(e2, 3).collect()
      .map(r => r.getString(0) -> math.rint(r.getDouble(1) * 1e9)).toMap
    assert(a === b)
  }

  test("pageRank fuzz: random graphs (disconnected, cycles, dangling) match the oracle") {
    import spark.implicits._
    for (trial <- 0 until 4) {
      val rnd = new scala.util.Random(600 + trial)
      val nNodes = 5 + rnd.nextInt(20)
      val nEdges = 1 + rnd.nextInt(3 * nNodes)
      val edges = Seq.fill(nEdges)(
        (s"n${rnd.nextInt(nNodes)}", s"n${rnd.nextInt(nNodes)}"))
        .filter { case (a, b) => a != b } // op drops self-loops anyway
      if (edges.nonEmpty) {
        val iters = 1 + rnd.nextInt(5)
        val got = PipelineOps.pageRank(edges.toDF("src", "dst"), iters)
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        val want = pageRankOracle(edges, iters, 0.85)
        assert(got.keySet === want.keySet, s"trial $trial")
        for ((k, v) <- want)
          assert(math.abs(got(k) - v) < 1e-12, s"trial $trial node $k")
        assert(math.abs(got.values.sum - 1.0) < 1e-9, s"trial $trial mass")
      }
    }
  }

  test("hostPriors joins per-host volume stats with pagerank; off-graph hosts keep null rank") {
    import spark.implicits._
    val docs = Seq(
      (0L, "https://a.example/p0", "one two three"),
      (1L, "https://a.example/p1", "four five"),
      (2L, "https://b.example/p2", "six"),
      (3L, "https://c.example/p3", "seven eight nine ten")) // c is NOT in the graph
      .toDF("doc_id", "url", "text")
    val edges = Seq("a.example" -> "b.example", "b.example" -> "a.example")
      .toDF("src", "dst")
    val got = PipelineOps.hostPriors(docs, PipelineOps.pageRank(edges, 3))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    val ranks = pageRankOracle(Seq("a.example" -> "b.example", "b.example" -> "a.example"), 3, 0.85)
    // chars: "one two three"=13, "four five"=9 -> avg 11.0; tokens 3+2=5
    assert(got("a.example") ===
      ((2L, 5L, 11.0, Some(math.rint(ranks("a.example") * 1e6) / 1e6))))
    assert(got("b.example")._1 === 1L)
    assert(got("b.example")._2 === 1L)
    assert(got("b.example")._4 === Some(math.rint(ranks("b.example") * 1e6) / 1e6))
    assert(got("c.example") === ((1L, 4L, 20.0, None)))
  }

  // -------------------------------------------------------------- k-means

  private def genVectors(n: Int, dim: Int, nClusters: Int,
      noise: Double): Seq[(Long, Array[Double])] = {
    val rnd = new scala.util.Random(7)
    val centroids = Array.fill(nClusters, dim)(rnd.nextGaussian())
    (0L until n.toLong).map { i =>
      val r = new scala.util.Random(500 + i)
      val c = centroids((i % nClusters).toInt)
      i -> Array.tabulate(dim)(j => c(j) + noise * r.nextGaussian())
    }
  }

  /** Brute-force double cosine shared by every oracle in this spec. */
  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var j = 0
    while (j < a.length) { dot += a(j) * b(j); na += a(j) * a(j); nb += b(j) * b(j); j += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Independent Lloyd's: sequential, same init (k lowest ids), same
    * 6dp-rounded-distance/lowest-cid tie law, empty clusters keep their
    * centroid.
    */
  private def kmeansOracle(vs: Seq[(Long, Array[Double])], k: Int,
      iters: Int): Map[Long, Int] = {
    val dim = vs.head._2.length
    var cents = vs.sortBy(_._1).take(k).map(_._2.clone).toArray
    def nearest(v: Array[Double]): Int = {
      var best = 0; var bestD = Double.MaxValue
      for (ci <- cents.indices) {
        var d = 0.0
        var j = 0
        while (j < dim) { val t = v(j) - cents(ci)(j); d += t * t; j += 1 }
        val dr = math.rint(d * 1e6) / 1e6
        if (dr < bestD) { bestD = dr; best = ci }
      }
      best
    }
    for (_ <- 1 to iters) {
      val byC = vs.groupBy { case (_, v) => nearest(v) }
      cents = Array.tabulate(k) { ci =>
        byC.get(ci) match {
          case None => cents(ci)
          case Some(members) =>
            val s = new Array[Double](dim)
            members.foreach { case (_, v) =>
              var j = 0; while (j < dim) { s(j) += v(j); j += 1 }
            }
            var j = 0; while (j < dim) { s(j) /= members.size; j += 1 }
            s
        }
      }
    }
    vs.map { case (id, v) => id -> nearest(v) }.toMap
  }

  test("kmeansAssign matches independent sequential Lloyd's exactly") {
    import spark.implicits._
    val vs = genVectors(240, 16, 5, 0.3)
    val df = vs.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
      .repartition(9)
    val got = PipelineOps.kmeansAssign(df, k = 5, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    val want = kmeansOracle(vs, 5, 3)
    assert(got === want)
    assert(got.values.toSet.size > 1, "should use more than one cluster")
  }

  test("kmeansAssign keeps empty clusters' centroids (k > distinct points)") {
    import spark.implicits._
    // 3 distinct points, k=4: cluster of the 4th init vector (a duplicate
    // of an earlier point) can never win under the lowest-cid tie law
    val pts = Seq(
      0L -> Array(0.0, 0.0), 1L -> Array(10.0, 0.0), 2L -> Array(0.0, 10.0),
      3L -> Array(0.0, 0.0), 4L -> Array(10.1, 0.0), 5L -> Array(0.0, 9.9))
    val df = pts.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    val got = PipelineOps.kmeansAssign(df, k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    val want = kmeansOracle(pts, 4, 2)
    assert(got === want)
    assert(!got.values.toSet.contains(3), "duplicate-init cluster stays empty")
  }

  // ------------------------------------------------- cluster-balanced sample

  test("clusterBalancedSample keep-set equals the JVM md5 rule; partitioning-invariant") {
    import spark.implicits._
    val assign = (0L until 400L).map(i => (i, (i % 7) * (i % 7) % 5)) // skewed sizes
    val df = assign.toDF("vec_id", "cluster")
    val got = PipelineOps.clusterBalancedSample(df.repartition(11))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // independent restatement: md5 permille < floor(1000*min/size)
    val sizes = assign.groupBy(_._2).map { case (c, xs) => c -> xs.size }
    val minSize = sizes.values.min
    val md = java.security.MessageDigest.getInstance("MD5")
    def permille(id: Long): Long = {
      val hex = md.digest(s"$id#balance".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % 1000
    }
    val want = assign.filter { case (id, c) =>
      permille(id) < math.floor(1000.0 * minSize / sizes(c)).toLong
    }.toSet
    assert(got === want)
    // every cluster is downsampled towards the min size (fraction rule)
    val gotSizes = got.groupBy(_._2).map { case (c, xs) => c -> xs.size }
    for ((c, n) <- gotSizes) assert(n <= sizes(c))
    val got2 = PipelineOps.clusterBalancedSample(df.coalesce(1))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got2 === got)
  }

  // ------------------------------------------------------------ kNN graph

  test("knnGraph matches brute-force per-vector top-k; block-count invariant") {
    import spark.implicits._
    val vs = genVectors(120, 16, 8, 0.4)
    val df = vs.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
      .repartition(6)
    val k = 4
    def run(blocks: Int) = PipelineOps.knnGraph(df, k, blocks)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val got = run(5)
    for ((id, v) <- vs) {
      val want = vs.filter(_._1 != id)
        .map { case (nid, nv) => (nid, cos(v, nv)) }
        .sortBy { case (nid, c) => (-c, nid) }.take(k)
      want.zipWithIndex.foreach { case ((nid, c), i) =>
        val (gNid, gCos) = got((id, i + 1L))
        assert(gNid === nid, s"vec $id rank ${i + 1}")
        assert(math.abs(gCos - math.rint(c * 1e4) / 1e4) < 1e-9, s"vec $id rank ${i + 1}")
      }
    }
    assert(run(17) === got, "result depends on block count")
  }

  test("knnGraphIvf recall@k >= 0.8 vs the exact graph; same tie/output law") {
    import spark.implicits._
    val vs = genVectors(400, 16, 10, 0.35)
    val df = vs.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
      .repartition(8)
    val k = 5
    val exactRows = PipelineOps.knnGraph(df, k).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val approxRows = PipelineOps.knnGraphIvf(df, k, nCentroids = 12, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = exactRows.keys.groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).toSet }
    val approx = approxRows.keys.groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).toSet }
    assert(approx.keySet === exact.keySet, "every vector gets neighbors")
    val recalls = exact.map { case (id, nbs) =>
      (nbs intersect approx(id)).size.toDouble / nbs.size
    }
    val meanRecall = recalls.sum / recalls.size
    info(f"knnGraphIvf mean recall@$k = $meanRecall%.3f")
    assert(meanRecall >= 0.8, f"recall $meanRecall%.3f below gate")
    // approximate edges that ARE reported carry exact cosines
    approxRows.foreach { case (key, c) =>
      exactRows.get(key).foreach(ec => assert(math.abs(ec - c) < 1e-9))
    }
  }

  test("contrastivePairs matches brute-force band ranking; block-count invariant") {
    import spark.implicits._
    val vs = genVectors(140, 16, 7, 0.5)
    val df = vs.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
      .repartition(6)
    val (kPos, posLo, posHi) = (2, 0.5, 0.95)
    val (kNeg, negLo, negHi) = (3, 0.0, 0.5)
    def run(blocks: Int) = PipelineOps.contrastivePairs(
        df, kPos, posLo, posHi, kNeg, negLo, negHi, blocks)
      .collect().map(r => (r.getLong(0), r.getString(3), r.getLong(4)) ->
        (r.getLong(1), r.getDouble(2))).toMap
    val got = run(4)
    var nPos = 0; var nNeg = 0
    for ((id, v) <- vs) {
      val scored = vs.filter(_._1 != id).map { case (pid, pv) => (pid, cos(v, pv)) }
      def band(lo: Double, hi: Double, k: Int, kind: String): Unit = {
        val want = scored.filter { case (_, c) => c >= lo && c < hi }
          .sortBy { case (pid, c) => (-c, pid) }.take(k)
        want.zipWithIndex.foreach { case ((pid, c), i) =>
          val (gPid, gCos) = got((id, kind, i + 1L))
          assert(gPid === pid, s"anchor $id $kind rank ${i + 1}")
          assert(math.abs(gCos - math.rint(c * 1e4) / 1e4) < 1e-9)
          if (kind == "pos") nPos += 1 else nNeg += 1
        }
        // no extra ranks beyond the band population
        assert(!got.contains((id, kind, want.size + 1L)) || want.size == k)
      }
      band(posLo, posHi, kPos, "pos")
      band(negLo, negHi, kNeg, "neg")
    }
    assert(nPos > 0 && nNeg > 0, "both bands must be exercised")
    assert(run(13) === got, "result depends on block count")
  }

  test("mutualKnnClusters matches brute-force mutual-edge union-find") {
    import spark.implicits._
    val vs = genVectors(100, 12, 6, 0.3)
    val df = vs.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
      .repartition(7)
    val k = 3
    val got = PipelineOps.mutualKnnClusters(df, k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val knn = vs.map { case (id, v) =>
      id -> vs.filter(_._1 != id).map { case (nid, nv) => (nid, cos(v, nv)) }
        .sortBy { case (nid, c) => (-c, nid) }.take(k).map(_._1).toSet
    }.toMap
    val mutual = for {
      (a, nbs) <- knn.toSeq; b <- nbs if a < b && knn(b).contains(a)
    } yield (a, b)
    // union-find closure
    val parent = scala.collection.mutable.Map(vs.map(v => v._1 -> v._1): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for ((a, b) <- mutual) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = vs.map { case (id, _) => id -> find(id) }.toMap
    assert(got === want)
    assert(got.values.toSet.size > 1 && got.values.toSet.size < vs.size,
      "clustering is non-trivial")
  }

  test("kmeansAssign fuzz: random configs match the sequential oracle") {
    import spark.implicits._
    for (trial <- 0 until 4) {
      val rnd = new scala.util.Random(900 + trial)
      val n = 60 + rnd.nextInt(120)
      val dim = 4 + rnd.nextInt(20)
      val k = 2 + rnd.nextInt(5)
      val iters = rnd.nextInt(4)
      val vs = {
        val r0 = new scala.util.Random(3000 + trial)
        val cents = Array.fill(k + 1, dim)(r0.nextGaussian())
        (0L until n.toLong).map { i =>
          val r = new scala.util.Random(7000 + 31 * trial + i)
          val c = cents((i % (k + 1)).toInt)
          i -> Array.tabulate(dim)(j => c(j) + 0.4 * r.nextGaussian())
        }
      }
      val df = vs.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
        .repartition(1 + rnd.nextInt(8))
      val got = PipelineOps.kmeansAssign(df, k, iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      assert(got === kmeansOracle(vs, k, iters), s"trial $trial (n=$n dim=$dim k=$k iters=$iters)")
    }
  }

  // ------------------------------------------------------ mixture weights

  test("mixtureWeights matches independent computation; α=1 natural, α=0 uniform") {
    import spark.implicits._
    val docs = Seq(
      (0L, "aa bb cc dd", "en"), (1L, "aa bb cc dd ee ff", "en"),
      (2L, "aa bb", "de"), (3L, "aa", "fr"), (4L, "aa bb cc", "fr"))
      .toDF("doc_id", "text", "lang")
    val toks = Map("en" -> 10L, "de" -> 2L, "fr" -> 4L)
    def runAt(alpha: Double) = PipelineOps.mixtureWeights(docs, "lang", alpha)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val a7 = runAt(0.7)
    val totA = toks.values.map(math.pow(_, 0.7)).sum
    val tot = toks.values.sum.toDouble
    for ((d, n) <- toks) {
      val (gN, gShare, gW) = a7(d)
      assert(gN === n)
      assert(math.abs(gShare - math.rint(n / tot * 1e6) / 1e6) < 1e-9)
      assert(math.abs(gW - math.rint(math.pow(n, 0.7) / totA * 1e6) / 1e6) < 1e-9)
    }
    // α=1: weight == natural share; α=0: uniform over domains
    val a1 = runAt(1.0)
    for ((_, (_, s, w)) <- a1) assert(math.abs(s - w) < 1e-9)
    val a0 = runAt(0.0)
    for ((_, (_, _, w)) <- a0) assert(math.abs(w - 1.0 / 3) < 1e-6)
  }

  // -------------------------------------------------------- token entropy

  test("tokenEntropy matches independent histogram computation + edge cases") {
    import spark.implicits._
    val docs = Seq(
      (0L, "x x x x"),                   // constant: H = 0, ttr = 1/4
      (1L, "a b c d"),                   // uniform distinct: H = 2
      (2L, "a a b b c c d d"),           // uniform pairs: H = 2
      (3L, "a a a b"),                   // skewed
      (4L, "spark table spark vector spark"))
      .toDF("doc_id", "text")
    val got = PipelineOps.tokenEntropy(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    def oracle(text: String): (Long, Long, Double, Double) = {
      val toks = text.split(" ").toSeq
      val n = toks.size.toDouble
      val hist = toks.groupBy(identity).map(_._2.size.toDouble)
      val h = (math.log(n) - hist.map(c => c * math.log(c)).sum / n) / math.log(2.0)
      (toks.size.toLong, hist.size.toLong,
        math.rint(h * 1e4) / 1e4, math.rint(hist.size / n * 1e4) / 1e4)
    }
    val texts = Map(0L -> "x x x x", 1L -> "a b c d", 2L -> "a a b b c c d d",
      3L -> "a a a b", 4L -> "spark table spark vector spark")
    for ((id, t) <- texts) {
      val (n, types, h, ttr) = oracle(t)
      val (gN, gTypes, gH, gTtr) = got(id)
      assert(gN === n, s"doc $id"); assert(gTypes === types, s"doc $id")
      assert(math.abs(gH - h) < 1e-9, s"doc $id entropy")
      assert(math.abs(gTtr - ttr) < 1e-9, s"doc $id ttr")
    }
    assert(got(0L)._3 === 0.0)
    assert(got(1L)._3 === 2.0)
    assert(got(2L)._3 === 2.0)
  }

  // ------------------------------------------------------------ script mix

  test("scriptMix counts, permilles and dominant script match hand computation") {
    import spark.implicits._
    val docs = Seq(
      (0L, "hello world"),                      // pure latin: 10 letters
      (1L, "привет мир"),                       // pure cyrillic: 9
      (2L, "hello мир 你好"),                    // latin 5, cyr 3, cjk 2
      (3L, "abc абв"),                          // tie 3-3: latin wins (range order)
      (4L, "… 123 !!!"),                        // no script chars at all
      (5L, "مرحبا γειά"))                       // arabic 5, greek 4
      .toDF("doc_id", "text")
    val got = PipelineOps.scriptMix(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7)))
      .toMap
    // columns: n_script_chars, latin/cyrillic/greek/arabic/cjk milli, main
    assert(got(0L) === ((10L, 1000L, 0L, 0L, 0L, 0L, "latin")))
    assert(got(1L) === ((9L, 0L, 1000L, 0L, 0L, 0L, "cyrillic")))
    assert(got(2L) === ((10L, 500L, 300L, 0L, 0L, 200L, "latin")))
    assert(got(3L) === ((6L, 500L, 500L, 0L, 0L, 0L, "latin")))
    assert(got(4L) === ((0L, 0L, 0L, 0L, 0L, 0L, "latin")))
    assert(got(5L) === ((9L, 0L, 0L, 444L, 555L, 0L, "arabic")))
  }

  test("scriptMix fuzz: random multiscript strings match an independent codepoint counter") {
    import spark.implicits._
    // the op's literal ranges restated as codepoint intervals
    val ranges: Seq[(String, Seq[(Int, Int)])] = Seq(
      "latin" -> Seq(0x41 -> 0x5A, 0x61 -> 0x7A),
      "cyrillic" -> Seq(0x400 -> 0x4FF),
      "greek" -> Seq(0x370 -> 0x3FF),
      "arabic" -> Seq(0x600 -> 0x6FF),
      "cjk" -> Seq(0x4E00 -> 0x9FFF, 0x3040 -> 0x30FF, 0xAC00 -> 0xD7AF))
    val pools: Array[Array[Char]] = Array(
      ('a' to 'z') ++ ('A' to 'Z'),
      (0x400 to 0x4FF).map(_.toChar),
      (0x370 to 0x3FF).map(_.toChar),
      (0x600 to 0x6FF).map(_.toChar),
      (0x4E00 to 0x4E80).map(_.toChar) ++ (0x3040 to 0x309F).map(_.toChar) ++
        (0xAC00 to 0xAC80).map(_.toChar),
      " .,!?0123456789-_…".toCharArray.toIndexedSeq).map(_.toArray)
    val rnd = new scala.util.Random(11)
    val docs = (0L until 200L).map { i =>
      val len = rnd.nextInt(80)
      val sb = new StringBuilder
      for (_ <- 0 until len) {
        val pool = pools(rnd.nextInt(pools.length))
        sb.append(pool(rnd.nextInt(pool.length)))
      }
      (i, sb.toString)
    }
    val got = PipelineOps.scriptMix(docs.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        (2 to 6).map(r.getLong).toList, r.getString(7))).toMap
    for ((id, t) <- docs) {
      val counts = ranges.map { case (_, ivs) =>
        t.count(c => ivs.exists { case (lo, hi) => c >= lo && c <= hi }).toLong
      }
      val total = counts.sum
      val milli = counts.map(c => if (total > 0) c * 1000 / total else 0L).toList
      // strictly-greater fold: earliest index achieving the max wins
      var main = 0
      for (j <- 1 until counts.size) if (counts(j) > counts(main)) main = j
      val (gTotal, gMilli, gMain) = got(id)
      assert(gTotal === total, s"doc $id total")
      assert(gMilli === milli, s"doc $id milli")
      assert(gMain === ranges(main)._1, s"doc $id main")
    }
  }

  test("readability fuzz: random texts match a restated formula") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val wordsPool = Seq("the", "data", "xyz", "rhythm", "a", "42", "pipeline",
      "readability", "io", "qqq", "stream!", "fast.", "why?")
    val docs = (0L until 150L).map { i =>
      val n = 1 + rnd.nextInt(30)
      (i, Seq.fill(n)(wordsPool(rnd.nextInt(wordsPool.size))).mkString(" ") +
        (if (rnd.nextBoolean()) "." else ""))
    }
    val got = PipelineOps.readability(docs.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    for ((id, t) <- docs) {
      val words = t.split("\\s+").filter(_.nonEmpty)
      val sentences = math.max("[.!?]+".r.findAllIn(t).size, 1)
      val syl = "[aeiouy]+".r.findAllIn(t.toLowerCase).size +
        words.count(w => !w.toLowerCase.exists("aeiouy".contains(_)))
      val flesch = math.rint((206.835 - 1.015 * (words.length.toDouble / sentences) -
        84.6 * (syl.toDouble / words.length)) * 1e4) / 1e4
      val (gw, gs, gsy, gf) = got(id)
      assert(gw === words.length.toLong, s"doc $id words")
      assert(gs === sentences.toLong, s"doc $id sentences")
      assert(gsy === syl.toLong, s"doc $id syllables")
      assert(math.abs(gf - flesch) < 1e-9, s"doc $id flesch")
    }
  }

  // --------------------------------------------- semantic decontamination

  test("semanticContamination matches brute-force nearest-benchmark scan") {
    import spark.implicits._
    val vs = genVectors(150, 24, 6, 0.25)
    val (bench, corpus) = vs.partition(_._1 % 10 == 0)
    val bDF = bench.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    val cDF = corpus.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
      .repartition(5)
    val t = 0.8
    val got = PipelineOps.semanticContamination(cDF, bDF, t)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    assert(got.size === corpus.size)
    for ((id, v) <- corpus) {
      val scored = bench.map { case (bid, bv) => (bid, cos(v, bv)) }
      val (bestId, bestC) = scored.maxBy { case (bid, c) => (c, -bid) }
      val (gBid, gCos, gFlag) = got(id)
      assert(gBid === bestId, s"corpus $id")
      assert(math.abs(gCos - math.rint(bestC * 1e4) / 1e4) < 1e-9, s"corpus $id")
      assert(gFlag === (bestC >= t), s"corpus $id")
    }
    // the threshold actually splits the corpus (test is non-vacuous)
    assert(got.values.exists(_._3) && got.values.exists(!_._3))
  }
}
