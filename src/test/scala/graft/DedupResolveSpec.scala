package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.PipelineOps

/** Connected-components (large-star/small-star) + dedup resolution, checked
  * against a driver-side union-find oracle on random graphs and the shapes
  * that break naive variants: long chains (diameter ≫ log n rounds — where
  * plain min-propagation needs diameter rounds), stars (hot-node skew), and
  * disconnected singletons.
  */
class DedupResolveSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // find() roots at the min because unions always hang the larger root
    nodes.map(x => x -> find(x)).toMap
  }

  private def ccOf(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("ia", "ib")
    PipelineOps.connectedComponents(df).as[(Long, Long)].collect().toMap
  }

  test("random graphs match a union-find oracle") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 5) {
      val n = 60 + trial * 40
      val m = n / 2 + rnd.nextInt(n)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val expect = unionFind(n, edges)
      assert(ccOf(edges) == expect, s"trial $trial: n=$n m=$m")
    }
  }

  test("long chain converges in O(log n) rounds, not diameter") {
    // 400-node path: diameter 399; maxRounds default 25 must suffice
    val edges = (0L until 399L).map(i => (i, i + 1))
    val cc = ccOf(edges)
    assert(cc.size == 400 && cc.values.forall(_ == 0L))
  }

  test("star and parallel duplicate edges") {
    val star = (1L to 50L).map(i => (i, 0L))
    val withDups = star ++ star ++ star.map(_.swap)
    val cc = ccOf(withDups)
    assert(cc.size == 51 && cc.values.forall(_ == 0L))
  }

  test("empty pair set yields empty mapping") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("ia", "ib")
    assert(PipelineOps.connectedComponents(empty).count() == 0L)
  }

  test("dedupResolve keeps exactly one canonical doc per cluster") {
    import spark.implicits._
    val docs = (0L until 30L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    // clusters {0,1,2}, {5,6}, rest singletons
    val pairs = Seq((1L, 0L), (2L, 1L), (5L, 6L)).toDF("ia", "ib")
    val r = PipelineOps.dedupResolve(docs, pairs)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    val canon = r.map(x => x._1 -> x._2).toMap
    assert(canon(0L) == 0L && canon(1L) == 0L && canon(2L) == 0L)
    assert(canon(5L) == 5L && canon(6L) == 5L)
    assert((0L until 30L).filterNot(Set(1L, 2L, 6L)).forall(i => canon(i) == i))
    // is_kept <=> doc_id == canonical; kept count = number of clusters
    assert(r.forall(x => x._3 == (x._1 == x._2)))
    assert(r.count(_._3) == 27)
  }
}
