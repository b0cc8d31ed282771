package graft.search

import org.scalatest.funsuite.AnyFunSuite

/** Selection test for the wide-union seek-density gate: a union advanced
  * sparsely by an outer driver (drivenBy << summed leg cost) must get the
  * linear k-way scan, a self-driven or densely-driven one the horizon-window
  * kernel (both are value-identical — SearchSpec pins that — so this is
  * purely the measured 3.4x plan choice, BENCH.md).
  */
class UnionGateSpec extends AnyFunSuite {

  private def legs(k: Int, costEach: Int): Seq[Scorer] =
    Seq.fill(k)(new graft.ArrayScorer(Array.tabulate(costEach)(_ * 7),
      Array.fill(costEach)(1.0f)): Scorer)

  test("sparse driver -> linear Union; dense/self driver -> BufferedUnion") {
    // 8 legs x 10k postings = 80k summed cost
    assert(QueryKernel.union(legs(8, 10000), 1, scored = true, drivenBy = 100)
      .isInstanceOf[Union])
    assert(QueryKernel.union(legs(8, 10000), 1, scored = true, drivenBy = 50000)
      .isInstanceOf[BufferedUnion])
    assert(QueryKernel.union(legs(8, 10000), 1, scored = true)
      .isInstanceOf[BufferedUnion]) // self-driven default
    // below the width threshold the linear scan always wins
    assert(QueryKernel.union(legs(3, 10000), 1, scored = true)
      .isInstanceOf[Union])
    // boundary: drivenBy == sum/4 qualifies
    assert(QueryKernel.union(legs(8, 10000), 1, scored = true, drivenBy = 20000)
      .isInstanceOf[BufferedUnion])
  }
}
