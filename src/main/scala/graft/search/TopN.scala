package graft.search

/** Threshold-tracking top-n computer, semantics replicated from the
  * reference (`/root/reference/src/collector/top_score_collector.rs:512-683`):
  *
  *  - buffer capacity 2*max(n,1); on overflow select the n best, truncate,
  *    and set threshold = sort key of the best *excluded* element;
  *  - `push` rejects anything not STRICTLY greater than the threshold;
  *  - ties on score break by ascending doc (docs must be pushed in ascending
  *    doc order — the strict threshold then yields ascending-doc tie-breaks
  *    without comparing docs, exactly the reference's contract).
  *
  * `doc` is a Long so a global address (segmentOrd << 32 | docId) can be
  * ranked across segments at merge time.
  */
final class TopNComputer(topN: Int) {

  private val cap = math.max(topN, 1) * 2
  private val scores = new Array[Float](cap)
  private val docs = new Array[Long](cap)
  private var len = 0
  private var hasThreshold = false
  private var thresholdValue = Float.NegativeInfinity

  @inline def threshold: Float = if (hasThreshold) thresholdValue else Float.NegativeInfinity

  def push(score: Float, doc: Long): Unit = {
    if (hasThreshold && !(score > thresholdValue)) return
    if (len == cap) {
      thresholdValue = truncateTopN()
      hasThreshold = true
    }
    scores(len) = score
    docs(len) = doc
    len += 1
  }

  // order: score desc, then doc asc
  @inline private def better(i: Int, j: Int): Boolean =
    scores(i) > scores(j) || (scores(i) == scores(j) && docs(i) < docs(j))

  /** Keep the best topN entries; return the score of the best excluded one. */
  private def truncateTopN(): Float = {
    val idx = Array.range(0, len)
    // full sort of 2n elements: n is small (k or 2k); clarity over quickselect
    val sorted = idx.sortWith((a, b) => better(a, b))
    val keepScores = new Array[Float](cap)
    val keepDocs = new Array[Long](cap)
    var i = 0
    while (i < topN) { keepScores(i) = scores(sorted(i)); keepDocs(i) = docs(sorted(i)); i += 1 }
    val medianScore = scores(sorted(topN))
    System.arraycopy(keepScores, 0, scores, 0, topN)
    System.arraycopy(keepDocs, 0, docs, 0, topN)
    len = topN
    medianScore
  }

  /** Final top-n, sorted (score desc, doc asc). */
  def intoSortedVec(): Array[(Float, Long)] = {
    val idx = Array.range(0, len).sortWith((a, b) => better(a, b))
    val out = idx.take(topN).map(i => (scores(i), docs(i)))
    out
  }

  def size: Int = math.min(len, topN)
}
