package graft.search

/** Block-max WAND dynamic pruning for top-k over a disjunction of BM25 term
  * scorers — the reference's headline optimization, algorithm replicated
  * from `/root/reference/src/query/boolean_query/block_wand.rs` (itself the
  * BMW algorithm of Ding & Suel, "Faster Top-k Document Retrieval Using
  * Block-Max Indexes"). Exactness: callback is invoked for every doc whose
  * score can exceed the threshold, so with a TopNComputer feeding back its
  * threshold, the result is identical to exhaustive evaluation (proven
  * property-wise in SearchSpec).
  */
object BlockWand {

  import Scorer.Terminated

  /** Multi-scorer WAND (block_wand.rs:148-212). `callback(doc, score)`
    * returns the new threshold.
    */
  def run(scorersIn: Seq[TermScorer], threshold0: Float, callback: (Int, Float) => Float): Unit = {
    var threshold = threshold0
    val scorers = scala.collection.mutable.ArrayBuffer[TermScorer]()
    scorersIn.foreach(s => if (!s.isTerminated) scorers += s)
    sortByDoc(scorers)
    // reusable scratch for query-leg-order scoring: the hot loop must not
    // allocate (every matched doc passes through it when pruning can't bite)
    val scratch = new Array[TermScorer](scorers.length)

    while (scorers.nonEmpty) {
      // find pivot (block_wand.rs:16-43)
      var maxScoreSum = 0.0f
      var beforePivotLen = 0
      var pivotDoc = Terminated
      while (pivotDoc == Terminated && beforePivotLen < scorers.length) {
        maxScoreSum += scorers(beforePivotLen).maxScore
        if (maxScoreSum > threshold) pivotDoc = scorers(beforePivotLen).doc
        else beforePivotLen += 1
      }
      if (pivotDoc == Terminated) return
      var pivotLen = beforePivotLen + 1
      while (pivotLen < scorers.length && scorers(pivotLen).doc == pivotDoc) pivotLen += 1

      // block max upper bound across scorers up to pivot (block_wand.rs:166-177)
      var blockMaxUpper = 0.0f
      var i = 0
      while (i < pivotLen) {
        scorers(i).seekBlock(pivotDoc)
        blockMaxUpper += scorers(i).blockMaxScore
        i += 1
      }

      if (blockMaxUpper <= threshold) {
        blockMaxWasTooLowAdvanceOneScorer(scorers, pivotLen)
      } else if (alignScorers(scorers, pivotDoc, beforePivotLen)) {
        // all scorers [0, pivotLen) positioned on pivotDoc: score it,
        // summing in canonical query-leg order (bit-identical to the
        // exhaustive Union path); insertion sort on the scratch array,
        // no allocation
        i = 0
        while (i < pivotLen) { scratch(i) = scorers(i); i += 1 }
        i = 1
        while (i < pivotLen) {
          val t = scratch(i)
          var j = i - 1
          while (j >= 0 && scratch(j).ord > t.ord) { scratch(j + 1) = scratch(j); j -= 1 }
          scratch(j + 1) = t
          i += 1
        }
        var s = 0.0f
        i = 0
        while (i < pivotLen) { s += scratch(i).score; i += 1 }
        if (s > threshold) threshold = callback(pivotDoc, s)
        // advance all scorers on the pivot (block_wand.rs:131-146)
        i = 0
        while (i < pivotLen) { scorers(i).advance(); i += 1 }
        sortByDoc(scorers) // mostly sorted: insertion restore, in place
        removeTerminated(scorers)
      }
      // else: align failed; outer loop re-picks a pivot (ordering restored inside)
    }
  }

  /** In-place insertion sort by current doc (inputs are nearly sorted). */
  private def sortByDoc(a: scala.collection.mutable.ArrayBuffer[TermScorer]): Unit = {
    var i = 1
    while (i < a.length) {
      val t = a(i)
      var j = i - 1
      while (j >= 0 && a(j).doc > t.doc) { a(j + 1) = a(j); j -= 1 }
      a(j + 1) = t
      i += 1
    }
  }

  /** block_wand.rs:49-80 — pick the highest-max-score scorer among
    * [0, pivotLen), seek it past the smallest last_doc_in_block, restore
    * ordering.
    */
  private def blockMaxWasTooLowAdvanceOneScorer(
      scorers: scala.collection.mutable.ArrayBuffer[TermScorer],
      pivotLen: Int): Unit = {
    var scorerToSeek = pivotLen - 1
    var globalMaxScore = scorers(scorerToSeek).maxScore
    var docToSeekAfter = scorers(scorerToSeek).lastDocInBlock
    var ord = pivotLen - 2
    while (ord >= 0) {
      if (scorers(ord).lastDocInBlock <= docToSeekAfter) docToSeekAfter = scorers(ord).lastDocInBlock
      if (scorers(ord).maxScore > globalMaxScore) {
        globalMaxScore = scorers(ord).maxScore
        scorerToSeek = ord
      }
      ord -= 1
    }
    if (docToSeekAfter != Terminated) docToSeekAfter += 1
    var i = pivotLen
    while (i < scorers.length) {
      if (scorers(i).doc <= docToSeekAfter) docToSeekAfter = scorers(i).doc
      i += 1
    }
    scorers(scorerToSeek).seek(docToSeekAfter)
    restoreOrdering(scorers, scorerToSeek)
    removeTerminated(scorers)
  }

  /** Bubble scorers(ord) (which may have advanced) back into sorted-by-doc
    * position (block_wand.rs:85-97).
    */
  private def restoreOrdering(
      scorers: scala.collection.mutable.ArrayBuffer[TermScorer], ord: Int): Unit = {
    val d = scorers(ord).doc
    var i = ord + 1
    while (i < scorers.length && scorers(i).doc < d) {
      val tmp = scorers(i); scorers(i) = scorers(i - 1); scorers(i - 1) = tmp
      i += 1
    }
  }

  private def removeTerminated(scorers: scala.collection.mutable.ArrayBuffer[TermScorer]): Unit = {
    // terminated scorers have doc == Terminated == Int.MaxValue, so after
    // restoreOrdering they sit at the tail
    while (scorers.nonEmpty && scorers.last.isTerminated) scorers.remove(scorers.length - 1)
  }

  /** Seek scorers [0, beforePivotLen) to the pivot (block_wand.rs:102-126);
    * false when one of them went past it (ordering restored).
    */
  private def alignScorers(
      scorers: scala.collection.mutable.ArrayBuffer[TermScorer],
      pivotDoc: Int,
      beforePivotLen: Int): Boolean = {
    var i = beforePivotLen - 1
    while (i >= 0) {
      val newDoc = scorers(i).seek(pivotDoc)
      if (newDoc != pivotDoc) {
        restoreOrdering(scorers, i)
        removeTerminated(scorers)
        return false
      }
      i -= 1
    }
    true
  }

  /** Single-scorer fast path (block_wand.rs:222-261). */
  def runSingle(scorer: TermScorer, threshold0: Float, callback: (Int, Float) => Float): Unit = {
    var threshold = threshold0
    if (scorer.isTerminated) return
    var doc = scorer.doc
    while (true) {
      while (scorer.blockMaxScore < threshold) {
        val lastDoc = scorer.lastDocInBlock
        if (lastDoc == Terminated) return
        doc = lastDoc + 1
        scorer.seekBlock(doc)
      }
      doc = scorer.seek(doc)
      if (doc == Terminated) return
      var done = false
      while (!done) {
        val s = scorer.score
        if (s > threshold) threshold = callback(doc, s)
        if (doc == scorer.lastDocInBlock) done = true
        else {
          doc = scorer.advance()
          if (doc == Terminated) return
        }
      }
      doc += 1
      scorer.seekBlock(doc)
    }
  }
}
