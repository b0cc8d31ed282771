package graft.search

import graft.index.FieldNorms

/** BM25, replicated from `/root/reference/src/query/bm25.rs` with `Float`
  * arithmetic end-to-end (tantivy `Score = f32`, `src/lib.rs:312`):
  *  - K1 = 1.2, B = 0.75                               (bm25.rs:8-9)
  *  - idf = ln(1 + (N - n + 0.5)/(n + 0.5))            (bm25.rs:52-56)
  *  - weight = idf * (1 + K1)                          (bm25.rs:159)
  *  - score = weight * tf / (tf + K1*(1-B+B*dl/avgdl)) (bm25.rs:58-69,179-193)
  * with dl read from the 256-entry quantized fieldnorm cache.
  * Multi-term (phrase) weight = sum of per-term idfs    (bm25.rs:120-127).
  */
object Bm25 {
  val K1: Float = 1.2f
  val B: Float = 0.75f

  def idf(docFreq: Long, docCount: Long): Float = {
    require(docCount >= docFreq, s"docCount $docCount < docFreq $docFreq")
    val x = ((docCount - docFreq).toFloat + 0.5f) / (docFreq.toFloat + 0.5f)
    math.log((1.0f + x).toDouble).toFloat
  }

  private def cachedTfComponent(fieldnorm: Int, averageFieldnorm: Float): Float =
    K1 * (1.0f - B + B * fieldnorm.toFloat / averageFieldnorm)

  /** Weight bound to global stats; per-fieldnorm-id tf component is cached
    * exactly as the reference does (`compute_tf_cache`, bm25.rs:62-69).
    * `idfExplain` (nullable) carries the idf derivation for `explain`
    * (bm25.rs:74,158-166) — it does not participate in scoring.
    */
  final class Weight(val weight: Float, val averageFieldnorm: Float,
      val idfExplain: Explanation = null) extends Serializable {
    val cache: Array[Float] = Array.tabulate(256) { id =>
      cachedTfComponent(FieldNorms.idToFieldNorm(id), averageFieldnorm)
    }
    @inline def tfFactor(normId: Int, termFreq: Int): Float = {
      val tf = termFreq.toFloat
      tf / (tf + cache(normId & 0xff))
    }
    @inline def score(normId: Int, termFreq: Int): Float = weight * tfFactor(normId, termFreq)
    def maxScore: Float = score(255, 2013265944)
    def boostBy(boost: Float): Weight =
      if (boost == 1.0f) this else new Weight(weight * boost, averageFieldnorm, idfExplain)

    /** Explanation of one doc's BM25 score — Lucene-style wording, as the
      * reference's `Bm25Weight::explain` (bm25.rs:196-226).
      */
    def explain(normId: Int, termFreq: Int): Explanation = {
      val s = score(normId, termFreq)
      val norm = cache(normId & 0xff)
      val tf = termFreq.toFloat
      val rightFactor = tf / (tf + norm)
      val tfExplanation = Explanation("freq / (freq + k1 * (1 - b + b * dl / avgdl))", rightFactor)
        .addConst("freq, occurrences of term within document", tf)
        .addConst("k1, term saturation parameter", K1)
        .addConst("b, length normalization parameter", B)
        .addConst("dl, length of field", FieldNorms.idToFieldNorm(normId & 0xff).toFloat)
        .addConst("avgdl, average length of field", averageFieldnorm)
      var e = Explanation("TermQuery, product of...", s)
        .addDetail(Explanation("(K1+1)", K1 + 1.0f))
      if (idfExplain != null) e = e.addDetail(idfExplain)
      e.addDetail(tfExplanation)
    }
  }

  /** `Bm25Weight::for_one_term` (bm25.rs:131-147), incl. the idf explanation. */
  def forOneTerm(termDocFreq: Long, totalNumDocs: Long, avgFieldnorm: Float): Weight = {
    val idfV = idf(termDocFreq, totalNumDocs)
    val idfExplain =
      Explanation("idf, computed as log(1 + (N - n + 0.5) / (n + 0.5))", idfV)
        .addConst("n, number of docs containing this term", termDocFreq.toFloat)
        .addConst("N, total number of docs", totalNumDocs.toFloat)
    new Weight(idfV * (1.0f + K1), avgFieldnorm, idfExplain)
  }

  /** `Bm25Weight::for_terms` (bm25.rs:94-129): avgdl = totalTokens/totalDocs;
    * one term -> for_one_term; several -> sum of idfs.
    */
  def forTerms(docFreqs: Seq[Long], totalNumDocs: Long, totalNumTokens: Long): Weight = {
    require(docFreqs.nonEmpty)
    val avg = totalNumTokens.toFloat / totalNumDocs.toFloat
    if (docFreqs.size == 1) forOneTerm(docFreqs.head, totalNumDocs, avg)
    else {
      var idfSum = 0.0f
      docFreqs.foreach(df => idfSum += idf(df, totalNumDocs))
      new Weight(idfSum * (1.0f + K1), avg, Explanation("idf", idfSum))
    }
  }
}
