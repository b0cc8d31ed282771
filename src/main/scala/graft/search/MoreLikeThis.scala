package graft.search

import graft.analysis.Analyzer

/** MoreLikeThis: build a boolean query from a document's top TF-IDF terms
  * (Lucene-style; `/root/reference/src/query/more_like_this/more_like_this.rs:48`).
  * Driver-side composition: term stats come from the searcher's pruned
  * aggregates, then it is an ordinary boosted OR query.
  */
object MoreLikeThis {

  final case class Config(
      minTermFreq: Int = 2,
      minDocFreq: Int = 5,
      maxQueryTerms: Int = 25,
      minWordLength: Int = 0,
      maxWordLength: Int = 0,
      boost: Boolean = true)

  /** Build the query from a raw document text (analyzed with the index's
    * own named chain, so seed terms live in the index's term space).
    */
  def query(searcher: Searcher, field: String, docText: String,
      cfg: Config = Config()): Query = {
    val terms = Analyzer.chain(searcher.manifest.textAnalyzer)(docText).map(_.text)
    val tf = terms.groupBy(identity).view.mapValues(_.size).toMap
      .filter { case (t, f) =>
        f >= cfg.minTermFreq &&
          (cfg.minWordLength == 0 || t.length >= cfg.minWordLength) &&
          (cfg.maxWordLength == 0 || t.length <= cfg.maxWordLength)
      }
    if (tf.isEmpty) return Query.Nothing
    val n = searcher.manifest.totalDocs
    val dfs = searcher.docFreqsPublic(tf.keySet.map(field -> _))
    val scored = tf.toSeq.flatMap { case (t, f) =>
      val df = dfs((field, t))
      if (df < cfg.minDocFreq || df == 0) None
      else {
        val idf = math.log(n.toDouble / df.toDouble)
        Some((t, f * idf))
      }
    }.sortBy { case (t, s) => (-s, t) }.take(cfg.maxQueryTerms)
    if (scored.isEmpty) Query.Nothing
    else {
      val maxScore = scored.head._2
      Query.Bool(scored.map { case (t, s) =>
        val q: Query = if (cfg.boost) Query.Boost(Query.Term(field, t), (s / maxScore).toFloat)
          else Query.Term(field, t)
        Occur.Should -> q
      })
    }
  }
}

/** Snippet generation: highlighted fragments from stored text for top hits
  * (`/root/reference/src/snippet/mod.rs:116,377-435`) — driver-side
  * post-processing over the k fetched rows.
  */
object Snippets {

  /** Best fragment of <= maxChars containing the most query-term hits;
    * terms wrapped in <b></b>.
    */
  def snippet(text: String, queryTerms: Set[String], maxChars: Int = 150): String = {
    val toks = Analyzer.tokenize(text)
    if (toks.isEmpty) return ""
    val hits = toks.filter(t => queryTerms.contains(t.text))
    if (hits.isEmpty) return text.take(maxChars)
    // window with most hits within maxChars, greedy from each hit
    var bestStart = hits.head.offsetFrom
    var bestCount = 0
    hits.indices.foreach { i =>
      val start = hits(i).offsetFrom
      val count = hits.count(h => h.offsetFrom >= start && h.offsetTo <= start + maxChars)
      if (count > bestCount) { bestCount = count; bestStart = start }
    }
    val end = math.min(text.length, bestStart + maxChars)
    val inWindow = hits.filter(h => h.offsetFrom >= bestStart && h.offsetTo <= end)
    val sb = new java.lang.StringBuilder
    var cursor = bestStart
    inWindow.foreach { h =>
      if (h.offsetFrom >= cursor) {
        sb.append(text, cursor, h.offsetFrom).append("<b>")
          .append(text, h.offsetFrom, h.offsetTo).append("</b>")
        cursor = h.offsetTo
      }
    }
    sb.append(text, cursor, end)
    sb.toString
  }
}
