package graft.codec

/** Doc-ordered postings cursor with per-doc positions — the slice of the
  * reference's `Postings` trait (`/root/reference/src/postings/mod.rs:17-44`)
  * that phrase scoring consumes. `SegmentPostings` is the single-term
  * implementation; `UnionPostings` unions several term cursors into one
  * position source, which is what a regex-phrase slot compiles to
  * (`/root/reference/src/query/union/simple_union.rs:46-68`,
  * `src/query/phrase_query/regex_phrase_weight.rs:58-99`).
  */
trait PositionedPostings {
  def doc: Int
  def advance(): Int
  def seek(target: Int): Int
  /** Upper bound on matching docs — drives intersection leg ordering. */
  def docFreq: Int
  /** Positions of the current doc (ascending). Calls must be made with
    * non-decreasing current docs.
    */
  def positionsForCurrent(): Array[Int]
}

/** Union of several term posting cursors presented as one docset whose
  * per-doc positions are the sorted, deduplicated union of the members'
  * positions (`SimpleUnion::append_positions_with_offset`,
  * `simple_union.rs:59-67`). Used per regex-phrase slot: every dictionary
  * term matching the slot's pattern contributes its occurrences.
  */
final class UnionPostings(subs: Array[SegmentPostings]) extends PositionedPostings {

  private var cur: Int = {
    var m = PostingsCodec.Terminated
    var i = 0
    while (i < subs.length) { if (subs(i).doc < m) m = subs(i).doc; i += 1 }
    m
  }

  def doc: Int = cur

  def advance(): Int = {
    var m = PostingsCodec.Terminated
    var i = 0
    while (i < subs.length) {
      val s = subs(i)
      if (s.doc <= cur) s.advance()
      if (s.doc < m) m = s.doc
      i += 1
    }
    cur = m
    cur
  }

  def seek(target: Int): Int = {
    if (cur >= target) return cur
    var m = PostingsCodec.Terminated
    var i = 0
    while (i < subs.length) {
      val s = subs(i)
      if (s.doc < target) s.seek(target)
      if (s.doc < m) m = s.doc
      i += 1
    }
    cur = m
    cur
  }

  val docFreq: Int = {
    var s = 0L
    var i = 0
    while (i < subs.length) { s += subs(i).docFreq; i += 1 }
    math.min(s, Int.MaxValue.toLong).toInt
  }

  def positionsForCurrent(): Array[Int] = {
    val buf = new scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    while (i < subs.length) {
      if (subs(i).doc == cur) buf ++= subs(i).positionsForCurrent()
      i += 1
    }
    val arr = buf.toArray
    java.util.Arrays.sort(arr)
    // dedup in place
    var w = 0
    var r = 0
    while (r < arr.length) {
      if (w == 0 || arr(r) != arr(w - 1)) { arr(w) = arr(r); w += 1 }
      r += 1
    }
    if (w == arr.length) arr else java.util.Arrays.copyOf(arr, w)
  }
}
