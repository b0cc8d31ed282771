package graft.codec

import graft.codec.Codec._

/** Encoded posting list for one (field, term) within one segment.
  *
  * Layout (ours; same information content as the reference's postings +
  * skip + positions files, `/root/reference/src/postings/serializer.rs:300-470`,
  * `src/postings/skip.rs:51-86`, `src/positions/mod.rs:1-30`):
  *
  *  - `postings`: per 128-doc block, doc-id deltas bitpacked at `docBits`
  *    then (tf-1) bitpacked at `tfBits`. Unlike the reference we bitpack the
  *    partial tail block too (uniform code path; the reference VInts it).
  *  - `skip`: one fixed 15-byte entry per block (including the tail):
  *    lastDoc:4 | docBits:1 | tfBits:1 | minNormId:1 | maxTf:4 | cumTfEnd:4
  *    (big-endian ints). `minNormId`/`maxTf` give a block-max score bound
  *    valid for ANY global avgdl: tf/(tf+norm) is increasing in tf and
  *    decreasing in norm, so score(minNormId, maxTf) >= every in-block score.
  *    (The reference stores the argmax pair under segment-local stats,
  *    serializer.rs:391-416 — our bound is never lower than the true block
  *    max, so WAND pruning stays lossless even when global stats drift from
  *    segment stats after merges.)
  *  - `positions`: flat VInt stream of position deltas, restarting at each
  *    doc (first position absolute). Sequential-cursor decode; doc sets are
  *    always consumed in ascending doc order so no random access is needed;
  *    `cumTfEnd` lets a cursor skip whole blocks (same role as the
  *    reference's per-block tf_sum, skip.rs:75-80).
  */
final case class EncodedPostings(
    docFreq: Int,
    totalTf: Long,
    postings: Array[Byte],
    skip: Array[Byte],
    positions: Array[Byte])

object PostingsCodec {

  val SkipEntryBytes = 15
  val Terminated: Int = Int.MaxValue

  /** Encode one posting list. `docs` ascending; `tfs(i)` >= 1;
    * `positionsFlat` = concatenation of each doc's ascending positions
    * (doc i owns the slice of length tfs(i) after the first i slices; null
    * when positions are not recorded); `normIdOf(docId)` = quantized
    * fieldnorm id for block-max (null for unscored fields).
    */
  def encode(
      docs: Array[Int],
      tfs: Array[Int],
      positionsFlat: Array[Int],
      normIdOf: Int => Byte,
      withFreqs: Boolean): EncodedPostings = {
    val n = docs.length
    require(n > 0, "empty posting list")
    val numBlocks = (n + BlockSize - 1) / BlockSize
    val post = new ByteVector(n * 2)
    val skip = new ByteVector(numBlocks * SkipEntryBytes)
    val posOut = new ByteVector(16)
    val deltaBuf = new Array[Int](BlockSize)
    val tfBuf = new Array[Int](BlockSize)
    var prevDoc = 0
    var cumTf = 0L
    var b = 0
    while (b < numBlocks) {
      val start = b * BlockSize
      val len = math.min(BlockSize, n - start)
      var i = 0
      var minNorm = 255
      var maxTf = 1
      while (i < len) {
        val d = docs(start + i)
        deltaBuf(i) = d - prevDoc
        prevDoc = d
        val tf = if (withFreqs) tfs(start + i) else 1
        tfBuf(i) = tf - 1
        cumTf += tf
        if (tf > maxTf) maxTf = tf
        if (normIdOf != null) {
          val nid = normIdOf(d) & 0xff
          if (nid < minNorm) minNorm = nid
        }
        i += 1
      }
      if (normIdOf == null) minNorm = 0
      val docBits = maxBitsRequired(deltaBuf, 0, len)
      packBits(deltaBuf, 0, len, docBits, post)
      var tfBits = 0
      if (withFreqs) {
        tfBits = maxBitsRequired(tfBuf, 0, len)
        packBits(tfBuf, 0, len, tfBits, post)
      }
      // skip entry
      writeIntBE(skip, docs(start + len - 1))
      skip += docBits.toByte
      skip += tfBits.toByte
      skip += minNorm.toByte
      writeIntBE(skip, maxTf)
      writeIntBE(skip, cumTf.toInt)
      b += 1
    }
    if (positionsFlat != null) {
      var i = 0
      var p = 0
      while (i < n) {
        val tf = tfs(i)
        var prev = 0
        var j = 0
        while (j < tf) {
          writeVInt(posOut, (positionsFlat(p) - prev).toLong)
          prev = positionsFlat(p)
          p += 1
          j += 1
        }
        i += 1
      }
    }
    EncodedPostings(n, cumTf, post.toArray, skip.toArray, posOut.toArray)
  }

  /** Merge-path encode: like `encode` but positions arrive already VInt-
    * encoded (concatenated source streams — position deltas are docId-
    * independent so rebasing never touches them) and per-doc norm ids are
    * conservative lower bounds carried over from the sources' skip data
    * (min over overlapping source blocks). Lower-bound norm ids can only
    * RAISE the per-block max-score bound, so WAND pruning stays lossless
    * after merges (cf. serializer.rs:391-416, which recomputes exactly —
    * the reference has the norms file at hand during merge; we avoid
    * shipping norms into the per-term merge shuffle).
    */
  def encodeWithNormBounds(
      docs: Array[Int],
      tfs: Array[Int],
      positionsRaw: Array[Byte],
      normBounds: Array[Byte]): EncodedPostings = {
    val e = encode(docs, tfs, null, null, withFreqs = true)
    // rewrite skip entries' minNormId from the bounds
    val skip = e.skip.clone()
    val numBlocks = (docs.length + BlockSize - 1) / BlockSize
    var b = 0
    while (b < numBlocks) {
      val start = b * BlockSize
      val len = math.min(BlockSize, docs.length - start)
      var minNorm = 255
      var i = 0
      while (i < len) {
        val nid = normBounds(start + i) & 0xff
        if (nid < minNorm) minNorm = nid
        i += 1
      }
      skip(b * SkipEntryBytes + 6) = minNorm.toByte
      b += 1
    }
    EncodedPostings(e.docFreq, e.totalTf, e.postings, skip,
      if (positionsRaw == null) Array.emptyByteArray else positionsRaw)
  }

  @inline private def writeIntBE(out: ByteVector, v: Int): Unit = {
    out += ((v >>> 24) & 0xff).toByte
    out += ((v >>> 16) & 0xff).toByte
    out += ((v >>> 8) & 0xff).toByte
    out += (v & 0xff).toByte
  }

  @inline def readIntBE(a: Array[Byte], p: Int): Int =
    ((a(p) & 0xff) << 24) | ((a(p + 1) & 0xff) << 16) | ((a(p + 2) & 0xff) << 8) | (a(p + 3) & 0xff)

  /** Full decode for the merge path: (docs, tfs, perDocNormLowerBound).
    * The norm bound of a doc is its source block's minNormId.
    */
  def decodeAll(docFreq: Int, postings: Array[Byte], skip: Array[Byte], readFreqs: Boolean)
      : (Array[Int], Array[Int], Array[Byte]) = {
    val it = new SegmentPostings(docFreq, postings, skip, Array.emptyByteArray, readFreqs)
    val docs = new Array[Int](docFreq)
    val tfs = new Array[Int](docFreq)
    val bounds = new Array[Byte](docFreq)
    val numBlocks = (docFreq + BlockSize - 1) / BlockSize
    var i = 0
    while (i < docFreq) {
      docs(i) = it.doc
      tfs(i) = if (readFreqs) it.termFreq else 1
      bounds(i) = skip((i / BlockSize) * SkipEntryBytes + 6)
      it.advance()
      i += 1
    }
    require(numBlocks * SkipEntryBytes == skip.length, "skip length mismatch")
    (docs, tfs, bounds)
  }
}

/** Skip data parsed once per posting list — shared across the (possibly
  * many) cursor instances a query batch creates over the same term, so
  * per-cursor setup is O(1), not O(blocks).
  */
final class ParsedSkip(skip: Array[Byte], val docFreq: Int) {
  import PostingsCodec._
  val numBlocks: Int = (docFreq + BlockSize - 1) / BlockSize
  val lastDocs = new Array[Int](numBlocks)
  val docBitsArr = new Array[Byte](numBlocks)
  val tfBitsArr = new Array[Byte](numBlocks)
  val minNormIds = new Array[Byte](numBlocks)
  val maxTfs = new Array[Int](numBlocks)
  val cumTfEnds = new Array[Int](numBlocks)
  // byte offset of block in postings
  val blockOffsets = new Array[Int](numBlocks)
  @inline def blockLen(b: Int): Int =
    if (b == numBlocks - 1) docFreq - b * BlockSize else BlockSize
  locally {
    var off = 0
    var b = 0
    while (b < numBlocks) {
      val p = b * SkipEntryBytes
      lastDocs(b) = readIntBE(skip, p)
      docBitsArr(b) = skip(p + 4)
      tfBitsArr(b) = skip(p + 5)
      minNormIds(b) = skip(p + 6)
      maxTfs(b) = readIntBE(skip, p + 7)
      cumTfEnds(b) = readIntBE(skip, p + 11)
      blockOffsets(b) = off
      val len = blockLen(b)
      off += packedByteLen(len, docBitsArr(b) & 0xff) + packedByteLen(len, tfBitsArr(b) & 0xff)
      b += 1
    }
  }
}

/** Decoding iterator over one encoded posting list: the DocSet contract of
  * the reference (`/root/reference/src/docset.rs:18-167`) — `doc/advance/seek`
  * plus shallow block seeking and block-max metadata for WAND
  * (`src/postings/block_segment_postings.rs:142-296`).
  */
final class SegmentPostings(
    postings: Array[Byte],
    parsed: ParsedSkip,
    positionsBytes: Array[Byte],
    readFreqs: Boolean) extends PositionedPostings {

  import PostingsCodec._

  def this(docFreq: Int, postings: Array[Byte], skip: Array[Byte],
      positionsBytes: Array[Byte], readFreqs: Boolean) =
    this(postings, new ParsedSkip(skip, docFreq), positionsBytes, readFreqs)

  val docFreq: Int = parsed.docFreq
  val numBlocks: Int = parsed.numBlocks
  private val lastDocs = parsed.lastDocs
  private val docBitsArr = parsed.docBitsArr
  private val tfBitsArr = parsed.tfBitsArr
  private val minNormIds = parsed.minNormIds
  private val maxTfs = parsed.maxTfs
  private val cumTfEnds = parsed.cumTfEnds
  private val blockOffsets = parsed.blockOffsets

  @inline def blockLen(b: Int): Int = parsed.blockLen(b)

  private val docBuf = new Array[Int](BlockSize)
  private val tfBuf = new Array[Int](BlockSize)
  private var curBlock = -1 // shallow cursor
  private var loadedBlock = -1
  private var idx = 0
  private var curDoc = 0

  // positions cursor (sequential, ascending-doc consumption only)
  private var posCursor: Codec.ByteCursor = null
  private var posConsumedTf = 0 // number of position values fully consumed

  locally {
    seekBlockIdx(0)
    loadBlock()
    idx = -1
    advance()
  }

  @inline def doc: Int = curDoc
  @inline def termFreq: Int = { ensureLoaded(); tfBuf(idx) + 1 }

  @inline private def ensureLoaded(): Unit = if (loadedBlock != curBlock) loadBlock()

  private def seekBlockIdx(b: Int): Unit = { curBlock = b }

  def loadBlock(): Unit = {
    val b = curBlock
    if (b >= numBlocks) { loadedBlock = b; return }
    val len = blockLen(b)
    val base = if (b == 0) 0 else lastDocs(b - 1)
    var off = blockOffsets(b)
    off += unpackBits(postings, off, len, docBitsArr(b) & 0xff, docBuf, 0)
    // un-delta
    var prev = base
    var i = 0
    while (i < len) { prev += docBuf(i); docBuf(i) = prev; i += 1 }
    if (readFreqs) {
      unpackBits(postings, off, len, tfBitsArr(b) & 0xff, tfBuf, 0)
    }
    loadedBlock = b
  }

  /** Shallow: advance block cursor so current block may contain target
    * (i.e. first block with lastDoc >= target). Does not decode.
    */
  def seekBlock(target: Int): Unit = {
    var b = curBlock
    while (b < numBlocks && lastDocs(b) < target) b += 1
    if (b != curBlock) seekBlockIdx(b)
  }

  /** First doc >= target; TERMINATED when exhausted. */
  def seek(target: Int): Int = {
    if (curDoc >= target) return curDoc
    seekBlock(target)
    if (curBlock >= numBlocks) { curDoc = Terminated; return curDoc }
    if (loadedBlock != curBlock) { loadBlock(); idx = 0 }
    val len = blockLen(curBlock)
    // binary search within block for first >= target (lastDocs guarantees
    // docBuf(len-1) >= target here)
    var lo = math.max(idx, 0)
    var hi = len - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (docBuf(mid) < target) lo = mid + 1 else hi = mid
    }
    idx = lo
    curDoc = docBuf(idx)
    curDoc
  }

  /** Next doc; TERMINATED when exhausted. */
  def advance(): Int = {
    if (curBlock >= numBlocks) { curDoc = Terminated; return curDoc }
    if (loadedBlock != curBlock) { loadBlock(); idx = -1 }
    idx += 1
    if (idx >= blockLen(curBlock)) {
      if (curBlock + 1 >= numBlocks) { curBlock += 1; curDoc = Terminated; return curDoc }
      seekBlockIdx(curBlock + 1)
      loadBlock()
      idx = 0
    }
    curDoc = docBuf(idx)
    curDoc
  }

  def isTerminated: Boolean = curDoc == Terminated

  /** Last doc of current (shallow) block; TERMINATED past the end. */
  def lastDocInBlock: Int = if (curBlock >= numBlocks) Terminated else lastDocs(curBlock)

  def blockMinNormId: Byte = if (curBlock >= numBlocks) 0 else minNormIds(curBlock)
  def blockMaxTf: Int = if (curBlock >= numBlocks) 0 else maxTfs(curBlock)

  /** Block-max accessors by block index — TermScorer computes its global
    * max score with the actual query-time Bm25 weight over these, so the
    * bound uses the real cache ordering, not a proxy.
    */
  def blockCount: Int = numBlocks
  def blockMinNormIdAt(b: Int): Byte = minNormIds(b)
  def blockMaxTfAt(b: Int): Int = maxTfs(b)

  /** Cumulative term frequency before the current doc — offset into the
    * position stream (ascending-doc sequential consumption only).
    */
  private def cumTfBeforeCurrent: Int = {
    ensureLoaded()
    val before = if (curBlock == 0) 0 else cumTfEnds(curBlock - 1)
    var s = 0
    var i = 0
    while (i < idx) { s += tfBuf(i) + 1; i += 1 }
    before + s
  }

  /** Decode the positions of the current doc. Must be called with
    * non-decreasing current docs across calls.
    */
  def positionsForCurrent(): Array[Int] = {
    if (posCursor == null) posCursor = new Codec.ByteCursor(positionsBytes, 0)
    val target = cumTfBeforeCurrent
    if (target < posConsumedTf) throw new IllegalStateException("positions cursor moved backwards")
    posCursor.skipVInts(target - posConsumedTf)
    posConsumedTf = target
    val tf = termFreq
    val out = new Array[Int](tf)
    var prev = 0
    var i = 0
    while (i < tf) { prev += posCursor.readVInt(); out(i) = prev; i += 1 }
    posConsumedTf += tf
    out
  }
}
