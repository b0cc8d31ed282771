package graft.analysis.snowball

/** Shared primitives for the Snowball stemmer family.
  *
  * The reference exposes 18 stemmer languages
  * (`/root/reference/src/tokenizer/stemmer.rs:12-30`, via `rust_stemmers`);
  * each Scala implementation here is written from the published Snowball
  * algorithm descriptions (snowballstem.org, Snowball 2.x) and is gated
  * against golden `word \t stem` fixtures under `src/test/resources/stem/`
  * generated from PostgreSQL 15's `dict_snowball` (the same published
  * algorithms, compiled) — see `tools/gen_stem_fixtures.py`.
  */
private[analysis] object Snow {

  /** Index in `sufs` of the longest entry that is a suffix of `w`, or -1.
    * Linear scan (suffix inventories are < 200 entries); ties cannot occur
    * because entries are distinct strings.
    */
  def longestSuffix(w: String, sufs: Array[String]): Int = {
    var best = -1
    var bestLen = -1
    var i = 0
    while (i < sufs.length) {
      val s = sufs(i)
      if (s.length > bestLen && w.length >= s.length &&
          w.regionMatches(w.length - s.length, s, 0, s.length)) {
        best = i
        bestLen = s.length
      }
      i += 1
    }
    best
  }

  /** Like [[longestSuffix]], but only considers suffixes lying entirely in
    * the region starting at `p` — snowball's
    * `setlimit tomark p1 for ([substring]) among(...)`: a longer suffix that
    * overflows the region does NOT shadow a shorter one inside it.
    */
  def longestSuffixIn(w: String, sufs: Array[String], p: Int): Int = {
    var best = -1
    var bestLen = -1
    var i = 0
    val avail = w.length - p
    while (i < sufs.length) {
      val s = sufs(i)
      if (s.length > bestLen && s.length <= avail &&
          w.regionMatches(w.length - s.length, s, 0, s.length)) {
        best = i
        bestLen = s.length
      }
      i += 1
    }
    best
  }

  @inline def isVowel(c: Char, vowels: String): Boolean = vowels.indexOf(c) >= 0

  /** Standard R1: the region after the first non-vowel following a vowel
    * (word length if there is no such position).
    */
  def r1Standard(w: String, vowels: String): Int = {
    var i = 0
    while (i < w.length - 1) {
      if (isVowel(w.charAt(i), vowels) && !isVowel(w.charAt(i + 1), vowels)) return i + 2
      i += 1
    }
    w.length
  }

  /** Standard R2: R1 applied again starting from R1. */
  def r2Standard(w: String, vowels: String): Int = {
    val p1 = r1Standard(w, vowels)
    var i = p1
    while (i < w.length - 1) {
      if (isVowel(w.charAt(i), vowels) && !isVowel(w.charAt(i + 1), vowels)) return i + 2
      i += 1
    }
    w.length
  }

  /** Scandinavian / Dutch-style adjustment: the region before R1 must hold at
    * least 3 letters; words shorter than 3 letters get an empty R1 (snowball
    * `test(hop 3 setmark x)` fails, leaving p1 = limit).
    */
  def r1AtLeast3(w: String, vowels: String): Int = {
    if (w.length < 3) return w.length
    val p1 = r1Standard(w, vowels)
    if (p1 < 3) 3 else p1
  }

  /** True if a suffix of length `len` lies entirely inside the region
    * starting at `p`.
    */
  @inline def inRegion(w: String, len: Int, p: Int): Boolean = w.length - len >= p

  /** UTF-8 byte length of a BMP char (the stemmer alphabet has no surrogates). */
  @inline def utf8Len(c: Char): Int = if (c < 0x80) 1 else if (c < 0x800) 2 else 3

  /** Prefix byte offsets: `off(i)` = UTF-8 byte offset of char `i`; length
    * `w.length + 1`. Snowball's generated UTF-8 stemmers track cursor and
    * region marks in BYTES, so algorithms with literal position constants
    * (dutch.sbl's `try($p1 < 3 $p1 = 3)`) clamp at a byte offset, not a
    * code-point count — visible on words with multi-byte letters.
    */
  def byteOffsets(w: String): Array[Int] = {
    val off = new Array[Int](w.length + 1)
    var i = 0
    while (i < w.length) { off(i + 1) = off(i) + utf8Len(w.charAt(i)); i += 1 }
    off
  }
}
