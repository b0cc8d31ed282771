package graft.analysis

import scala.collection.mutable.ArrayBuffer

/** A token produced by an analyzer chain.
  *
  * Mirrors the reference token model (`tokenizer-api/src/lib.rs:15` —
  * `Token{offset_from, offset_to, position, text}`): `position` is the token
  * ordinal assigned by the *tokenizer* (before any filter drops tokens), so
  * filtered-out tokens leave position gaps, exactly like the reference chain
  * where `SimpleTokenizer` stamps positions and `RemoveLongFilter` merely
  * skips tokens (`src/tokenizer/remove_long.rs:34-37`).
  */
final case class Token(text: String, position: Int, offsetFrom: Int, offsetTo: Int)

/** Tantivy-default analyzer chain, re-expressed in Scala:
  *
  *   SimpleTokenizer + RemoveLongFilter(40) + LowerCaser
  *
  * (registration: `/root/reference/src/tokenizer/tokenizer_manager.rs:56-67`).
  *
  * Semantics replicated exactly:
  *  - SimpleTokenizer: a token is a maximal run of Unicode-alphanumeric code
  *    points (`src/tokenizer/simple_tokenizer.rs:41-55`, Rust
  *    `char::is_alphanumeric` = Alphabetic or Number category);
  *  - RemoveLongFilter: drop tokens whose UTF-8 byte length is >= limit
  *    (strict `<` keeps; default limit 40, `src/tokenizer/remove_long.rs:34-37`);
  *  - LowerCaser: per-code-point Unicode lowercase with NO sigma/locale
  *    special-casing (`src/tokenizer/lower_caser.rs:44-60`).
  *
  * The corpus used by tests/benchmarks is restricted to code points where the
  * Rust and JVM character tables agree (SURVEY.md §7.4).
  */
object Analyzer extends Serializable {

  val DefaultLongTokenLimit = 40

  /** Rust `char::is_alphanumeric`: Alphabetic || Number (Nd|Nl|No). */
  @inline def isAlphanumeric(cp: Int): Boolean = {
    if (cp < 128) (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') || (cp >= '0' && cp <= '9')
    else Character.isAlphabetic(cp) || Character.isDigit(cp) || {
      val t = Character.getType(cp)
      t == Character.LETTER_NUMBER || t == Character.OTHER_NUMBER
    }
  }

  /** Per-code-point lowercase; 1:1 mapping (Character.toLowerCase), ASCII fast
    * path first. Full multi-char mappings are not applied — the generated
    * corpora avoid the affected code points.
    */
  def lowercase(s: String): String = {
    var i = 0
    var ascii = true
    var hasUpper = false
    while (ascii && i < s.length) {
      val c = s.charAt(i)
      if (c >= 128) ascii = false
      else if (c >= 'A' && c <= 'Z') hasUpper = true
      i += 1
    }
    if (ascii && !hasUpper) s // already-lowercase ASCII: no copy (web hot path)
    else if (ascii) {
      val out = new Array[Char](s.length)
      i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        out(i) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
        i += 1
      }
      new String(out)
    } else {
      val sb = new java.lang.StringBuilder(s.length)
      i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        sb.appendCodePoint(Character.toLowerCase(cp))
        i += Character.charCount(cp)
      }
      sb.toString
    }
  }

  /** UTF-8 byte length without materializing bytes. */
  def utf8Len(s: String): Int = {
    var n = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      n += (if (cp < 0x80) 1 else if (cp < 0x800) 2 else if (cp < 0x10000) 3 else 4)
      i += Character.charCount(cp)
    }
    n
  }

  /** SimpleTokenizer alone: maximal alphanumeric runs with ordinal positions. */
  def simpleTokens(text: String): ArrayBuffer[Token] = {
    val out = new ArrayBuffer[Token]()
    var i = 0
    var pos = -1
    val n = text.length
    while (i < n) {
      val cp = text.codePointAt(i)
      if (isAlphanumeric(cp)) {
        val start = i
        var j = i
        while (j < n && isAlphanumeric(text.codePointAt(j))) j += Character.charCount(text.codePointAt(j))
        pos += 1
        out += Token(text.substring(start, j), pos, start, j)
        i = j
      } else i += Character.charCount(cp)
    }
    out
  }

  /** Full default chain: simple -> remove_long(40) -> lowercase. */
  def tokenize(text: String, longLimit: Int = DefaultLongTokenLimit): ArrayBuffer[Token] = {
    val toks = simpleTokens(text)
    val out = new ArrayBuffer[Token](toks.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (utf8Len(t.text) < longLimit) out += t.copy(text = lowercase(t.text))
      i += 1
    }
    out
  }

  /** Allocation-free walk of the default chain (simple → remove_long(40) →
    * lowercase): calls `f(term, position)` per emitted token and returns the
    * emitted count. Bit-identical semantics to [[tokenize]] — positions are
    * assigned to every alphanumeric run (a dropped over-long token still
    * consumes its position, as RemoveLongFilter runs after the tokenizer) —
    * but no Token objects, no buffers, and no string copy for
    * already-lowercase ASCII runs. This is the index-build hot path: at
    * ~110 tokens/doc the materializing chain allocates ~10 KB of garbage
    * per document, which at 32 concurrent build tasks turns into the
    * memory-bandwidth bottleneck the 4N scaling leg pays for.
    */
  def foreachTerm(text: String, longLimit: Int = DefaultLongTokenLimit)(
      f: (String, Int) => Unit): Int = {
    var i = 0
    var pos = -1
    var kept = 0
    val n = text.length
    while (i < n) {
      val cp = text.codePointAt(i)
      if (isAlphanumeric(cp)) {
        val start = i
        var j = i
        var bytes = 0
        var asciiLower = true
        while (j < n && {
          val c = text.codePointAt(j)
          if (isAlphanumeric(c)) {
            bytes += (if (c < 0x80) 1 else if (c < 0x800) 2 else if (c < 0x10000) 3 else 4)
            if (c >= 128 || (c >= 'A' && c <= 'Z')) asciiLower = false
            true
          } else false
        }) j += Character.charCount(text.codePointAt(j))
        pos += 1
        if (bytes < longLimit) {
          val term =
            if (asciiLower) text.substring(start, j)
            else lowercase(text.substring(start, j))
          f(term, pos)
          kept += 1
        }
        i = j
      } else i += Character.charCount(cp)
    }
    kept
  }

  /** Term list only (analyzer output order). */
  def terms(text: String): ArrayBuffer[String] = {
    val toks = tokenize(text)
    val out = new ArrayBuffer[String](toks.length)
    var i = 0
    while (i < toks.length) { out += toks(i).text; i += 1 }
    out
  }

  /** Number of tokens the default chain emits — this is the fieldnorm input
    * (tokens counted after remove_long, as in the reference segment writer).
    */
  def tokenCount(text: String): Int = {
    val toks = simpleTokens(text)
    var n = 0
    var i = 0
    while (i < toks.length) { if (utf8Len(toks(i).text) < DefaultLongTokenLimit) n += 1; i += 1 }
    n
  }

  /** WhitespaceTokenizer (`src/tokenizer/whitespace_tokenizer.rs`). */
  def whitespaceTokens(text: String): ArrayBuffer[Token] = {
    val out = new ArrayBuffer[Token]()
    var i = 0
    var pos = -1
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (!Character.isWhitespace(c)) {
        val start = i
        var j = i
        while (j < n && !Character.isWhitespace(text.charAt(j))) j += 1
        pos += 1
        out += Token(text.substring(start, j), pos, start, j)
        i = j
      } else i += 1
    }
    out
  }

  /** Character n-gram shingles of the analyzed text (for MinHash / Jaccard
    * dedup); n-gram over the space-joined lowercased token stream so shingles
    * are insensitive to punctuation, mirroring common web-dedup practice.
    */
  def charShingles(text: String, n: Int): Set[String] = {
    val joined = terms(text).mkString(" ")
    if (joined.length < n) { if (joined.isEmpty) Set.empty else Set(joined) }
    else {
      val out = scala.collection.mutable.HashSet.empty[String]
      var i = 0
      while (i + n <= joined.length) { out += joined.substring(i, i + n); i += 1 }
      out.toSet
    }
  }

  /** Word n-gram shingles (token-level). */
  def wordShingles(text: String, n: Int): Set[String] = {
    val ts = terms(text)
    if (ts.length < n) { if (ts.isEmpty) Set.empty else Set(ts.mkString(" ")) }
    else (0 to ts.length - n).map(i => ts.slice(i, i + n).mkString(" ")).toSet
  }

  // ---------------------------------------------- auxiliary analyzers (§2.5)

  /** NgramTokenizer (`src/tokenizer/ngram_tokenizer.rs:10-30`): every
    * codepoint n-gram with minGram <= len <= maxGram, emitted in start
    * order, shorter grams first; `prefixOnly` keeps only grams anchored at
    * the text start. All positions are 0, exactly like the reference.
    */
  def ngramTokens(text: String, minGram: Int, maxGram: Int,
      prefixOnly: Boolean = false): ArrayBuffer[Token] = {
    require(minGram > 0, "minGram must be greater than 0")
    require(minGram <= maxGram, "minGram must not be greater than maxGram")
    // codepoint frontiers (char offsets at codepoint boundaries)
    val frontiers = new ArrayBuffer[Int]()
    var i = 0
    frontiers += 0
    while (i < text.length) {
      i += Character.charCount(text.codePointAt(i))
      frontiers += i
    }
    val out = new ArrayBuffer[Token]()
    var a = 0
    val lastStart = frontiers.length - 1 - minGram
    while (a <= lastStart && (!prefixOnly || a == 0)) {
      var g = minGram
      while (g <= maxGram && a + g < frontiers.length) {
        out += Token(text.substring(frontiers(a), frontiers(a + g)), 0,
          frontiers(a), frontiers(a + g))
        g += 1
      }
      a += 1
    }
    out
  }

  /** RegexTokenizer (`src/tokenizer/regex_tokenizer.rs`): one token per
    * regex match, ordinal positions.
    */
  def regexTokens(text: String, pattern: String): ArrayBuffer[Token] = {
    val m = java.util.regex.Pattern.compile(pattern).matcher(text)
    val out = new ArrayBuffer[Token]()
    var pos = -1
    while (m.find()) {
      pos += 1
      out += Token(m.group(), pos, m.start(), m.end())
    }
    out
  }

  /** FacetTokenizer (`src/tokenizer/facet_tokenizer.rs:4-11`): a path facet
    * `/a/b/c` emits itself and every ancestor, root-first:
    * `/a`, `/a/b`, `/a/b/c`. Positions are all 0.
    */
  /** AsciiFoldingFilter (`src/tokenizer/ascii_folding_filter.rs` — the
    * Lucene-derived mapping): Latin-script diacritics fold to their ASCII
    * base. Implemented as NFD decomposition + combining-mark strip (covers
    * every decomposable row of the reference's generated table) plus the
    * non-decomposable special cases (ligatures, stroked/crossed letters).
    * Unmapped non-Latin characters pass through unchanged, as in the
    * reference's fallback arm.
    */
  private val FoldSpecial: Map[Char, String] = Map(
    'æ' -> "ae", 'Æ' -> "AE", 'œ' -> "oe", 'Œ' -> "OE",
    'ø' -> "o", 'Ø' -> "O", 'ß' -> "ss", 'ẞ' -> "SS",
    'đ' -> "d", 'Đ' -> "D", 'ð' -> "d", 'Ð' -> "D",
    'þ' -> "th", 'Þ' -> "TH", 'ł' -> "l", 'Ł' -> "L",
    'ħ' -> "h", 'Ħ' -> "H", 'ı' -> "i", 'İ' -> "I",
    'ŋ' -> "n", 'Ŋ' -> "N", 'ŧ' -> "t", 'Ŧ' -> "T",
    'ƒ' -> "f", 'Ǝ' -> "E", 'ə' -> "e")

  def asciiFold(s: String): String = {
    var i = 0
    var ascii = true
    while (ascii && i < s.length) { if (s.charAt(i) >= 128) ascii = false; i += 1 }
    if (ascii) return s
    val nfd = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    i = 0
    while (i < nfd.length) {
      val c = nfd.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) {
        FoldSpecial.get(c) match {
          case Some(rep) => sb.append(rep)
          case None => sb.append(c)
        }
      }
      i += 1
    }
    sb.toString
  }

  /** AsciiFolding as a token filter (text rewritten, positions kept). */
  def asciiFoldTokens(toks: ArrayBuffer[Token]): ArrayBuffer[Token] =
    toks.map(t => t.copy(text = asciiFold(t.text)))

  /** SplitCompoundWords (`src/tokenizer/split_compound_words.rs`): a token
    * that can be FULLY decomposed into consecutive dictionary words splits
    * into those parts (greedy leftmost-longest — the reference's
    * aho-corasick LeftmostLongest match kind walked left to right); parts
    * inherit the original token's position and offsets, exactly as the
    * reference's `Token { text: tail, ..*token }`. Any token that does not
    * tile completely passes through unchanged.
    */
  def splitCompoundWords(toks: ArrayBuffer[Token], dict: Set[String]): ArrayBuffer[Token] = {
    if (dict.isEmpty) return toks
    val maxLen = dict.iterator.map(_.length).max
    val out = new ArrayBuffer[Token](toks.length)
    toks.foreach { t =>
      val text = t.text
      val cuts = new ArrayBuffer[Int]()
      var pos = 0
      var ok = text.nonEmpty
      while (ok && pos < text.length) {
        var found = -1
        var l = math.min(maxLen, text.length - pos)
        while (found < 0 && l >= 1) {
          if (dict.contains(text.substring(pos, pos + l))) found = l
          l -= 1
        }
        if (found < 0) ok = false
        else { cuts += pos; pos += found }
      }
      if (ok && cuts.length > 0) {
        var i = 0
        while (i < cuts.length) {
          val end = if (i + 1 < cuts.length) cuts(i + 1) else text.length
          out += t.copy(text = text.substring(cuts(i), end))
          i += 1
        }
      } else out += t
    }
    out
  }

  def facetTokens(path: String): ArrayBuffer[Token] = {
    val out = new ArrayBuffer[Token]()
    if (path.isEmpty || path == "/") return out
    var idx = path.indexOf('/', 1)
    while (idx != -1) {
      out += Token(path.substring(0, idx), 0, 0, idx)
      idx = path.indexOf('/', idx + 1)
    }
    out += Token(path, 0, 0, path.length)
    out
  }

  /** AlphaNumOnlyFilter (`src/tokenizer/alphanum_only.rs`): drop tokens
    * containing any non-alphanumeric codepoint (position gaps remain).
    */
  def alphaNumOnly(toks: ArrayBuffer[Token]): ArrayBuffer[Token] =
    toks.filter { t =>
      var i = 0
      var ok = true
      while (ok && i < t.text.length) {
        val cp = t.text.codePointAt(i)
        ok = isAlphanumeric(cp)
        i += Character.charCount(cp)
      }
      ok
    }

  /** StopWordFilter (`src/tokenizer/stop_word_filter`): drop members of the
    * stop set; dropped tokens leave position gaps like every filter.
    */
  def removeStopWords(toks: ArrayBuffer[Token], stopWords: Set[String]): ArrayBuffer[Token] =
    toks.filterNot(t => stopWords.contains(t.text))

  /** Built-in per-language stop lists (`StopWordFilter::new(Language)`,
    * `src/tokenizer/stop_word_filter/mod.rs:36-62`): the public
    * Snowball-project data the reference vendors (BSD-3,
    * snowballstem.org; English is the Lucene 33-word list per
    * mod.rs:41-48), packaged as the `graft/stopwords.txt` resource
    * (regenerate with tools/gen_stopwords.py). Keyed by full language name.
    */
  lazy val builtinStopWords: Map[String, Set[String]] = {
    val in = getClass.getResourceAsStream("/graft/stopwords.txt")
    require(in != null, "missing resource graft/stopwords.txt")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().filter(l => l.nonEmpty && !l.startsWith("#")).map { l =>
      val i = l.indexOf(':')
      l.substring(0, i) -> l.substring(i + 1).split(' ').toSet
    }.toMap
    finally src.close()
  }

  /** Stop list for an ISO code or full language name; None when no list is
    * published (matches the reference's Option return).
    */
  def stopWordsFor(language: String): Option[Set[String]] =
    builtinStopWords.get(LangCodes.getOrElse(language, language))

  /** Stemmer token filter (`src/tokenizer/stemmer.rs`): rewrite each token to
    * its Snowball stem for the given language; positions/offsets kept.
    */
  def stemTokens(toks: ArrayBuffer[Token], language: String): ArrayBuffer[Token] = {
    val stem = snowball.SnowballStemmer(language)
    toks.map(t => t.copy(text = stem(t.text)))
  }

  /** ISO-639-1 codes for the `_stem` analyzer names (tantivy registers
    * `en_stem` by default and users register the rest; both the code and
    * the full language name are accepted here).
    */
  private val LangCodes = Map(
    "en" -> "english", "da" -> "danish", "no" -> "norwegian", "sv" -> "swedish",
    "de" -> "german", "nl" -> "dutch", "es" -> "spanish", "pt" -> "portuguese",
    "it" -> "italian", "fr" -> "french", "ru" -> "russian", "ro" -> "romanian",
    "hu" -> "hungarian", "fi" -> "finnish", "el" -> "greek", "ar" -> "arabic",
    "ta" -> "tamil", "tr" -> "turkish")

  /** TokenizerManager analog (`/root/reference/src/tokenizer/
    * tokenizer_manager.rs:56-81`): resolve a REGISTERED analyzer name to its
    * full chain. Built-ins mirror the reference's defaults: `default`
    * (simple + remove_long(40) + lowercase), `raw` (whole value, unaltered),
    * `whitespace`, and `<lang>_stem` = default + Snowball stemmer (`en_stem`,
    * `de_stem`, ... or full names `german_stem`, ...). The name is recorded
    * in the index manifest so build and query-parse always agree — the
    * reference stores it in the schema's text options the same way.
    * Resolution is cheap and serialization-free: executors resolve from the
    * broadcast config string, nothing closes over the stemmer tables.
    */
  def chain(name: String): String => ArrayBuffer[Token] = name match {
    case "default" => tokenize(_: String)
    case "raw" => (t: String) => {
      val b = new ArrayBuffer[Token](1)
      if (t.nonEmpty) b += Token(t, 0, 0, t.length)
      b
    }
    case "whitespace" => whitespaceTokens(_: String)
    case s if s.endsWith("_stem") =>
      val code = s.stripSuffix("_stem")
      val stem = snowball.SnowballStemmer(LangCodes.getOrElse(code, code))
      (t: String) => {
        val toks = tokenize(t)
        var i = 0
        while (i < toks.length) { toks(i) = toks(i).copy(text = stem(toks(i).text)); i += 1 }
        toks
      }
    case s if s.endsWith("_stop") =>
      val code = s.stripSuffix("_stop")
      val stop = stopWordsFor(code).getOrElse(throw new IllegalArgumentException(
        s"no built-in stop list for '$code'"))
      (t: String) => removeStopWords(tokenize(t), stop)
    case other => throw new IllegalArgumentException(
      s"unknown analyzer '$other' (registered: default, raw, whitespace, <lang>_stem, <lang>_stop)")
  }

  /** Term list through a named chain (query-parser side). */
  def chainTerms(name: String): String => Seq[String] = {
    val c = chain(name)
    t => c(t).map(_.text).toSeq
  }

  /** The classic Lucene/tantivy English stop list (35 terms). */
  val EnglishStopWords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such", "that",
    "the", "their", "then", "there", "these", "they", "this", "to", "was",
    "will", "with")
}
