package graft.analysis

/** Porter stemmer (M.F. Porter, "An algorithm for suffix stripping", 1980 —
  * public algorithm). The reference ships Snowball stemmers as an opt-in
  * token filter (`/root/reference/src/tokenizer/stemmer.rs`); offline, with
  * no Snowball dependency available, this provides the same opt-in surface
  * with the classic Porter (step 1-5) English algorithm.
  *
  * Only lowercase a-z tokens are stemmed; anything containing other
  * characters (digits, non-ASCII) passes through unchanged, matching the
  * stemmer-after-lowercaser chain position.
  */
object PorterStemmer extends Serializable {

  @inline private def isCons(s: String, i: Int): Boolean = s.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isCons(s, i - 1)
    case _ => true
  }

  /** m in [C](VC)^m[V] — the "measure" of a stem. */
  private def measure(s: String): Int = {
    var m = 0
    var i = 0
    val n = s.length
    while (i < n && isCons(s, i)) i += 1
    while (i < n) {
      while (i < n && !isCons(s, i)) i += 1
      if (i < n) {
        m += 1
        while (i < n && isCons(s, i)) i += 1
      }
    }
    m
  }

  private def hasVowel(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (!isCons(s, i)) return true
      i += 1
    }
    false
  }

  private def endsDoubleC(s: String): Boolean =
    s.length >= 2 && s.charAt(s.length - 1) == s.charAt(s.length - 2) && isCons(s, s.length - 1)

  /** *o: cvc where the final c is not w, x or y. */
  private def endsCVC(s: String): Boolean = {
    if (s.length < 3) return false
    val last = s.charAt(s.length - 1)
    isCons(s, s.length - 3) && !isCons(s, s.length - 2) && isCons(s, s.length - 1) &&
      last != 'w' && last != 'x' && last != 'y'
  }

  /** One step: longest matching suffix wins; if its condition fails the
    * step still ends (Porter's switch semantics).
    */
  private def step(b: String, rules: Seq[(String, String)], cond: String => Boolean): String = {
    val hit = rules.sortBy(-_._1.length).find { case (suf, _) => b.endsWith(suf) }
    hit match {
      case Some((suf, repl)) =>
        val stem = b.substring(0, b.length - suf.length)
        if (cond(stem)) stem + repl else b
      case None => b
    }
  }

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var i = 0
    while (i < word.length) {
      val c = word.charAt(i)
      if (c < 'a' || c > 'z') return word
      i += 1
    }
    var b = word

    // step 1a
    if (b.endsWith("sses")) b = b.dropRight(2)
    else if (b.endsWith("ies")) b = b.dropRight(2)
    else if (b.endsWith("ss")) ()
    else if (b.endsWith("s")) b = b.dropRight(1)

    // step 1b
    var did1b = false
    if (b.endsWith("eed")) {
      if (measure(b.dropRight(3)) > 0) b = b.dropRight(1)
    } else if (b.endsWith("ed") && hasVowel(b.dropRight(2))) {
      b = b.dropRight(2)
      did1b = true
    } else if (b.endsWith("ing") && hasVowel(b.dropRight(3))) {
      b = b.dropRight(3)
      did1b = true
    }
    if (did1b) {
      if (b.endsWith("at") || b.endsWith("bl") || b.endsWith("iz")) b = b + "e"
      else if (endsDoubleC(b) && !"lsz".contains(b.last)) b = b.dropRight(1)
      else if (measure(b) == 1 && endsCVC(b)) b = b + "e"
    }

    // step 1c
    if (b.endsWith("y") && hasVowel(b.dropRight(1))) b = b.dropRight(1) + "i"

    // step 2 (m > 0)
    b = step(b, Seq(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
      "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
      "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
      "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
      "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble"),
      stem => measure(stem) > 0)

    // step 3 (m > 0)
    b = step(b, Seq(
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> ""),
      stem => measure(stem) > 0)

    // step 4 (m > 1; "ion" additionally requires the stem to end s or t)
    val b4 = b
    b = step(b, Seq(
      "al" -> "", "ance" -> "", "ence" -> "", "er" -> "", "ic" -> "",
      "able" -> "", "ible" -> "", "ant" -> "", "ement" -> "", "ment" -> "",
      "ent" -> "", "ou" -> "", "ism" -> "", "ate" -> "", "iti" -> "",
      "ous" -> "", "ive" -> "", "ize" -> ""),
      stem => measure(stem) > 1)
    if (b == b4 && b.endsWith("ion")) {
      val stem = b.dropRight(3)
      if (measure(stem) > 1 && stem.nonEmpty && (stem.last == 's' || stem.last == 't'))
        b = stem
    }

    // step 5a
    if (b.endsWith("e")) {
      val stem = b.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCVC(stem))) b = stem
    }
    // step 5b
    if (endsDoubleC(b) && b.last == 'l' && measure(b) > 1) b = b.dropRight(1)

    b
  }

  /** Stemming token filter over the default analyzer chain. */
  def stemTokens(toks: scala.collection.mutable.ArrayBuffer[Token])
      : scala.collection.mutable.ArrayBuffer[Token] = {
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val s = stem(t.text)
      if (s ne t.text) toks(i) = t.copy(text = s)
      i += 1
    }
    toks
  }
}
