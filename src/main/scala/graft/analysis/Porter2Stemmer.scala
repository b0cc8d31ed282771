package graft.analysis

/** Porter2 ("english") stemmer, implemented from the public Snowball
  * algorithm description (snowballstem.org/algorithms/english/stemmer.html;
  * M.F. Porter). This is the `Language::English` stemmer the reference
  * exposes as the `en_stem` token filter
  * (`/root/reference/src/tokenizer/stemmer.rs` via rust-stemmers).
  *
  * Input is assumed lowercased (stemmer sits after the LowerCaser). Tokens
  * containing characters outside a-z (digits, apostrophes aside, non-ASCII)
  * pass through unchanged except for the documented apostrophe handling.
  */
object Porter2Stemmer extends Serializable {

  private val Exceptions1: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    // invariants
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  private val Exceptions2: Set[String] = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  @inline private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'
  // after y-marking, 'Y' is a consonant
  @inline private def isVowelM(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'

  private val Doubles = Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
  private val LiEnding = Set('c', 'd', 'e', 'g', 'h', 'k', 'm', 'n', 'r', 't')

  /** R1 start index; special prefixes per the algorithm. */
  private def r1Of(w: String): Int = {
    for (p <- Seq("gener", "commun", "arsen")) if (w.startsWith(p)) return p.length
    firstNonVowelAfterVowel(w, 0)
  }

  private def firstNonVowelAfterVowel(w: String, from: Int): Int = {
    var i = from
    while (i < w.length && !isVowelM(w.charAt(i))) i += 1
    while (i < w.length && isVowelM(w.charAt(i))) i += 1
    // i is at the first non-vowel after a vowel (or end); region starts after it
    if (i < w.length) i + 1 else w.length
  }

  /** Short syllable ending at position `end` (exclusive). */
  private def endsWithShortSyllable(w: String): Boolean = {
    val n = w.length
    if (n == 2) return isVowelM(w.charAt(0)) && !isVowelM(w.charAt(1))
    if (n < 3) return false
    val c = w.charAt(n - 1)
    val v = w.charAt(n - 2)
    val b = w.charAt(n - 3)
    !isVowelM(c) && c != 'w' && c != 'x' && c != 'Y' && isVowelM(v) && !isVowelM(b)
  }

  private def isShortWord(w: String, r1: Int): Boolean =
    r1 >= w.length && endsWithShortSyllable(w)

  private def containsVowel(w: String, until: Int): Boolean = {
    var i = 0
    while (i < until) {
      if (isVowelM(w.charAt(i))) return true
      i += 1
    }
    false
  }

  def stem(word0: String): String = {
    if (word0.length <= 2) return word0
    var w = word0
    // step 0-ish: strip a leading apostrophe, then 's / 's' / ' suffixes
    if (w.startsWith("'")) w = w.substring(1)
    if (w.endsWith("'s'")) w = w.dropRight(3)
    else if (w.endsWith("'s")) w = w.dropRight(2)
    else if (w.endsWith("'")) w = w.dropRight(1)
    if (w.length <= 2) return w
    if (!w.forall(c => (c >= 'a' && c <= 'z'))) return w
    Exceptions1.get(w) match {
      case Some(r) => return r
      case None => ()
    }
    // mark consonant y: initial y, or y after a vowel
    val sb = new java.lang.StringBuilder(w)
    if (sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
    var i = 1
    while (i < sb.length) {
      if (sb.charAt(i) == 'y' && isVowelM(sb.charAt(i - 1))) sb.setCharAt(i, 'Y')
      i += 1
    }
    w = sb.toString

    var r1 = r1Of(w)
    var r2 = firstNonVowelAfterVowel(w, r1)
    @inline def inR1(suffixLen: Int): Boolean = w.length - suffixLen >= r1
    @inline def inR2(suffixLen: Int): Boolean = w.length - suffixLen >= r2

    // ---- step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies")) {
      w = if (w.length - 3 > 1) w.dropRight(2) else w.dropRight(1)
    } else if (w.endsWith("ss") || w.endsWith("us")) ()
    else if (w.endsWith("s")) {
      // delete if the preceding word part contains a vowel not immediately
      // before the s
      if (containsVowel(w, w.length - 2)) w = w.dropRight(1)
    }
    if (Exceptions2.contains(w)) return unmark(w)

    // ---- step 1b
    val s1b = Seq("eedly", "ingly", "edly", "eed", "ing", "ed")
    s1b.find(w.endsWith) match {
      case Some(sfx) if sfx == "eed" || sfx == "eedly" =>
        if (inR1(sfx.length)) w = w.dropRight(sfx.length) + "ee"
      case Some(sfx) =>
        val stem0 = w.dropRight(sfx.length)
        if (containsVowel(stem0, stem0.length)) {
          w = stem0
          if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w = w + "e"
          else if (w.length >= 2 && Doubles.contains(w.substring(w.length - 2))) w = w.dropRight(1)
          else {
            r1 = r1Of(w) // recompute for the shortened word
            if (isShortWord(w, r1)) w = w + "e"
          }
        }
      case None => ()
    }
    r1 = r1Of(w)
    r2 = firstNonVowelAfterVowel(w, r1)

    // ---- step 1c: y/Y -> i when preceded by a non-vowel that isn't first
    if (w.length > 2 && (w.endsWith("y") || w.endsWith("Y")) &&
        !isVowelM(w.charAt(w.length - 2)))
      w = w.dropRight(1) + "i"

    // ---- step 2 (longest suffix, in R1)
    val step2: Seq[(String, String)] = Seq(
      "ization" -> "ize", "ational" -> "ate", "fulness" -> "ful",
      "ousness" -> "ous", "iveness" -> "ive", "tional" -> "tion",
      "biliti" -> "ble", "lessli" -> "less", "entli" -> "ent",
      "ation" -> "ate", "alism" -> "al", "aliti" -> "al", "ousli" -> "ous",
      "iviti" -> "ive", "fulli" -> "ful", "enci" -> "ence", "anci" -> "ance",
      "abli" -> "able", "izer" -> "ize", "ator" -> "ate", "alli" -> "al",
      "bli" -> "ble", "ogi" -> "og", "li" -> "")
    step2.find { case (sfx, _) => w.endsWith(sfx) } match {
      case Some((sfx, rep)) if inR1(sfx.length) =>
        if (sfx == "ogi") {
          if (w.length > 3 && w.charAt(w.length - 4) == 'l') w = w.dropRight(3) + rep
        } else if (sfx == "li") {
          if (w.length > 2 && LiEnding.contains(w.charAt(w.length - 3))) w = w.dropRight(2)
        } else w = w.dropRight(sfx.length) + rep
      case _ => ()
    }
    r1 = r1Of(w)
    r2 = firstNonVowelAfterVowel(w, r1)

    // ---- step 3 (in R1; ative needs R2)
    val step3: Seq[(String, String)] = Seq(
      "ational" -> "ate", "tional" -> "tion", "alize" -> "al",
      "icate" -> "ic", "iciti" -> "ic", "ative" -> "", "ical" -> "ic",
      "ness" -> "", "ful" -> "")
    step3.find { case (sfx, _) => w.endsWith(sfx) } match {
      case Some((sfx, rep)) if inR1(sfx.length) =>
        if (sfx == "ative") { if (inR2(sfx.length)) w = w.dropRight(sfx.length) }
        else w = w.dropRight(sfx.length) + rep
      case _ => ()
    }
    r1 = r1Of(w)
    r2 = firstNonVowelAfterVowel(w, r1)

    // ---- step 4 (in R2)
    val step4 = Seq("ement", "ance", "ence", "able", "ible", "ment", "ant",
      "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic")
    step4.find(w.endsWith) match {
      case Some(sfx) if inR2(sfx.length) =>
        if (sfx == "ion") {
          val p = w.charAt(w.length - 4)
          if (p == 's' || p == 't') w = w.dropRight(3)
        } else w = w.dropRight(sfx.length)
      case _ => ()
    }
    r1 = r1Of(w)
    r2 = firstNonVowelAfterVowel(w, r1)

    // ---- step 5
    if (w.endsWith("e") &&
        (inR2(1) || (inR1(1) && !endsWithShortSyllable(w.dropRight(1)))))
      w = w.dropRight(1)
    else if (w.endsWith("l") && inR2(1) && w.length > 1 && w.charAt(w.length - 2) == 'l')
      w = w.dropRight(1)

    unmark(w)
  }

  @inline private def unmark(w: String): String =
    if (w.indexOf('Y') < 0) w else w.replace('Y', 'y')
}
