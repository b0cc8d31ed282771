package graft.analysis.snowball

import Snow._

/** Snowball German stemmer (published algorithm, Snowball 2.x). */
object GermanStemmer {
  private val Vowels = "aeiouyäöü"
  private val SEnding = "bdfghklmnrt"
  private val StEnding = "bdfghklmnt"

  def stem(word: String): String = {
    // prelude: ß -> ss; u/y between vowels -> U/Y (consonant marks)
    var sb = new StringBuilder(word.replace("ß", "ss"))
    var i = 1
    while (i < sb.length - 1) {
      val c = sb.charAt(i)
      if ((c == 'u' || c == 'y') && isVowel(sb.charAt(i - 1), Vowels) &&
          isVowel(sb.charAt(i + 1), Vowels))
        sb.setCharAt(i, (c - 32).toChar)
      i += 1
    }
    var w = sb.toString
    val p1 = r1AtLeast3(w, Vowels)
    val p2 = r2Standard(w, Vowels)

    // step 1
    val s1 = longestSuffixIn(w, Step1, p1)
    if (s1 >= 0) {
      Step1(s1) match {
        case "s" =>
          if (w.length >= 2 && SEnding.indexOf(w.charAt(w.length - 2)) >= 0)
            w = w.substring(0, w.length - 1)
        case s @ ("e" | "en" | "es") =>
          w = w.substring(0, w.length - s.length)
          if (w.endsWith("niss")) w = w.substring(0, w.length - 1)
        case s =>
          w = w.substring(0, w.length - s.length)
      }
    }
    // step 2
    val s2 = longestSuffixIn(w, Step2, p1)
    if (s2 >= 0) {
      Step2(s2) match {
        case "st" =>
          // `st_ending hop 3`: the grouping test consumes the consonant, so
          // the hop needs 3 more chars before it — total length >= 6
          if (w.length >= 2 + 1 + 3 && StEnding.indexOf(w.charAt(w.length - 3)) >= 0)
            w = w.substring(0, w.length - 2)
        case s =>
          w = w.substring(0, w.length - s.length)
      }
    }
    // step 3 (d-suffixes) against R2 (regions are positions in the prelude
    // form; deletions so far only shorten the tail, so p2 stays valid)
    val s3 = longestSuffixIn(w, Step3, p2)
    if (s3 >= 0) {
      Step3(s3) match {
        case s @ ("end" | "ung") =>
          w = w.substring(0, w.length - s.length)
          if (w.endsWith("ig") && !w.endsWith("eig") && w.length - 2 >= p2)
            w = w.substring(0, w.length - 2)
        case s @ ("ig" | "ik" | "isch") =>
          if (!(w.length > s.length && w.charAt(w.length - s.length - 1) == 'e'))
            w = w.substring(0, w.length - s.length)
        case s @ ("lich" | "heit") =>
          w = w.substring(0, w.length - s.length)
          val t = longestSuffixIn(w, ErEn, p1)
          if (t >= 0) w = w.substring(0, w.length - ErEn(t).length)
        case "keit" =>
          w = w.substring(0, w.length - 4)
          val t = longestSuffixIn(w, LichIg, p2)
          if (t >= 0) w = w.substring(0, w.length - LichIg(t).length)
        case _ => ()
      }
    }
    // postlude: unmark U/Y, strip umlauts
    val out = new StringBuilder(w.length)
    i = 0
    while (i < w.length) {
      out.append(w.charAt(i) match {
        case 'U' => 'u'
        case 'Y' => 'y'
        case 'ä' => 'a'
        case 'ö' => 'o'
        case 'ü' => 'u'
        case c => c
      })
      i += 1
    }
    out.toString
  }

  private val Step1 = Array("em", "ern", "er", "e", "en", "es", "s")
  private val Step2 = Array("en", "er", "est", "st")
  private val Step3 = Array("end", "ung", "ig", "ik", "isch", "lich", "heit", "keit")
  private val ErEn = Array("er", "en")
  private val LichIg = Array("lich", "ig")
}

/** Snowball Dutch stemmer (published algorithm, Snowball 2.x). */
object DutchStemmer {
  private val Vowels = "aeiouyè"

  def stem(word: String): String = {
    // prelude: fold umlaut/acute accents; mark initial y, y-after-vowel and
    // i-between-vowels as consonants (upper case)
    val sb = new StringBuilder(word.length)
    var i = 0
    while (i < word.length) {
      sb.append(word.charAt(i) match {
        case 'ä' | 'á' => 'a'
        case 'ë' | 'é' => 'e'
        case 'ï' | 'í' => 'i'
        case 'ö' | 'ó' => 'o'
        case 'ü' | 'ú' => 'u'
        case c => c
      })
      i += 1
    }
    if (sb.nonEmpty && sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
    i = 1
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (c == 'y' && isVowel(sb.charAt(i - 1), Vowels)) sb.setCharAt(i, 'Y')
      else if (c == 'i' && isVowel(sb.charAt(i - 1), Vowels) &&
               i + 1 < sb.length && isVowel(sb.charAt(i + 1), Vowels))
        sb.setCharAt(i, 'I')
      i += 1
    }
    var w = sb.toString
    // Regions in BYTE offsets (snowball UTF-8 cursor space): dutch.sbl clamps
    // R1 with a literal `try($p1 < 3  $p1 = 3)` — 3 bytes, so a leading
    // 2-byte letter (è) shifts the clamp relative to code-point counting.
    val bOff = byteOffsets(w)
    val p1B = { val p = bOff(r1Standard(w, Vowels)); if (p < 3) 3 else p }
    val p2B = bOff(r2Standard(w, Vowels))
    @inline def inR1(charPos: Int) = bOff(charPos) >= p1B
    @inline def inR2(charPos: Int) = bOff(charPos) >= p2B
    var eFound = false

    // step 1: unrestricted longest match; R1 is checked per arm, a failed
    // arm does NOT fall back to a shorter suffix
    val s1 = longestSuffix(w, Step1)
    if (s1 >= 0) {
      Step1(s1) match {
        case "heden" =>
          if (inR1(w.length - 5)) w = w.substring(0, w.length - 5) + "heid"
        case s @ ("en" | "ene") =>
          if (enOk(w, s.length, inR1(w.length - s.length))) {
            w = w.substring(0, w.length - s.length); w = undouble(w)
          }
        case s @ ("s" | "se") =>
          val prev = w.length - s.length - 1
          if (inR1(w.length - s.length) && prev >= 0 &&
              !isVowel(w.charAt(prev), Vowels) && w.charAt(prev) != 'j')
            w = w.substring(0, w.length - s.length)
        case _ => ()
      }
    }
    // step 2
    if (w.endsWith("e") && inR1(w.length - 1) && w.length >= 2 &&
        !isVowel(w.charAt(w.length - 2), Vowels)) {
      w = undouble(w.substring(0, w.length - 1))
      eFound = true
    }
    // step 3a
    if (w.endsWith("heid") && inR2(w.length - 4) && w.charAt(w.length - 5) != 'c') {
      w = w.substring(0, w.length - 4)
      if (w.endsWith("en") && enOk(w, 2, inR1(w.length - 2))) {
        w = w.substring(0, w.length - 2); w = undouble(w)
      }
    }
    // step 3b (d-suffixes)
    val s3 = longestSuffix(w, Step3b)
    if (s3 >= 0) {
      Step3b(s3) match {
        case s @ ("end" | "ing") if inR2(w.length - s.length) =>
          w = w.substring(0, w.length - s.length)
          if (w.endsWith("ig") && inR2(w.length - 2) && !w.endsWith("eig"))
            w = w.substring(0, w.length - 2)
          else w = undouble(w)
        case "ig" if inR2(w.length - 2) && !w.endsWith("eig") =>
          w = w.substring(0, w.length - 2)
        case "lijk" if inR2(w.length - 4) =>
          w = w.substring(0, w.length - 4)
          if (w.endsWith("e") && inR1(w.length - 1) && w.length >= 2 &&
              !isVowel(w.charAt(w.length - 2), Vowels))
            w = undouble(w.substring(0, w.length - 1))
        case "baar" if inR2(w.length - 4) =>
          w = w.substring(0, w.length - 4)
        case "bar" if inR2(w.length - 3) && eFound =>
          w = w.substring(0, w.length - 3)
        case _ => ()
      }
    }
    // step 4: undouble vowel — C v v C (final C not I) with v in {a,e,o,u}
    if (w.length >= 4) {
      val d = w.charAt(w.length - 1)
      val v1 = w.charAt(w.length - 2)
      val v2 = w.charAt(w.length - 3)
      val c = w.charAt(w.length - 4)
      if (!isVowel(d, Vowels) && d != 'I' && v1 == v2 && "aeou".indexOf(v1) >= 0 &&
          !isVowel(c, Vowels))
        w = w.substring(0, w.length - 2) + d
    }
    // postlude
    w.map {
      case 'Y' => 'y'
      case 'I' => 'i'
      case c => c
    }
  }

  /** en-ending: suffix in R1, preceded by a non-vowel, and not 'gem' before. */
  private def enOk(w: String, sufLen: Int, suffixInR1: Boolean): Boolean = {
    val prev = w.length - sufLen - 1
    suffixInR1 && prev >= 0 && !isVowel(w.charAt(prev), Vowels) &&
      !w.regionMatches(w.length - sufLen - 3, "gem", 0, 3)
  }

  private def undouble(w: String): String =
    if (w.endsWith("kk") || w.endsWith("dd") || w.endsWith("tt"))
      w.substring(0, w.length - 1)
    else w

  private val Step1 = Array("heden", "en", "ene", "s", "se")
  private val Step3b = Array("end", "ing", "ig", "lijk", "baar", "bar")
}
