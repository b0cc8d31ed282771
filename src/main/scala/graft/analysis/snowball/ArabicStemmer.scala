package graft.analysis.snowball

/** Snowball Arabic stemmer (published algorithm, snowballstem.org — Assem
  * Chelli's Arabic stemmer; the reference exposes it via `Language::Arabic`,
  * `/root/reference/src/tokenizer/stemmer.rs:12-30`).
  *
  * Faithful port of the published control flow:
  *  - `Checks1` on the raw word sets noun/verb/defined flags from the
  *    definite-article prefixes.
  *  - `Normalize_pre` strips diacritics/tatweel, maps Arabic-Indic digits
  *    and presentation forms to base letters (hamza carriers kept as-is).
  *  - Suffix phase: verb branch (pronoun step repeated at-least-once, then
  *    tense markers) or-else noun branch (a try-block of pronoun/feminine/
  *    plural steps whose partial modifications persist, then ya' nisbiya)
  *    or-else alef-maqsura fold. Snowball `among` semantics: longest match
  *    only — if its length gate fails the whole among fails (no retry with
  *    a shorter suffix).
  *  - Prefix phase with a *chained cursor*: each step matches where the
  *    previous one left off (Snowball forward-mode `try C1 try C2 ...`).
  *  - `Normalize_post` folds a final hamza carrier to bare hamza, then all
  *    remaining carriers to their base letter.
  */
object ArabicStemmer {

  private val Diacritics = "ًٌٍَُِّْـ" // tanween, short vowels, shadda, sukun, tatweel

  // presentation forms → base letters (U+FE80..U+FEFC), incl. lam ligatures
  private val Presentation: Map[Char, String] = {
    val base = Seq(
      0xFE80 -> "ء", 0xFE81 -> "آ", 0xFE82 -> "آ", 0xFE83 -> "أ", 0xFE84 -> "أ",
      0xFE85 -> "ؤ", 0xFE86 -> "ؤ", 0xFE87 -> "إ", 0xFE88 -> "إ", 0xFE89 -> "ئ",
      0xFE8A -> "ئ", 0xFE8B -> "ئ", 0xFE8C -> "ئ", 0xFE8D -> "ا", 0xFE8E -> "ا",
      0xFE8F -> "ب", 0xFE90 -> "ب", 0xFE91 -> "ب", 0xFE92 -> "ب",
      0xFE93 -> "ة", 0xFE94 -> "ة",
      0xFE95 -> "ت", 0xFE96 -> "ت", 0xFE97 -> "ت", 0xFE98 -> "ت",
      0xFE99 -> "ث", 0xFE9A -> "ث", 0xFE9B -> "ث", 0xFE9C -> "ث",
      0xFE9D -> "ج", 0xFE9E -> "ج", 0xFE9F -> "ج", 0xFEA0 -> "ج",
      0xFEA1 -> "ح", 0xFEA2 -> "ح", 0xFEA3 -> "ح", 0xFEA4 -> "ح",
      0xFEA5 -> "خ", 0xFEA6 -> "خ", 0xFEA7 -> "خ", 0xFEA8 -> "خ",
      0xFEA9 -> "د", 0xFEAA -> "د", 0xFEAB -> "ذ", 0xFEAC -> "ذ",
      0xFEAD -> "ر", 0xFEAE -> "ر", 0xFEAF -> "ز", 0xFEB0 -> "ز",
      0xFEB1 -> "س", 0xFEB2 -> "س", 0xFEB3 -> "س", 0xFEB4 -> "س",
      0xFEB5 -> "ش", 0xFEB6 -> "ش", 0xFEB7 -> "ش", 0xFEB8 -> "ش",
      0xFEB9 -> "ص", 0xFEBA -> "ص", 0xFEBB -> "ص", 0xFEBC -> "ص",
      0xFEBD -> "ض", 0xFEBE -> "ض", 0xFEBF -> "ض", 0xFEC0 -> "ض",
      0xFEC1 -> "ط", 0xFEC2 -> "ط", 0xFEC3 -> "ط", 0xFEC4 -> "ط",
      0xFEC5 -> "ظ", 0xFEC6 -> "ظ", 0xFEC7 -> "ظ", 0xFEC8 -> "ظ",
      0xFEC9 -> "ع", 0xFECA -> "ع", 0xFECB -> "ع", 0xFECC -> "ع",
      0xFECD -> "غ", 0xFECE -> "غ", 0xFECF -> "غ", 0xFED0 -> "غ",
      0xFED1 -> "ف", 0xFED2 -> "ف", 0xFED3 -> "ف", 0xFED4 -> "ف",
      0xFED5 -> "ق", 0xFED6 -> "ق", 0xFED7 -> "ق", 0xFED8 -> "ق",
      0xFED9 -> "ك", 0xFEDA -> "ك", 0xFEDB -> "ك", 0xFEDC -> "ك",
      0xFEDD -> "ل", 0xFEDE -> "ل", 0xFEDF -> "ل", 0xFEE0 -> "ل",
      0xFEE1 -> "م", 0xFEE2 -> "م", 0xFEE3 -> "م", 0xFEE4 -> "م",
      0xFEE5 -> "ن", 0xFEE6 -> "ن", 0xFEE7 -> "ن", 0xFEE8 -> "ن",
      0xFEE9 -> "ه", 0xFEEA -> "ه", 0xFEEB -> "ه", 0xFEEC -> "ه",
      0xFEED -> "و", 0xFEEE -> "و",
      0xFEEF -> "ى", 0xFEF0 -> "ى",
      0xFEF1 -> "ي", 0xFEF2 -> "ي", 0xFEF3 -> "ي", 0xFEF4 -> "ي",
      0xFEF5 -> "لآ", 0xFEF6 -> "لآ", 0xFEF7 -> "لأ", 0xFEF8 -> "لأ",
      0xFEF9 -> "لإ", 0xFEFA -> "لإ", 0xFEFB -> "لا", 0xFEFC -> "لا")
    base.map { case (cp, s) => (cp.toChar, s) }.toMap
  }

  def stem(word: String): String = {
    var w = word
    var isNoun = true
    var isVerb = true
    var isDefined = false

    // ---- Checks1 (raw word, longest among match at position 0)
    if (w.startsWith("بال") || w.startsWith("كال")) {
      if (w.length > 4) { isVerb = false; isDefined = true }
    } else if (w.startsWith("ال") || w.startsWith("لل")) {
      if (w.length > 3) { isVerb = false; isDefined = true }
    }

    // ---- Normalize_pre
    {
      val sb = new java.lang.StringBuilder(w.length)
      var i = 0
      while (i < w.length) {
        val c = w.charAt(i)
        if (Diacritics.indexOf(c) >= 0) ()
        else if (c >= '٠' && c <= '٩') sb.append(('0' + (c - '٠')).toChar)
        else Presentation.get(c) match {
          case Some(s) => sb.append(s)
          case None    => sb.append(c)
        }
        i += 1
      }
      w = sb.toString
    }

    @inline def del(n: Int): Unit = w = w.substring(0, w.length - n)
    @inline def e(s: String): Boolean = w.endsWith(s)

    // ---- backward (suffix) routines; longest-match-only among semantics

    def verbStep1(): Boolean = {
      val L = w.length
      if (e("كمو") || e("كما") || e("هما")) { if (L >= 6) { del(3); true } else false }
      else if (e("كم") || e("هم") || e("كن") || e("هن") || e("ني") || e("نا") || e("ها")) {
        if (L >= 5) { del(2); true } else false
      }
      else if (e("ك") || e("ه")) { if (L >= 4) { del(1); true } else false }
      else false
    }

    def verbStep2a(): Boolean = {
      val L = w.length
      if (e("تما")) { if (L >= 6) { del(3); true } else false }
      else if (e("تن") || e("نا") || e("تا")) { if (L >= 5) { del(2); true } else false }
      else if (e("ان") || e("ون") || e("ين")) { if (L > 5) { del(2); true } else false }
      else if (e("ت") || e("ا") || e("ي") || e("ن")) { if (L >= 4) { del(1); true } else false }
      else false
    }

    def verbStep2b(): Boolean =
      if (e("تم") || e("وا")) { if (w.length >= 5) { del(2); true } else false } else false

    def verbStep2c(): Boolean = {
      if (e("تمو")) { if (w.length >= 6) { del(3); true } else false }
      else if (e("و")) { if (w.length >= 4) { del(1); true } else false }
      else false
    }

    def nounStep1a(): Boolean = {
      val L = w.length
      if (e("كما") || e("هما")) { if (L >= 6) { del(3); true } else false }
      else if (e("كم") || e("هم") || e("هن") || e("نا") || e("ها")) {
        if (L >= 5) { del(2); true } else false
      }
      else if (e("ي") || e("ك") || e("ه")) { if (L >= 4) { del(1); true } else false }
      else false
    }

    def nounStep1b(): Boolean =
      if (e("ن") && w.length > 5) { del(1); true } else false

    def nounStep2a(): Boolean =
      if ((e("ا") || e("ي") || e("و")) && w.length > 4) { del(1); true } else false

    def nounStep2b(): Boolean =
      if (e("ات") && w.length >= 5) { del(2); true } else false

    def nounStep2c1(): Boolean =
      if (e("ت") && w.length >= 4) { del(1); true } else false

    def nounStep2c2(): Boolean =
      if (e("ة") && w.length > 3) { del(1); true } else false

    def nounStep3(): Boolean =
      if (e("ي") && w.length >= 3) { del(1); true } else false

    def alefMaqsura(): Boolean =
      if (e("ى")) { w = w.substring(0, w.length - 1) + "ي"; true } else false

    // ---- suffix phase: (verb) or (noun) or alef-maqsura
    val verbOk = isVerb && {
      var n = 0
      while (verbStep1()) n += 1
      if (n >= 1) { val _ = verbStep2a() || verbStep2c(); true }
      else verbStep2b() || verbStep2a()
    }
    if (!verbOk) {
      val nounOk = isNoun && {
        // try-block: partial modifications persist even when an alternative
        // fails midway (Snowball backtracking restores the cursor, not the
        // string).
        val _ =
          nounStep2c2() ||
          (!isDefined && nounStep1a() && { val _ = nounStep2a() || nounStep2b() || nounStep2c1(); true }) ||
          (nounStep1b() && (nounStep2a() || nounStep2b() || nounStep2c1())) ||
          (!isDefined && nounStep2a()) ||
          nounStep2b()
        nounStep3()
      }
      if (!nounOk) { val _ = alefMaqsura() }
    }

    // ---- prefix phase (forward mode, chained cursor)
    var cur = 0
    @inline def at(s: String): Boolean = w.startsWith(s, cur)
    @inline def cut(n: Int): Unit = w = w.substring(0, cur) + w.substring(cur + n)
    @inline def put(n: Int, r: String): Unit = {
      w = w.substring(0, cur) + r + w.substring(cur + n); cur += r.length
    }

    // Prefix_Step1 (try)
    if (w.length > 3 && w.length >= 2 && w.charAt(0) == 'أ') {
      w.charAt(1) match {
        case 'أ' => put(2, "أ")
        case 'آ' => put(2, "آ")
        case 'ؤ' => put(2, "أ")
        case 'إ' => put(2, "إ")
        case 'ا' => put(2, "ا")
        case _   => ()
      }
    }
    // Prefix_Step2 (try): conjunction fa/wa, unless followed by alef
    if (w.length > 3 && cur < w.length) {
      val c = w.charAt(cur)
      if ((c == 'ف' || c == 'و') && !at("فا") && !at("وا")) cut(1)
    }
    // Prefix_Step3a_Noun or (is_noun Prefix_Step3b_Noun)
    //   or (is_verb try Prefix_Step3_Verb; Prefix_Step4_Verb)
    val step3a = {
      if (at("بال") || at("كال")) { if (w.length > 5) { cut(3); true } else false }
      else if (at("ال") || at("لل")) { if (w.length > 4) { cut(2); true } else false }
      else false
    }
    if (!step3a) {
      var done = false
      if (isNoun) {
        // Step3b among: 'با' is an explicit in-table failure (blocks bare 'ب')
        if (at("با")) ()
        else if (at("بب")) { if (w.length > 3) { put(2, "ب"); done = true } }
        else if (at("كك")) { if (w.length > 3) { put(2, "ك"); done = true } }
        else if (at("ب")) { if (w.length > 3) { cut(1); done = true } }
      }
      if (!done && isVerb) {
        if (w.length > 4) {
          if (at("سي")) put(2, "ي")
          else if (at("ست")) put(2, "ت")
          else if (at("سن")) put(2, "ن")
          else if (at("سأ")) put(2, "أ")
        }
        if (w.length > 4 && (at("يست") || at("نست") || at("تست"))) put(3, "است")
      }
    }

    // ---- Normalize_post: final hamza carrier → bare hamza, then the rest
    if (w.nonEmpty) {
      w.charAt(w.length - 1) match {
        case 'آ' | 'أ' | 'إ' | 'ؤ' | 'ئ' => w = w.substring(0, w.length - 1) + "ء"
        case _ => ()
      }
    }
    val sb = new java.lang.StringBuilder(w.length)
    var i = 0
    while (i < w.length) {
      w.charAt(i) match {
        case 'آ' | 'أ' | 'إ' => sb.append('ا')
        case 'ؤ'             => sb.append('و')
        case 'ئ'             => sb.append('ي')
        case c               => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
