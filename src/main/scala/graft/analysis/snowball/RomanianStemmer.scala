package graft.analysis.snowball

import Snow._

/** Snowball Romanian stemmer (published algorithm, snowballstem.org — the
  * same family the reference exposes via `Language::Romanian`,
  * `/root/reference/src/tokenizer/stemmer.rs:12-30`). Matches the Snowball
  * generation PostgreSQL 15 bundles: suffix tables use the cedilla forms
  * ş/ţ (U+015F/U+0163) with no comma-below normalization.
  *
  * Steps: prelude (u/i between vowels → U/I); step_0 plural removal
  * (region-limited in R1); repeated combo replacements + standard suffix
  * (longest-match-then-R1/R2-test); verb suffixes (region-limited in RV,
  * group A requiring a preceding consonant-or-u inside RV); final vowel
  * removal in RV; postlude unmarks U/I.
  */
object RomanianStemmer {
  private val Vowels = "aăâeiîou"

  // step_0: plural/article removal, matched entirely inside R1.
  // Action codes: 0=delete, else replacement string.
  private val Step0 = Array(
    "ul", "ului", "aua", "ea", "ele", "elor", "ii", "iua", "iei", "iile",
    "iilor", "ilor", "ile", "atei", "aţie", "aţia")
  private val Step0Repl = Array(
    null, null, "a", "e", "e", "e", "i", "i", "i", "i",
    "i", "i", "i", "at", "aţi", "aţi")

  // combo_suffix: repeated replacements, longest-match then R1 test.
  private val Combo = Array(
    "abilitate", "abilitati", "abilităi", "abilităţi",
    "ibilitate",
    "ivitate", "ivitati", "ivităi", "ivităţi",
    "icitate", "icitati", "icităi", "icităţi", "icator", "icatori",
    "iciv", "iciva", "icivă", "icive", "icivi",
    "ical", "icala", "icală", "icale", "icali",
    "ativ", "ativa", "ativă", "ative", "ativi", "aţiune",
    "atoare", "ator", "atori", "ătoare", "ător", "ători",
    "itiv", "itiva", "itivă", "itive", "itivi", "iţiune",
    "itoare", "itor", "itori")
  private val ComboRepl = Array(
    "abil", "abil", "abil", "abil",
    "ibil",
    "iv", "iv", "iv", "iv",
    "ic", "ic", "ic", "ic", "ic", "ic",
    "ic", "ic", "ic", "ic", "ic",
    "ic", "ic", "ic", "ic", "ic",
    "at", "at", "at", "at", "at", "at",
    "at", "at", "at", "at", "at", "at",
    "it", "it", "it", "it", "it", "it",
    "it", "it", "it")

  // standard_suffix: longest-match then R2 test. 0=delete, 1=→"ist",
  // 2='iune'/'iuni' (requires preceding ţ; ţ+suffix → "t").
  private val Std = Array(
    "at", "ata", "ată", "ati", "ate", "ut", "uta", "ută", "uti", "ute",
    "it", "ita", "ită", "iti", "ite", "ic", "ica", "ice", "ici", "ică",
    "abil", "abila", "abile", "abili", "abilă",
    "ibil", "ibila", "ibile", "ibili", "ibilă",
    "oasa", "oasă", "oase", "os", "osi", "oşi",
    "ant", "anta", "ante", "anti", "antă", "ator", "atori",
    "itate", "itati", "ităi", "ităţi", "iv", "iva", "ive", "ivi", "ivă",
    "ism", "isme", "ist", "ista", "iste", "isti", "istă", "işti",
    "iune", "iuni")
  private val StdAction: Array[Int] = {
    val a = new Array[Int](Std.length)
    var i = Std.length - 10
    while (i < Std.length - 2) { a(i) = 1; i += 1 } // ism..işti
    a(Std.length - 2) = 2 // iune
    a(Std.length - 1) = 2 // iuni
    a
  }

  // verb_suffix: region-limited in RV. Group A requires the preceding char
  // to lie inside RV and be a non-vowel or 'u'; group B is unconditional.
  private val VerbA = Array(
    "ea", "ia", "esc", "ăsc", "ind", "ând", "are", "ere", "ire", "âre",
    "ase", "ise", "use", "âse", "eşte", "ăşte", "eze",
    "ai", "eai", "iai", "eşti", "ăşti", "ui", "ezi", "aşi",
    "aseşi", "iseşi", "useşi", "âseşi", "işi", "uşi", "âşi", "âi",
    "eaţi", "iaţi", "arăţi", "aserăţi", "iserăţi", "userăţi", "âserăţi",
    "irăţi", "urăţi", "ârăţi",
    "am", "eam", "iam", "asem", "isem", "usem", "âsem",
    "arăm", "aserăm", "iserăm", "userăm", "âserăm", "irăm", "urăm", "ârăm",
    "au", "eau", "iau", "indu", "ându", "ez", "ească",
    "ară", "aseră", "iseră", "useră", "âseră", "iră", "ură", "âră", "ează")
  private val VerbB = Array(
    "se", "sese", "sei", "seşi", "seseşi",
    "aţi", "eţi", "iţi", "âţi", "serăţi", "seserăţi",
    "em", "sesem", "im", "ăm", "serăm", "seserăm", "âm", "seră", "seseră")

  private val VowelSuf = Array("a", "e", "ie", "i", "ă")

  def stem(word: String): String = {
    // prelude: u/i between vowels → U/I (marked chars leave the vowel group)
    val sb = new StringBuilder(word)
    var i = 1
    while (i < sb.length - 1) {
      val c = sb.charAt(i)
      if ((c == 'u' || c == 'i') && isVowel(sb.charAt(i - 1), Vowels) &&
          isVowel(sb.charAt(i + 1), Vowels))
        sb.setCharAt(i, (c - 32).toChar)
      i += 1
    }
    var w = sb.toString

    val pV = Romance.rv(w, Vowels)
    val p1 = r1Standard(w, Vowels)
    val p2 = r2Standard(w, Vowels)
    @inline def del(n: Int): Unit = w = w.substring(0, w.length - n)

    // step_0 (suffix entirely inside R1)
    val s0 = longestSuffixIn(w, Step0, p1)
    if (s0 >= 0) {
      val s = Step0(s0)
      val start = w.length - s.length
      Step0Repl(s0) match {
        case null => del(s.length)
        case "i" if s == "ile" =>
          if (!(start >= 2 && w.regionMatches(start - 2, "ab", 0, 2)))
            w = w.substring(0, start) + "i"
        case r => w = w.substring(0, start) + r
      }
    }

    // standard suffix: repeat combo replacements, then one R2 pass
    var anyStd = false
    var looping = true
    while (looping) {
      val c = longestSuffix(w, Combo)
      if (c >= 0 && w.length - Combo(c).length >= p1) {
        w = w.substring(0, w.length - Combo(c).length) + ComboRepl(c)
        anyStd = true
      } else looping = false
    }
    val sd = longestSuffix(w, Std)
    if (sd >= 0 && w.length - Std(sd).length >= p2) {
      val s = Std(sd)
      val start = w.length - s.length
      StdAction(sd) match {
        case 0 => del(s.length); anyStd = true
        case 1 => w = w.substring(0, start) + "ist"; anyStd = true
        case 2 =>
          if (start >= 1 && w.charAt(start - 1) == 'ţ') {
            w = w.substring(0, start - 1) + "t"
            anyStd = true
          }
      }
    }

    // verb suffix (only if no standard suffix was removed); suffixes and the
    // group-A precondition character must lie inside RV; longest match wins
    // across both groups with no retry on a failed precondition.
    if (!anyStd) {
      val a = longestSuffixIn(w, VerbA, pV)
      val b = longestSuffixIn(w, VerbB, pV)
      val aLen = if (a >= 0) VerbA(a).length else -1
      val bLen = if (b >= 0) VerbB(b).length else -1
      if (bLen >= aLen && bLen > 0) del(bLen)
      else if (aLen > 0) {
        val prev = w.length - aLen - 1
        if (prev >= pV && {
              val c = w.charAt(prev)
              c == 'u' || !isVowel(c, Vowels)
            }) del(aLen)
      }
    }

    // vowel suffix (inside RV)
    val v = longestSuffixIn(w, VowelSuf, pV)
    if (v >= 0) del(VowelSuf(v).length)

    // postlude
    val out = new java.lang.StringBuilder(w.length)
    i = 0
    while (i < w.length) {
      out.append(w.charAt(i) match {
        case 'I' => 'i'; case 'U' => 'u'; case c => c
      })
      i += 1
    }
    out.toString
  }
}
