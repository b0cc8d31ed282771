package graft.analysis.snowball

import Snow._

/** Snowball Hungarian stemmer (published algorithm, snowballstem.org — the
  * same family the reference exposes via `Language::Hungarian`,
  * `/root/reference/src/tokenizer/stemmer.rs:12-30`).
  *
  * R1: for vowel-initial words the region after the first consonant or
  * digraph (cs/dz/dzs/gy/ly/ny/sz/ty/zs); for consonant-initial words the
  * region after the first vowel. All steps are longest-match-then-R1-test
  * (a longer match failing the region test fails the whole step). Steps in
  * order: instrumental (al/el after a double consonant, with undoubling),
  * case endings (+ final á/é unaccenting), special cases (én/án/ánként),
  * other cases (stul/stül family), factive (á/é after a double consonant),
  * owned, singular owner, plural owner, plural.
  */
object HungarianStemmer {
  private val Vowels = "aáeéiíoóöőuúüű"

  private val Digraphs = Array("dzs", "cs", "dz", "gy", "ly", "ny", "sz", "ty", "zs")
  private val Doubles = Array(
    "bb", "cc", "ccs", "dd", "ff", "gg", "ggy", "jj", "kk", "ll", "lly",
    "mm", "nn", "nny", "pp", "rr", "ss", "ssz", "tt", "tty", "vv", "zz", "zzs")

  private val Case = Array(
    "ban", "ben", "ba", "be", "ra", "re", "ig", "nak", "nek", "val", "vel",
    "ul", "ül", "ből", "ről", "től", "nál", "nél", "ból", "ról", "tól",
    "n", "an", "en", "on", "ön", "képpen", "képp", "kor",
    "t", "at", "et", "ot", "öt", "ként", "anként", "enként", "onként",
    "ért", "hez", "hoz", "höz", "vá", "vé")

  // (suffixes, replacement or null=delete) triples per step
  private val CaseSpecial = Array("én", "án", "ánként")
  private val CaseSpecialRepl = Array("e", "a", "a")

  private val CaseOther = Array("stul", "stül", "astul", "estül", "ástul", "éstül")
  private val CaseOtherRepl = Array(null, null, null, null, "a", "e")

  private val Owned = Array(
    "éi", "é", "ké", "aké", "eké", "oké", "öké", "ééi", "éké", "éé", "áéi", "áké")
  private val OwnedRepl = Array(
    null, null, null, null, null, null, null, "e", "e", "e", "a", "a")

  private val SingOwner = Array(
    "a", "ja", "d", "ad", "ed", "od", "öd", "e", "je", "nk", "unk", "ünk",
    "uk", "juk", "ük", "jük", "m", "am", "em", "om", "o",
    "ád", "ánk", "ájuk", "ám", "á", "éd", "énk", "éjük", "ém", "é")
  private val SingOwnerRepl: Array[String] =
    Array.fill[String](21)(null) ++ Array("a", "a", "a", "a", "a", "e", "e", "e", "e", "e")

  private val PlurOwner = Array(
    "id", "aid", "jaid", "eid", "jeid", "i", "ai", "jai", "ei", "jei",
    "itek", "eitek", "jeitek", "ik", "aik", "jaik", "eik", "jeik",
    "ink", "aink", "jaink", "eink", "jeink", "aitok", "jaitok",
    "im", "aim", "jaim", "eim", "jeim",
    "áid", "ái", "áik", "áink", "áitok", "áim",
    "éid", "éi", "éitek", "éik", "éink", "éim")
  private val PlurOwnerRepl: Array[String] =
    Array.fill[String](30)(null) ++ Array.fill(6)("a") ++ Array.fill(6)("e")

  private val Plural = Array("k", "ak", "ek", "ok", "ök", "ák", "ék")
  private val PluralRepl = Array(null, null, null, null, null, "a", "e")

  private def r1Of(w: String): Int = {
    if (w.isEmpty) return 0
    if (isVowel(w.charAt(0), Vowels)) {
      var i = 1
      while (i < w.length && isVowel(w.charAt(i), Vowels)) i += 1
      if (i >= w.length) return w.length
      val rest = w.substring(i)
      val dig = Digraphs.collectFirst { case d if rest.startsWith(d) => d.length }
      math.min(w.length, i + dig.getOrElse(1))
    } else {
      var i = 0
      while (i < w.length && !isVowel(w.charAt(i), Vowels)) i += 1
      if (i >= w.length) w.length else i + 1
    }
  }

  /** Remove the second-to-last char — snowball's undouble after a double
    * consonant (handles doubled digraphs like ccs→cs, ssz→sz too).
    */
  @inline private def undouble(w: String): String =
    w.substring(0, w.length - 2) + w.charAt(w.length - 1)

  private def endsWithDouble(w: String): Boolean =
    longestSuffix(w, Doubles) >= 0

  def stem(word: String): String = {
    var w = word
    val p1 = r1Of(w)
    @inline def inR1(pos: Int) = pos >= p1

    // apply one longest-match-then-R1-test table; returns true if changed
    def table(sufs: Array[String], repl: Array[String]): Boolean = {
      val i = longestSuffix(w, sufs)
      if (i >= 0 && inR1(w.length - sufs(i).length)) {
        val start = w.length - sufs(i).length
        w = if (repl(i) == null) w.substring(0, start) else w.substring(0, start) + repl(i)
        true
      } else false
    }

    // instrumental: al/el after a double consonant
    val ins = longestSuffix(w, Array("al", "el"))
    if (ins >= 0 && inR1(w.length - 2) && endsWithDouble(w.substring(0, w.length - 2))) {
      w = undouble(w.substring(0, w.length - 2))
    }

    // case endings, then unaccent a trailing á/é
    val c = longestSuffix(w, Case)
    if (c >= 0 && inR1(w.length - Case(c).length)) {
      w = w.substring(0, w.length - Case(c).length)
      if (w.endsWith("á") && inR1(w.length - 1)) w = w.substring(0, w.length - 1) + "a"
      else if (w.endsWith("é") && inR1(w.length - 1)) w = w.substring(0, w.length - 1) + "e"
    }

    table(CaseSpecial, CaseSpecialRepl)
    table(CaseOther, CaseOtherRepl)

    // factive: á/é after a double consonant
    if ((w.endsWith("á") || w.endsWith("é")) && inR1(w.length - 1) &&
        endsWithDouble(w.substring(0, w.length - 1))) {
      w = undouble(w.substring(0, w.length - 1))
    }

    table(Owned, OwnedRepl)
    table(SingOwner, SingOwnerRepl)
    table(PlurOwner, PlurOwnerRepl)
    table(Plural, PluralRepl)
    w
  }
}
