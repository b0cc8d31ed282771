package graft.analysis.snowball

import Snow._

/** Snowball Russian stemmer (published algorithm, Snowball 2.x — the same
  * family the reference exposes via `Language::Russian`,
  * `/root/reference/src/tokenizer/stemmer.rs:12-30`).
  *
  * Steps (all confined to RV = region after the first vowel): perfective
  * gerund, else reflexive then longest of adjectival/verb/noun; then final-и
  * removal; derivational ост/ость in R2; tidy-up (нн undouble, superlative
  * ейш(е), final ь). Snowball 2.x also folds ё → е up front.
  */
object RussianStemmer {
  private val Vowels = "аеиоуыэюя"

  // perfective gerund: group 1 requires preceding а/я (which stays)
  private val Gerund1 = Array("в", "вши", "вшись")
  private val Gerund2 = Array("ив", "ивши", "ившись", "ыв", "ывши", "ывшись")

  private val Adjective = Array(
    "ее", "ие", "ые", "ое", "ими", "ыми", "ей", "ий", "ый", "ой", "ем", "им",
    "ым", "ом", "его", "ого", "ему", "ому", "их", "ых", "ую", "юю", "ая",
    "яя", "ою", "ею")
  private val Participle1 = Array("ем", "нн", "вш", "ющ", "щ")
  private val Participle2 = Array("ивш", "ывш", "ующ")

  private val Verb1 = Array(
    "ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н", "ло", "но", "ет",
    "ют", "ны", "ть", "ешь", "нно")
  private val Verb2 = Array(
    "ила", "ыла", "ена", "ейте", "уйте", "ите", "или", "ыли", "ей", "уй",
    "ил", "ыл", "им", "ым", "ен", "ило", "ыло", "ено", "ят", "ует", "уют",
    "ит", "ыт", "ены", "ить", "ыть", "ишь", "ую", "ю")

  private val Noun = Array(
    "а", "ев", "ов", "ие", "ье", "е", "иями", "ями", "ами", "еи", "ии", "и",
    "ией", "ей", "ой", "ий", "й", "иям", "ям", "ием", "ем", "ам", "ом", "о",
    "у", "ах", "иях", "ях", "ы", "ь", "ию", "ью", "ю", "ия", "ья", "я")

  private val Superlative = Array("ейш", "ейше")

  def stem(word: String): String = {
    var w = word.replace('ё', 'е')
    val pV: Int = {
      var i = 0
      while (i < w.length && !isVowel(w.charAt(i), Vowels)) i += 1
      if (i < w.length) i + 1 else w.length
    }
    val p2 = r2Standard(w, Vowels)
    @inline def inRV(pos: Int) = pos >= pV
    @inline def del(n: Int): Unit = w = w.substring(0, w.length - n)

    /** Longest match across two groups where group 1 additionally requires a
      * preceding а/я inside RV; deletes and returns true if applied. Among
      * semantics: if the longest match is a group-1 entry whose а/я test
      * fails, the whole search fails (no retry of shorter suffixes).
      */
    def amongWithAYa(g1: Array[String], g2: Array[String]): Boolean = {
      val i1 = longestSuffixIn(w, g1, pV)
      val i2 = longestSuffixIn(w, g2, pV)
      val l1 = if (i1 >= 0) g1(i1).length else -1
      val l2 = if (i2 >= 0) g2(i2).length else -1
      if (l2 >= l1 && l2 > 0) { del(l2); true }
      else if (l1 > 0) {
        val start = w.length - l1
        val prev = start - 1
        if (prev >= pV && (w.charAt(prev) == 'а' || w.charAt(prev) == 'я')) {
          del(l1); true
        } else false
      } else false
    }

    // step 1: perfective gerund, else (reflexive? then adjectival|verb|noun)
    if (!amongWithAYa(Gerund1, Gerund2)) {
      if (w.endsWith("ся") && inRV(w.length - 2)) del(2)
      else if (w.endsWith("сь") && inRV(w.length - 2)) del(2)
      // adjectival = adjective (then optional participle)
      val a = longestSuffixIn(w, Adjective, pV)
      if (a >= 0) {
        del(Adjective(a).length)
        amongWithAYa(Participle1, Participle2)
      } else if (!amongWithAYa(Verb1, Verb2)) {
        val n = longestSuffixIn(w, Noun, pV)
        if (n >= 0) del(Noun(n).length)
      }
    }

    // step 2: final и
    if (w.endsWith("и") && inRV(w.length - 1)) del(1)

    // step 3: derivational ост/ость in R2
    if (w.endsWith("ость") && w.length - 4 >= p2 && inRV(w.length - 4)) del(4)
    else if (w.endsWith("ост") && w.length - 3 >= p2 && inRV(w.length - 3)) del(3)

    // step 4 (tidy_up): longest of ейше/ейш | н | ь
    val sup = longestSuffixIn(w, Superlative, pV)
    if (sup >= 0) {
      del(Superlative(sup).length)
      if (w.endsWith("нн") && w.length - 2 >= pV) del(1)
    } else if (w.endsWith("нн") && w.length - 2 >= pV) del(1)
    else if (w.endsWith("ь") && inRV(w.length - 1)) del(1)
    w
  }
}
