package graft.analysis.snowball

import Snow._

/** Snowball Danish stemmer (published algorithm, Snowball 2.x). */
object DanishStemmer {
  private val Vowels = "aeiouyæåø"
  private val SEnding = "abcdfghjklmnoprtvyzå"
  private val Step1 = Array(
    "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene", "erne",
    "ere", "en", "heden", "eren", "er", "heder", "erer", "heds", "es",
    "endes", "erendes", "enes", "ernes", "eres", "ens", "hedens", "erens",
    "ers", "ets", "erets", "et", "eret", "s")
  private val Step3 = Array("elig", "lig", "els", "ig", "løst")
  private val Pairs = Array("gd", "dt", "gt", "kt")

  def stem(word: String): String = {
    var w = word
    val p1 = r1AtLeast3(w, Vowels)
    val i1 = longestSuffixIn(w, Step1, p1)
    if (i1 >= 0) {
      val s = Step1(i1)
      if (s == "s") {
        if (w.length >= 2 && SEnding.indexOf(w.charAt(w.length - 2)) >= 0)
          w = w.substring(0, w.length - 1)
      } else w = w.substring(0, w.length - s.length)
    }
    w = consonantPair(w, p1)
    if (w.endsWith("igst")) w = w.substring(0, w.length - 2)
    val i3 = longestSuffixIn(w, Step3, p1)
    if (i3 >= 0) {
      val s = Step3(i3)
      if (s == "løst") w = w.substring(0, w.length - 1)
      else {
        w = w.substring(0, w.length - s.length)
        w = consonantPair(w, p1)
      }
    }
    // step 4: undouble — in R1, word ends with double consonant: drop one
    if (w.length >= 2 && w.length - 1 >= p1) {
      val a = w.charAt(w.length - 1)
      if (a == w.charAt(w.length - 2) && Vowels.indexOf(a) < 0)
        w = w.substring(0, w.length - 1)
    }
    w
  }

  private def consonantPair(w: String, p1: Int): String = {
    val i = longestSuffixIn(w, Pairs, p1)
    if (i >= 0) w.substring(0, w.length - 1) else w
  }
}

/** Snowball Norwegian stemmer (published algorithm, Snowball 2.x). */
object NorwegianStemmer {
  private val Vowels = "aeiouyæåø"
  private val SEnding = "bcdfghjlmnoprtvyz"
  private val Step1 = Array(
    "a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en", "heten",
    "ar", "er", "heter", "as", "es", "edes", "endes", "enes", "hetenes",
    "ens", "hetens", "ers", "ets", "et", "het", "ast", "s", "erte", "ert")
  private val Step3 = Array(
    "leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov", "elov", "slov",
    "hetslov")

  def stem(word: String): String = {
    var w = word
    val p1 = r1AtLeast3(w, Vowels)
    val i1 = longestSuffixIn(w, Step1, p1)
    if (i1 >= 0) {
      val s = Step1(i1)
      if (s == "s") {
        val ok = w.length >= 2 && {
          val prev = w.charAt(w.length - 2)
          SEnding.indexOf(prev) >= 0 ||
            (prev == 'k' && (w.length < 3 || Vowels.indexOf(w.charAt(w.length - 3)) < 0))
        }
        if (ok) w = w.substring(0, w.length - 1)
      } else if (s == "erte" || s == "ert") w = w.substring(0, w.length - (s.length - 2))
      else w = w.substring(0, w.length - s.length)
    }
    if ((w.endsWith("dt") || w.endsWith("vt")) && w.length - 2 >= p1)
      w = w.substring(0, w.length - 1)
    val i3 = longestSuffixIn(w, Step3, p1)
    if (i3 >= 0) w = w.substring(0, w.length - Step3(i3).length)
    w
  }
}

/** Snowball Swedish stemmer (published algorithm, Snowball 2.x). */
object SwedishStemmer {
  private val Vowels = "aeiouyäåö"
  private val SEnding = "bcdfghjklmnoprtvy"
  private val Step1 = Array(
    "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande", "arne",
    "are", "aste", "en", "anden", "aren", "heten", "ern", "ar", "er",
    "heter", "or", "as", "arnas", "ernas", "ornas", "es", "ades", "andes",
    "ens", "arens", "hetens", "erns", "at", "andet", "het", "ast", "s")
  private val Pairs = Array("dd", "gd", "nn", "dt", "gt", "kt", "tt")
  private val Step3Del = Array("lig", "ig", "els")

  def stem(word: String): String = {
    var w = word
    val p1 = r1AtLeast3(w, Vowels)
    val i1 = longestSuffixIn(w, Step1, p1)
    if (i1 >= 0) {
      val s = Step1(i1)
      if (s == "s") {
        if (w.length >= 2 && SEnding.indexOf(w.charAt(w.length - 2)) >= 0)
          w = w.substring(0, w.length - 1)
      } else w = w.substring(0, w.length - s.length)
    }
    val ip = longestSuffixIn(w, Pairs, p1)
    if (ip >= 0) w = w.substring(0, w.length - 1)
    if (w.endsWith("fullt") && w.length - 5 >= p1) w = w.substring(0, w.length - 1)
    else if (w.endsWith("löst") && w.length - 4 >= p1) w = w.substring(0, w.length - 1)
    else {
      val i3 = longestSuffixIn(w, Step3Del, p1)
      if (i3 >= 0) w = w.substring(0, w.length - Step3Del(i3).length)
    }
    w
  }
}
