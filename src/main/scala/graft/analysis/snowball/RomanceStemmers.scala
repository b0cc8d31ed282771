package graft.analysis.snowball

import Snow._

/** Shared region logic for the Romance family (spanish/portuguese/italian):
  * RV per the published definition — if the second letter is a consonant, RV
  * is after the next vowel; if the first two letters are vowels, after the
  * next consonant; otherwise (C then V) after the third letter; else the end
  * of the word.
  */
private[snowball] object Romance {
  def rv(w: String, vowels: String): Int = {
    val n = w.length
    if (n < 2) return n
    @inline def v(i: Int) = isVowel(w.charAt(i), vowels)
    if (!v(1)) { // X C: after the next vowel past position 1
      var i = 2
      while (i < n && !v(i)) i += 1
      if (i < n) i + 1 else n
    } else if (v(0)) { // V V: after the next consonant
      var i = 2
      while (i < n && v(i)) i += 1
      if (i < n) i + 1 else n
    } else { // C V: after the third letter
      if (n > 3) 3 else n
    }
  }

  val OsIcAd = Array("os", "ic", "ad")
  val AnteAbleIble = Array("ante", "able", "ible")
  val AbilIcIv = Array("abil", "ic", "iv")
  val ResidualSpanish = Array("os", "a", "o", "á", "í", "ó", "e", "é")

  /** `try(['x'] R2 delete)`-style helper: delete the longest of `sufs` whose
    * start satisfies `in`.
    */
  def tryDelete(w: String, sufs: Array[String], in: Int => Boolean): String = {
    val t = Snow.longestSuffix(w, sufs)
    if (t >= 0 && in(w.length - sufs(t).length)) w.substring(0, w.length - sufs(t).length)
    else w
  }
}

/** Snowball Spanish stemmer (published algorithm, Snowball 2.x). */
object SpanishStemmer {
  private val Vowels = "aeiouáéíóúü"

  private val Pronouns = Array(
    "me", "se", "sela", "selo", "selas", "selos", "la", "le", "lo",
    "las", "les", "los", "nos")
  private val PronPre = Array(
    "iéndo", "ándo", "ár", "ér", "ír", "ando", "iendo", "ar", "er", "ir", "yendo")
  private val PronPreRepl = Map(
    "iéndo" -> "iendo", "ándo" -> "ando", "ár" -> "ar", "ér" -> "er", "ír" -> "ir")

  private val Std = Array(
    "anza", "anzas", "ico", "ica", "icos", "icas", "ismo", "ismos", "able",
    "ables", "ible", "ibles", "ista", "istas", "oso", "osa", "osos", "osas",
    "amiento", "amientos", "imiento", "imientos",
    "adora", "ador", "ación", "adoras", "adores", "aciones", "ante", "antes",
    "ancia", "ancias",
    "logía", "logías", "ución", "uciones", "encia", "encias",
    "amente", "mente", "idad", "idades", "iva", "ivo", "ivas", "ivos")

  private val YVerb = Array(
    "ya", "ye", "yan", "yen", "yeron", "yendo", "yo", "yó", "yas", "yes",
    "yais", "yamos")

  private val VerbGu = Array("en", "es", "éis", "emos")
  private val Verb = Array(
    "arían", "arías", "arán", "arás", "aríais", "aría", "aréis", "aríamos",
    "aremos", "ará", "aré",
    "erían", "erías", "erán", "erás", "eríais", "ería", "eréis", "eríamos",
    "eremos", "erá", "eré",
    "irían", "irías", "irán", "irás", "iríais", "iría", "iréis", "iríamos",
    "iremos", "irá", "iré",
    "aba", "ada", "ida", "ía", "ara", "iera", "ad", "ed", "id", "ase", "iese",
    "aste", "iste", "an", "aban", "ían", "aran", "ieran", "asen", "iesen",
    "aron", "ieron", "ado", "ido", "ando", "iendo", "ió", "ar", "er", "ir",
    "as", "abas", "adas", "idas", "ías", "aras", "ieras", "ases", "ieses",
    "ís", "áis", "abais", "íais", "arais", "ierais", "aseis", "ieseis",
    "asteis", "isteis", "ados", "idos", "amos", "ábamos", "íamos", "imos",
    "áramos", "iéramos", "iésemos", "ásemos")

  def stem(word: String): String = {
    var w = word
    val pV = Romance.rv(w, Vowels)
    val p1 = r1Standard(w, Vowels)
    val p2 = r2Standard(w, Vowels)
    @inline def inRV(pos: Int) = pos >= pV
    @inline def inR1(pos: Int) = pos >= p1
    @inline def inR2(pos: Int) = pos >= p2
    @inline def del(n: Int): Unit = w = w.substring(0, w.length - n)

    // step 0: attached pronoun
    val pi = longestSuffix(w, Pronouns)
    if (pi >= 0) {
      val pron = Pronouns(pi)
      val base = w.substring(0, w.length - pron.length)
      val si = longestSuffix(base, PronPre)
      if (si >= 0 && inRV(base.length - PronPre(si).length)) {
        val pre = PronPre(si)
        if (pre == "yendo") {
          // 'yendo' only with a preceding 'u'
          if (base.length - 5 > 0 && base.charAt(base.length - 6) == 'u') w = base
        } else PronPreRepl.get(pre) match {
          case Some(unaccented) => w = base.substring(0, base.length - pre.length) + unaccented
          case None => w = base
        }
      }
    }

    val before12 = w
    // step 1: standard suffix
    val s1 = longestSuffix(w, Std)
    var step1Applied = false
    if (s1 >= 0) {
      val s = Std(s1)
      val start = w.length - s.length
      s match {
        case "adora" | "ador" | "ación" | "adoras" | "adores" | "aciones" |
             "ante" | "antes" | "ancia" | "ancias" =>
          if (inR2(start)) {
            del(s.length); step1Applied = true
            if (w.endsWith("ic") && inR2(w.length - 2)) del(2)
          }
        case "logía" | "logías" =>
          if (inR2(start)) { w = w.substring(0, start) + "log"; step1Applied = true }
        case "ución" | "uciones" =>
          if (inR2(start)) { w = w.substring(0, start) + "u"; step1Applied = true }
        case "encia" | "encias" =>
          if (inR2(start)) { w = w.substring(0, start) + "ente"; step1Applied = true }
        case "amente" =>
          if (inR1(start)) {
            del(6); step1Applied = true
            if (w.endsWith("iv") && inR2(w.length - 2)) {
              del(2)
              if (w.endsWith("at") && inR2(w.length - 2)) del(2)
            } else {
              val t = longestSuffix(w, Romance.OsIcAd)
              if (t >= 0 && inR2(w.length - Romance.OsIcAd(t).length))
                del(Romance.OsIcAd(t).length)
            }
          }
        case "mente" =>
          if (inR2(start)) {
            del(5); step1Applied = true
            val t = longestSuffix(w, Romance.AnteAbleIble)
            if (t >= 0 && inR2(w.length - Romance.AnteAbleIble(t).length))
              del(Romance.AnteAbleIble(t).length)
          }
        case "idad" | "idades" =>
          if (inR2(start)) {
            del(s.length); step1Applied = true
            val t = longestSuffix(w, Romance.AbilIcIv)
            if (t >= 0 && inR2(w.length - Romance.AbilIcIv(t).length))
              del(Romance.AbilIcIv(t).length)
          }
        case "iva" | "ivo" | "ivas" | "ivos" =>
          if (inR2(start)) {
            del(s.length); step1Applied = true
            if (w.endsWith("at") && inR2(w.length - 2)) del(2)
          }
        case _ =>
          if (inR2(start)) { del(s.length); step1Applied = true }
      }
    }

    // step 2a (only if step 1 left the word unchanged): y-verb suffixes
    if (w == before12) {
      val y = longestSuffixIn(w, YVerb, pV)
      if (y >= 0) {
        val s = YVerb(y)
        val start = w.length - s.length
        if (start > 0 && w.charAt(start - 1) == 'u') { del(s.length); step1Applied = true }
      }
    }
    // step 2b (only if still unchanged): other verb suffixes
    if (w == before12) {
      val g = longestSuffixIn(w, VerbGu, pV)
      val v = longestSuffixIn(w, Verb, pV)
      val gLen = if (g >= 0) VerbGu(g).length else -1
      val vLen = if (v >= 0) Verb(v).length else -1
      if (gLen >= vLen && gLen > 0) {
        del(gLen)
        if (w.endsWith("gu")) del(1) // 'u' after 'g' folds into the deletion
      } else if (vLen > 0) del(vLen)
    }

    // step 3: residual suffix
    val r = longestSuffix(w, Romance.ResidualSpanish)
    if (r >= 0) {
      val s = Romance.ResidualSpanish(r)
      val start = w.length - s.length
      s match {
        case "e" | "é" =>
          if (inRV(start)) {
            del(s.length)
            if (w.endsWith("u") && inRV(w.length - 1) &&
                w.length >= 2 && w.charAt(w.length - 2) == 'g') del(1)
          }
        case _ => if (inRV(start)) del(s.length)
      }
    }

    // postlude: strip acute accents
    val sb = new java.lang.StringBuilder(w.length)
    var i = 0
    while (i < w.length) {
      sb.append(w.charAt(i) match {
        case 'á' => 'a'; case 'é' => 'e'; case 'í' => 'i'
        case 'ó' => 'o'; case 'ú' => 'u'; case c => c
      })
      i += 1
    }
    sb.toString
  }
}

/** Snowball Portuguese stemmer (published algorithm, Snowball 2.x).
  * Works on the prelude form where ã/õ are spelled `a~`/`o~` (the `~` is a
  * consonant for region purposes), exactly like the reference prelude.
  */
object PortugueseStemmer {
  private val Vowels = "aeiouáéíóúâêô"

  private val Std = Array(
    "eza", "ezas", "ico", "ica", "icos", "icas", "ismo", "ismos", "ável",
    "ível", "ista", "istas", "oso", "osa", "osos", "osas", "amento",
    "amentos", "imento", "imentos",
    "adora", "ador", "aça~o", "adoras", "adores", "aço~es", "ante", "antes",
    "ância",
    "logia", "logias", "uça~o", "uço~es", "ência", "ências",
    "amente", "mente", "idade", "idades", "iva", "ivo", "ivas", "ivos",
    "ira", "iras")

  private val MenteInner = Array("ante", "avel", "ível")

  private val Verb = Array(
    "ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara", "erá", "era",
    "irá", "ava", "asse", "esse", "isse", "aste", "este", "iste", "ei",
    "arei", "erei", "irei", "am", "iam", "ariam", "eriam", "iriam", "aram",
    "eram", "iram", "avam", "em", "arem", "erem", "irem", "assem", "essem",
    "issem", "ado", "ido", "ando", "endo", "indo", "ara~o", "era~o", "ira~o",
    "ar", "er", "ir", "as", "adas", "idas", "ias", "arias", "erias", "irias",
    "arás", "aras", "erás", "eras", "irás", "avas", "es", "ardes", "erdes",
    "irdes", "ares", "eres", "ires", "asses", "esses", "isses", "astes",
    "estes", "istes", "is", "ais", "eis", "íeis", "aríeis", "eríeis",
    "iríeis", "áreis", "areis", "éreis", "ereis", "íreis", "ireis",
    "ásseis", "ésseis", "ísseis", "áveis", "ados", "idos", "ámos", "amos",
    "íamos", "aríamos", "eríamos", "iríamos", "áramos", "éramos", "íramos",
    "ávamos", "emos", "aremos", "eremos", "iremos", "ássemos", "êssemos",
    "íssemos", "imos", "armos", "ermos", "irmos", "eu", "iu", "ou",
    "ira", "iras")

  private val Residual = Array("os", "a", "i", "o", "á", "í", "ó")

  def stem(word: String): String = {
    var w = word.replace("ã", "a~").replace("õ", "o~")
    val pV = Romance.rv(w, Vowels)
    val p1 = r1Standard(w, Vowels)
    val p2 = r2Standard(w, Vowels)
    @inline def inRV(pos: Int) = pos >= pV
    @inline def inR1(pos: Int) = pos >= p1
    @inline def inR2(pos: Int) = pos >= p2
    @inline def del(n: Int): Unit = w = w.substring(0, w.length - n)

    val before = w
    // standard suffix
    val s1 = longestSuffix(w, Std)
    if (s1 >= 0) {
      val s = Std(s1)
      val start = w.length - s.length
      s match {
        case "logia" | "logias" =>
          if (inR2(start)) w = w.substring(0, start) + "log"
        case "uça~o" | "uço~es" =>
          if (inR2(start)) w = w.substring(0, start) + "u"
        case "ência" | "ências" =>
          if (inR2(start)) w = w.substring(0, start) + "ente"
        case "amente" =>
          if (inR1(start)) {
            del(6)
            if (w.endsWith("iv") && inR2(w.length - 2)) {
              del(2)
              if (w.endsWith("at") && inR2(w.length - 2)) del(2)
            } else w = Romance.tryDelete(w, Romance.OsIcAd, inR2)
          }
        case "mente" =>
          if (inR2(start)) { del(5); w = Romance.tryDelete(w, MenteInner, inR2) }
        case "idade" | "idades" =>
          if (inR2(start)) { del(s.length); w = Romance.tryDelete(w, Romance.AbilIcIv, inR2) }
        case "iva" | "ivo" | "ivas" | "ivos" =>
          if (inR2(start)) {
            del(s.length)
            if (w.endsWith("at") && inR2(w.length - 2)) del(2)
          }
        case "ira" | "iras" =>
          if (inRV(start) && start > 0 && w.charAt(start - 1) == 'e')
            w = w.substring(0, start) + "ir"
        case _ =>
          if (inR2(start)) del(s.length)
      }
    }
    var changed = w != before
    // verb suffix (only if the standard pass made no change)
    if (!changed) {
      val v = longestSuffixIn(w, Verb, pV)
      if (v >= 0) { del(Verb(v).length); changed = true }
    }
    // if either pass fired: drop a trailing 'i' after 'c' in RV
    if (changed && w.endsWith("i") && inRV(w.length - 1) &&
        w.length >= 2 && w.charAt(w.length - 2) == 'c')
      del(1)
    // otherwise: residual suffix
    if (!changed) {
      val r = longestSuffix(w, Residual)
      if (r >= 0 && inRV(w.length - Residual(r).length)) del(Residual(r).length)
    }
    // residual form (always)
    if (w.endsWith("e") || w.endsWith("é") || w.endsWith("ê")) {
      if (inRV(w.length - 1)) {
        del(1)
        if ((w.endsWith("u") && w.length >= 2 && w.charAt(w.length - 2) == 'g') ||
            (w.endsWith("i") && w.length >= 2 && w.charAt(w.length - 2) == 'c')) {
          if (inRV(w.length - 1)) del(1)
        }
      }
    } else if (w.endsWith("ç")) {
      w = w.substring(0, w.length - 1) + "c"
    }
    w.replace("a~", "ã").replace("o~", "õ")
  }
}

/** Snowball Italian stemmer (published algorithm, Snowball 2.x). */
object ItalianStemmer {
  private val Vowels = "aeiouàèìòù"

  private val Pronouns = Array(
    "ci", "gli", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi",
    "sene", "gliela", "gliele", "glieli", "glielo", "gliene",
    "mela", "mele", "meli", "melo", "mene",
    "tela", "tele", "teli", "telo", "tene",
    "cela", "cele", "celi", "celo", "cene",
    "vela", "vele", "veli", "velo", "vene")
  private val PronPre = Array("ando", "endo", "ar", "er", "ir")

  private val Std = Array(
    "anza", "anze", "ico", "ici", "ica", "ice", "iche", "ichi", "ismo",
    "ismi", "abile", "abili", "ibile", "ibili", "ista", "iste", "isti",
    "istà", "istè", "istì", "oso", "osi", "osa", "ose", "mente", "atrice",
    "atrici", "ante", "anti",
    "azione", "azioni", "atore", "atori",
    "logia", "logie", "uzione", "uzioni", "usione", "usioni",
    "enza", "enze", "amento", "amenti", "imento", "imenti",
    "amente", "ità", "ivo", "ivi", "iva", "ive")

  private val OsIcAbil = Array("os", "ic", "abil")

  private val Verb = Array(
    "ammo", "ando", "ano", "are", "arono", "asse", "assero", "assi",
    "assimo", "ata", "ate", "ati", "ato", "ava", "avamo", "avano", "avate",
    "avi", "avo", "emmo", "enda", "ende", "endi", "endo", "erà", "erai",
    "eranno", "ere", "erebbe", "erebbero", "erei", "eremmo", "eremo",
    "ereste", "eresti", "erete", "erò", "erono", "essero", "ete", "eva",
    "evamo", "evano", "evate", "evi", "evo", "Yamo", "iamo", "immo", "irà",
    "irai", "iranno", "ire", "irebbe", "irebbero", "irei", "iremmo",
    "iremo", "ireste", "iresti", "irete", "irò", "irono", "isca", "iscano",
    "isce", "isci", "isco", "iscono", "issero", "ita", "ite", "iti", "ito",
    "iva", "ivamo", "ivano", "ivate", "ivi", "ivo", "ono", "uta", "ute",
    "uti", "uto", "ar", "ir")

  def stem(word: String): String = {
    // prelude: fold acute to grave; qu -> qU; u/i between vowels -> U/I
    var sb = new StringBuilder(word.length)
    var i = 0
    while (i < word.length) {
      sb.append(word.charAt(i) match {
        case 'á' => 'à'; case 'é' => 'è'; case 'í' => 'ì'
        case 'ó' => 'ò'; case 'ú' => 'ù'; case c => c
      })
      i += 1
    }
    i = 1
    while (i < sb.length) {
      if (sb.charAt(i) == 'u' && sb.charAt(i - 1) == 'q') sb.setCharAt(i, 'U')
      i += 1
    }
    i = 1
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
    @inline def inRV(pos: Int) = pos >= pV
    @inline def inR1(pos: Int) = pos >= p1
    @inline def inR2(pos: Int) = pos >= p2
    @inline def del(n: Int): Unit = w = w.substring(0, w.length - n)

    // attached pronoun
    val pi = longestSuffix(w, Pronouns)
    if (pi >= 0) {
      val pron = Pronouns(pi)
      val base = w.substring(0, w.length - pron.length)
      val si = longestSuffix(base, PronPre)
      if (si >= 0 && inRV(base.length - PronPre(si).length)) {
        PronPre(si) match {
          case "ando" | "endo" => w = base
          case _ => w = base + "e"
        }
      }
    }

    val before = w
    // standard suffix
    val s1 = longestSuffix(w, Std)
    if (s1 >= 0) {
      val s = Std(s1)
      val start = w.length - s.length
      s match {
        case "azione" | "azioni" | "atore" | "atori" =>
          if (inR2(start)) {
            del(s.length)
            if (w.endsWith("ic") && inR2(w.length - 2)) del(2)
          }
        case "logia" | "logie" =>
          if (inR2(start)) w = w.substring(0, start) + "log"
        case "uzione" | "uzioni" | "usione" | "usioni" =>
          if (inR2(start)) w = w.substring(0, start) + "u"
        case "enza" | "enze" =>
          if (inR2(start)) w = w.substring(0, start) + "ente"
        case "amento" | "amenti" | "imento" | "imenti" =>
          if (inRV(start)) del(s.length)
        case "amente" =>
          if (inR1(start)) {
            del(6)
            if (w.endsWith("iv") && inR2(w.length - 2)) {
              del(2)
              if (w.endsWith("at") && inR2(w.length - 2)) del(2)
            } else w = Romance.tryDelete(w, OsIcAbil, inR2)
          }
        case "ità" =>
          if (inR2(start)) { del(3); w = Romance.tryDelete(w, Romance.AbilIcIv, inR2) }
        case "ivo" | "ivi" | "iva" | "ive" =>
          if (inR2(start)) {
            del(s.length)
            if (w.endsWith("at") && inR2(w.length - 2)) {
              del(2)
              if (w.endsWith("ic") && inR2(w.length - 2)) del(2)
            }
          }
        case _ =>
          if (inR2(start)) del(s.length)
      }
    }
    // verb suffix (only if the standard pass made no change)
    if (w == before) {
      val v = longestSuffixIn(w, Verb, pV)
      if (v >= 0) del(Verb(v).length)
    }

    // vowel suffix: final a/e/i/o/à/è/ì/ò in RV, then a second 'i' in RV
    val last = if (w.isEmpty) ' ' else w.charAt(w.length - 1)
    if ("aeioàèìò".indexOf(last) >= 0 && inRV(w.length - 1)) {
      del(1)
      if (w.endsWith("i") && inRV(w.length - 1)) del(1)
    }
    // ch -> c, gh -> g in RV
    if ((w.endsWith("ch") || w.endsWith("gh")) && inRV(w.length - 2)) del(1)

    // postlude: unmark U/I
    w.map { case 'U' => 'u'; case 'I' => 'i'; case c => c }
  }
}

/** Snowball French stemmer (published algorithm, Snowball 2.x). Works on the
  * prelude form: u/i between vowels and u-after-q marked U/I, y next to a
  * vowel marked Y, ë/ï spelled He/Hi (H is a consonant marker).
  */
object FrenchStemmer {
  private val Vowels = "aeiouyâàëéêèïîôûù"

  private val Std = Array(
    "ance", "iqUe", "isme", "able", "iste", "eux", "ances", "iqUes",
    "ismes", "ables", "istes",
    "atrice", "ateur", "ation", "atrices", "ateurs", "ations",
    "logie", "logies", "usion", "ution", "usions", "utions",
    "ence", "ences", "ement", "ements", "ité", "ités", "if", "ive", "ifs",
    "ives", "eaux", "aux", "euse", "euses", "issement", "issements",
    "amment", "emment", "ment", "ments")

  private val IVerb = Array(
    "îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira", "irai", "iraIent",
    "irais", "irait", "iras", "irent", "irez", "iriez", "irions", "irons",
    "iront", "is", "issaIent", "issais", "issait", "issant", "issante",
    "issantes", "issants", "isse", "issent", "isses", "issez", "issiez",
    "issions", "issons", "it")

  private val VerbIons = Array("ions")
  private val VerbDel = Array(
    "é", "ée", "ées", "és", "èrent", "er", "era", "erai", "eraIent",
    "erais", "erait", "eras", "erez", "eriez", "erions", "erons", "eront",
    "ez", "iez")
  private val VerbDelE = Array(
    "âmes", "ât", "âtes", "a", "ai", "aIent", "ais", "ait", "ant", "ante",
    "antes", "ants", "as", "asse", "assent", "asses", "assiez", "assions")

  private val ResidIer = Array("ier", "ière", "Ier", "Ière")
  private val UnDouble = Array("enn", "onn", "ett", "ell", "eill")

  def stem(word: String): String = {
    // prelude (forward scan, priority-ordered alternatives per position)
    val sb = new StringBuilder(word)
    var i = 0
    @inline def isV(c: Char) = Vowels.indexOf(c) >= 0
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (isV(c) && i + 1 < sb.length) {
        val d = sb.charAt(i + 1)
        if (d == 'u' && i + 2 < sb.length && isV(sb.charAt(i + 2))) {
          sb.setCharAt(i + 1, 'U'); i += 2
        } else if (d == 'i' && i + 2 < sb.length && isV(sb.charAt(i + 2))) {
          sb.setCharAt(i + 1, 'I'); i += 2
        } else if (d == 'y') { sb.setCharAt(i + 1, 'Y'); i += 2 }
        else if (c == 'ë') { sb.replace(i, i + 1, "He"); i += 2 }
        else if (c == 'ï') { sb.replace(i, i + 1, "Hi"); i += 2 }
        else if (c == 'y' && isV(d)) { sb.setCharAt(i, 'Y'); i += 1 }
        else i += 1
      } else if (c == 'ë') { sb.replace(i, i + 1, "He"); i += 2 }
      else if (c == 'ï') { sb.replace(i, i + 1, "Hi"); i += 2 }
      else if (c == 'y' && i + 1 < sb.length && isV(sb.charAt(i + 1))) {
        sb.setCharAt(i, 'Y'); i += 1
      } else if (c == 'q' && i + 1 < sb.length && sb.charAt(i + 1) == 'u') {
        sb.setCharAt(i + 1, 'U'); i += 2
      } else i += 1
    }
    var w = sb.toString

    // regions
    val n0 = w.length
    val pV: Int = {
      if (n0 >= 3 && isV(w.charAt(0)) && isV(w.charAt(1))) 3
      else if (n0 >= 3 && (w.startsWith("par") || w.startsWith("col") || w.startsWith("tap"))) 3
      else {
        var j = 1
        while (j < n0 && !isV(w.charAt(j))) j += 1
        if (j < n0) j + 1 else n0
      }
    }
    val p1 = r1Standard(w, Vowels)
    val p2 = r2Standard(w, Vowels)
    @inline def inRV(pos: Int) = pos >= pV
    @inline def inR1(pos: Int) = pos >= p1
    @inline def inR2(pos: Int) = pos >= p2
    @inline def del(k: Int): Unit = w = w.substring(0, w.length - k)

    var suffixFound = false

    // --- standard suffix
    val s1 = longestSuffix(w, Std)
    if (s1 >= 0) {
      val s = Std(s1)
      val start = w.length - s.length
      s match {
        case "atrice" | "ateur" | "ation" | "atrices" | "ateurs" | "ations" =>
          if (inR2(start)) {
            del(s.length); suffixFound = true
            if (w.endsWith("ic")) {
              if (inR2(w.length - 2)) del(2)
              else w = w.substring(0, w.length - 2) + "iqU"
            }
          }
        case "logie" | "logies" =>
          if (inR2(start)) { w = w.substring(0, start) + "log"; suffixFound = true }
        case "usion" | "ution" | "usions" | "utions" =>
          if (inR2(start)) { w = w.substring(0, start) + "u"; suffixFound = true }
        case "ence" | "ences" =>
          if (inR2(start)) { w = w.substring(0, start) + "ent"; suffixFound = true }
        case "ement" | "ements" =>
          if (inRV(start)) {
            del(s.length); suffixFound = true
            if (w.endsWith("iv") && inR2(w.length - 2)) {
              del(2)
              if (w.endsWith("at") && inR2(w.length - 2)) del(2)
            } else if (w.endsWith("eus")) {
              if (inR2(w.length - 3)) del(3)
              else if (inR1(w.length - 3)) w = w.substring(0, w.length - 3) + "eux"
            } else if (w.endsWith("abl") && inR2(w.length - 3)) del(3)
            else if (w.endsWith("iqU") && inR2(w.length - 3)) del(3)
            else if ((w.endsWith("ièr") || w.endsWith("Ièr")) && inRV(w.length - 3))
              w = w.substring(0, w.length - 3) + "i"
          }
        case "ité" | "ités" =>
          if (inR2(start)) {
            del(s.length); suffixFound = true
            if (w.endsWith("abil")) {
              if (inR2(w.length - 4)) del(4)
              else w = w.substring(0, w.length - 4) + "abl"
            } else if (w.endsWith("ic")) {
              if (inR2(w.length - 2)) del(2)
              else w = w.substring(0, w.length - 2) + "iqU"
            } else if (w.endsWith("iv") && inR2(w.length - 2)) del(2)
          }
        case "if" | "ive" | "ifs" | "ives" =>
          if (inR2(start)) {
            del(s.length); suffixFound = true
            if (w.endsWith("at") && inR2(w.length - 2)) {
              del(2)
              if (w.endsWith("ic")) {
                if (inR2(w.length - 2)) del(2)
                else w = w.substring(0, w.length - 2) + "iqU"
              }
            }
          }
        case "eaux" =>
          w = w.substring(0, w.length - 1); suffixFound = true // eaux -> eau
        case "aux" =>
          if (inR1(start)) { w = w.substring(0, start) + "al"; suffixFound = true }
        case "euse" | "euses" =>
          if (inR2(start)) { del(s.length); suffixFound = true }
          else if (inR1(start)) { w = w.substring(0, start) + "eux"; suffixFound = true }
        case "issement" | "issements" =>
          if (inR1(start) && start > 0 && !isV(w.charAt(start - 1))) {
            del(s.length); suffixFound = true
          }
        // amment/emment/ment(s) end with `fail` in french.sbl: the edit
        // persists but standard_suffix reports failure, so the verb steps
        // (and residual, if those fail too) still run on the modified word.
        case "amment" =>
          if (inRV(start)) w = w.substring(0, start) + "ant"
        case "emment" =>
          if (inRV(start)) w = w.substring(0, start) + "ent"
        case "ment" | "ments" =>
          if (start > 0 && isV(w.charAt(start - 1)) && inRV(start - 1))
            del(s.length)
        case _ =>
          if (inR2(start)) { del(s.length); suffixFound = true }
      }
    }

    // --- i-verb suffix (whole match incl. preceding consonant within RV)
    if (!suffixFound) {
      val v = longestSuffixIn(w, IVerb, pV)
      if (v >= 0) {
        val start = w.length - IVerb(v).length
        if (start - 1 >= pV && !isV(w.charAt(start - 1)) && w.charAt(start - 1) != 'H') {
          del(IVerb(v).length); suffixFound = true
        }
      }
    }
    // --- verb suffix
    if (!suffixFound) {
      val a = longestSuffixIn(w, VerbIons, pV)
      val b = longestSuffixIn(w, VerbDel, pV)
      val c = longestSuffixIn(w, VerbDelE, pV)
      val aL = if (a >= 0) 4 else -1
      val bL = if (b >= 0) VerbDel(b).length else -1
      val cL = if (c >= 0) VerbDelE(c).length else -1
      val m = math.max(aL, math.max(bL, cL))
      if (m > 0) {
        if (m == aL && aL >= bL && aL >= cL) {
          if (inR2(w.length - 4)) { del(4); suffixFound = true }
        } else if (bL >= cL) {
          del(bL); suffixFound = true
        } else {
          del(cL); suffixFound = true
          if (w.endsWith("e") && inRV(w.length - 1)) del(1)
        }
      }
    }

    if (suffixFound) {
      if (w.endsWith("Y")) w = w.substring(0, w.length - 1) + "i"
      else if (w.endsWith("ç")) w = w.substring(0, w.length - 1) + "c"
    } else {
      // --- residual suffix: drop 's' unless preceded by keep_with_s
      // ('aiouès'), with 'Hi' (= ï) explicitly allowed despite the 'i'
      if (w.endsWith("s")) {
        val before = w.length - 1
        val okHi = before >= 2 && w.charAt(before - 1) == 'i' && w.charAt(before - 2) == 'H'
        val okKeep = before >= 1 && "aiouès".indexOf(w.charAt(before - 1)) < 0
        if (okHi || okKeep) del(1)
      }
      if (w.endsWith("ion") && inRV(w.length - 3) && inR2(w.length - 3) &&
          w.length - 4 >= pV && (w.charAt(w.length - 4) == 's' || w.charAt(w.length - 4) == 't')) {
        del(3)
      } else {
        val r = longestSuffixIn(w, ResidIer, pV)
        if (r >= 0) w = w.substring(0, w.length - ResidIer(r).length) + "i"
        else if (w.endsWith("e") && inRV(w.length - 1)) del(1)
      }
    }

    // un_double
    val d = longestSuffix(w, UnDouble)
    if (d >= 0) del(1)
    // un_accent: é/è followed by >= 1 non-vowels at the end -> e
    var k = w.length - 1
    var cnt = 0
    while (k >= 0 && !isV(w.charAt(k)) && w.charAt(k) != 'é' && w.charAt(k) != 'è') { k -= 1; cnt += 1 }
    if (cnt >= 1 && k >= 0 && (w.charAt(k) == 'é' || w.charAt(k) == 'è'))
      w = w.substring(0, k) + "e" + w.substring(k + 1)

    // postlude
    val out = new java.lang.StringBuilder(w.length)
    i = 0
    while (i < w.length) {
      val c = w.charAt(i)
      if (c == 'H' && i + 1 < w.length && w.charAt(i + 1) == 'e') { out.append('ë'); i += 2 }
      else if (c == 'H' && i + 1 < w.length && w.charAt(i + 1) == 'i') { out.append('ï'); i += 2 }
      else if (c == 'H') i += 1
      else {
        out.append(c match {
          case 'I' => 'i'; case 'U' => 'u'; case 'Y' => 'y'; case x => x
        })
        i += 1
      }
    }
    out.toString
  }
}
