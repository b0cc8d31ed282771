package graft.analysis.snowball

/** Snowball Tamil stemmer (published algorithm by Damodharan Rajalingam,
  * snowballstem.org; the reference exposes it via `Language::Tamil`,
  * `/root/reference/src/tokenizer/stemmer.rs:12-30`).
  *
  * Pipeline (each routine gated on a minimum length, all suffix matching
  * longest-first): ending normalization (`fixEnding`), question prefix
  * (எC்) and pronoun prefix (அ/இ/உ + C + ்) removal with வ+vowel-sign
  * start fixes, question/um/common-word-ending suffixes folded to pulli,
  * vetrumai (case) endings (setting a flag that enables the த்த்→ம்
  * ending fix), plural suffixes, and a tense-suffix loop that repeats
  * while a suffix was removed. Tamil codepoints are single UTF-16 chars,
  * so `length`/indexing below operate on codepoints exactly like the
  * published algorithm's symbol counts.
  */
object TamilStemmer {

  private val Hard = "கசடதபற"                  // vallinam consonants
  private val Cons10 = "கஙசஞதநபமயவ"
  private val VowelSigns = "ீுூெேைாி"
  private val IndepVowels = "அஆஇஈஉஊஎஏஐஒஓஔ"

  /** fix_ending: one pass of the ending-normalization or-chain.
    * Returns None when no rule applies (or the word is too short).
    */
  private def fixEnding(w: String, vetrumai: Boolean): Option[String] = {
    if (w.length <= 3) return None
    val n = w.length
    @inline def e(s: String) = w.endsWith(s)
    @inline def at(i: Int) = w.charAt(n - i) // 1-based from end

    if (e("ந்த்")) return Some(w.dropRight(4))
    if (e("ந்த")) return Some(w.dropRight(3))
    if (e("ந்")) return Some(w.dropRight(2))
    if (e("ய்") && n >= 3 && "ீைி".indexOf(at(3)) >= 0) return Some(w.dropRight(2))
    if (e("ட்ப்") || e("ட்க்")) return Some(w.dropRight(4) + "ள்")
    if (e("ன்ற்") || e("ற்க்")) return Some(w.dropRight(4) + "ல்")
    if (e("ட்ட்")) return Some(w.dropRight(4) + "டு")
    if (vetrumai && e("த்த்") && (n < 5 || at(5) != 'ை')) return Some(w.dropRight(4) + "ம்")
    if (e("ுக்")) return Some(w.dropRight(3) + "்")
    if (e("ுக்க்")) return Some(w.dropRight(5) + "்")
    if (n >= 4 && at(1) == '்' && Hard.indexOf(at(2)) >= 0 && at(3) == '்' && Hard.indexOf(at(4)) >= 0)
      return Some(w.dropRight(4))
    if (n >= 2 && at(1) == '்' && Hard.indexOf(at(2)) >= 0) return Some(w.dropRight(2))
    if (n >= 3 && at(1) == '்' && at(3) == '்' && "யரலளழவஙஞணநனம".indexOf(at(2)) >= 0)
      return Some(w.dropRight(3) + "்")
    if (e("வ்")) return Some(w.dropRight(2))
    if (e("ய") || e("வ")) return Some(w.dropRight(1))
    if (e("னு") && (n < 3 || VowelSigns.indexOf(at(3)) < 0)) return Some(w.dropRight(2))
    if (e("ங்")) {
      return Some(if (n < 3 || at(3) != 'ை') w.dropRight(2) + "ம்" else w.dropRight(2))
    }
    if (n >= 2 && at(1) == '்' && (VowelSigns.indexOf(at(2)) >= 0 || at(2) == '்'))
      return Some(w.dropRight(1))
    None
  }

  /** fix_endings: repeat fix_ending until no rule applies. */
  private def fixEndings(w0: String, vetrumai: Boolean): String = {
    var w = w0
    var cont = true
    while (cont) fixEnding(w, vetrumai) match {
      case Some(x) => w = x
      case None    => cont = false
    }
    w
  }

  /** fix_va_start: வ + rounded vowel sign at word start → independent vowel. */
  private def fixVaStart(w: String): String = {
    if (w.startsWith("வோ")) "ஓ" + w.substring(2)
    else if (w.startsWith("வொ")) "ஒ" + w.substring(2)
    else if (w.startsWith("வு")) "உ" + w.substring(2)
    else if (w.startsWith("வூ")) "ஊ" + w.substring(2)
    else w
  }

  def stem(word: String): String = {
    val out = stemRaw(word)
    if (out.isEmpty) word else out // a fully-stripped word is useless for indexing
  }

  private def stemRaw(word: String): String = {
    var w = word
    var vetrumai = false

    fixEnding(w, vetrumai).foreach(w = _)
    if (w.length <= 4) return w

    // remove_question_prefixes: [எ C ்] delete, then fix va-start
    if (w.length >= 3 && w.charAt(0) == 'எ' && Cons10.indexOf(w.charAt(1)) >= 0 &&
        w.charAt(2) == '்') {
      w = fixVaStart(w.substring(3))
    }

    // remove_pronoun_prefixes: [அ|இ|உ, C, ்] delete, then fix va-start
    if (w.length >= 3 && "அஇஉ".indexOf(w.charAt(0)) >= 0 &&
        Cons10.indexOf(w.charAt(1)) >= 0 && w.charAt(2) == '்') {
      w = fixVaStart(w.substring(3))
    }

    // remove_question_suffixes: [ே|ோ|ா] <- '்', then fix_endings
    if (w.length > 4) {
      val c = w.charAt(w.length - 1)
      if (c == 'ே' || c == 'ோ' || c == 'ா') w = w.dropRight(1) + "்"
      w = fixEndings(w, vetrumai)
    }

    // remove_um: ['ும்'] <- '்', then one fix_ending
    if (w.length > 4 && w.endsWith("ும்")) {
      w = w.dropRight(3) + "்"
      fixEnding(w, vetrumai).foreach(w = _)
    }

    // remove_common_word_endings
    if (w.length > 4) {
      @inline def e(s: String) = w.endsWith(s)
      val pulliSuf =
        if (e("ுடன்")) 4
        else if (e("ில்லை")) 5
        else if (e("ிடம்")) 4
        else if (e("ின்றி")) 5
        else if (e("ாகி")) 3
        else if (e("ாகிய")) 4
        else if (e("ென்று")) 5
        else if (e("ுள்ள")) 4
        else if (e("ுடைய")) 4
        else if (e("ுடை")) 3
        else if (e("ெனும்")) 5
        else if (e("ல்ல") && (w.length < 4 || VowelSigns.indexOf(w.charAt(w.length - 4)) < 0)) 3
        else if (e("ென")) 2
        else 0
      if (pulliSuf > 0) {
        w = fixEndings(w.dropRight(pulliSuf) + "்", vetrumai)
      } else {
        val del = Seq("கொண்டிர்", "படிதான", "பட்டது", "ெல்லாம்", "பட்டு",
            "விட்டு", "பட்டண", "குரிய", "பற்றி", "பட்ட", "படு", "விடு", "தான", "படி")
          .sortBy(-_.length).find(e)
        del.foreach { s => w = fixEndings(w.dropRight(s.length), vetrumai) }
      }
    }

    // remove_vetrumai_urupukal
    if (w.length > 4) {
      @inline def e(s: String) = w.endsWith(s)
      @inline def before(suf: String): Int = w.length - suf.length - 1
      var matched = true
      var out = w
      if (e("னை")) out = w.dropRight(2)
      else if (e("ினை") && Hard.indexOf(w.charAt(before("ினை"))) < 0) out = w.dropRight(3) + "்"
      else if (e("ை") && (before("ை") < 0 || Hard.indexOf(w.charAt(before("ை"))) < 0))
        out = w.dropRight(1) + "்"
      else if (e("ை") && before("ை") >= 1 && Hard.indexOf(w.charAt(before("ை"))) >= 0 &&
               w.charAt(before("ை") - 1) == '்') out = w.dropRight(1) + "்"
      else if (e("ொடு")) out = w.dropRight(3) + "்"
      else if (e("ோடு")) out = w.dropRight(3) + "்"
      else if (e("ில்")) out = w.dropRight(3) + "்"
      else if (e("ிற்")) out = w.dropRight(3) + "்"
      else if (e("ின்") && w.charAt(before("ின்")) != 'ம') out = w.dropRight(3) + "்"
      else if (e("ின்று")) out = w.dropRight(5) + "்"
      else if (e("ிருந்து")) out = w.dropRight(7) + "்"
      else if (e("விட")) out = w.dropRight(3) + "்"
      else if (w.length > 6 && e("ிடம்")) out = w.dropRight(4) + "்"
      else if (e("ால்")) out = w.dropRight(3) + "்"
      else if (e("ுடை")) out = w.dropRight(3) + "்"
      else if (e("ாமல்")) out = w.dropRight(4) + "்"
      else if (e("ல்") && (before("ல்") < 0 || VowelSigns.indexOf(w.charAt(before("ல்"))) < 0))
        out = w.dropRight(2) + "்"
      else if (e("ுள்")) out = w.dropRight(3) + "்"
      else if (e("கண்")) out = w.dropRight(3)
      else if (e("முன்")) out = w.dropRight(4)
      else if (e("மேல்")) out = w.dropRight(4)
      else if (e("மேற்")) out = w.dropRight(4)
      else if (e("கீழ்")) out = w.dropRight(4)
      else if (e("பின்")) out = w.dropRight(4)
      else if (e("து") && (before("து") < 0 || VowelSigns.indexOf(w.charAt(before("து"))) < 0))
        out = w.dropRight(2)
      else if (e("ீ")) out = w.dropRight(1) + "ி"
      else matched = false
      if (matched) {
        vetrumai = true
        if (out.endsWith("ின்")) out = out.dropRight(3) + "்"
        w = fixEndings(out, vetrumai)
      }
    }

    // remove_plural_suffix (no length gate in the published algorithm)
    {
      @inline def e(s: String) = w.endsWith(s)
      if (e("ுங்கள்") && {
            val i = w.length - 7
            i < 0 || Hard.indexOf(w.charAt(i)) < 0
          }) w = w.dropRight(6) + "்"
      else if (e("ற்கள்")) w = w.dropRight(5) + "ல்"
      else if (e("ட்கள்")) w = w.dropRight(5) + "ள்"
      else if (e("கள்")) w = w.dropRight(3)
    }

    // remove_command_suffixes: [பி|வி] delete
    if (w.length > 4 && (w.endsWith("பி") || w.endsWith("வி"))) w = w.dropRight(2)

    // remove_tense_suffixes: loop while a tense suffix was removed
    var again = true
    while (again) {
      again = false
      if (w.length > 4) {
        // tense suffix chain 1 (first match wins)
        val n = w.length
        @inline def e(s: String) = w.endsWith(s)
        @inline def prev(suf: String): Int = n - suf.length - 1
        var hit = true
        if (e("கொண்டிர்")) w = w.dropRight(8)
        else if (e("படு")) w = w.dropRight(3)
        else if (e("மார்") || e("மின்")) w = w.dropRight(4)
        else if (e("னன்")) w = w.dropRight(3)
        else if (e("னான்") || e("னாள்") || e("னார்")) w = w.dropRight(4)
        else if (e("வன்") && (prev("வன்") < 0 || IndepVowels.indexOf(w.charAt(prev("வன்"))) < 0))
          w = w.dropRight(3)
        else if (e("னள்") || e("வள்") || e("னர்") || e("வர்")) w = w.dropRight(3)
        else if (e("ன") || e("ப") || e("க") || e("த") || e("ய")) w = w.dropRight(1)
        else if (e("பன்") || e("பள்") || e("பர்")) w = w.dropRight(3)
        else if (e("து") && (prev("து") < 0 || VowelSigns.indexOf(w.charAt(prev("து"))) < 0))
          w = w.dropRight(2)
        else if (e("ிற்று")) w = w.dropRight(5)
        else if (e("பம்") || e("னம்")) w = w.dropRight(3)
        else if (e("தும்") || e("றும்") || e("கும்")) w = w.dropRight(4)
        else if (e("னென்")) w = w.dropRight(4)
        else if (e("னை") || e("வை")) w = w.dropRight(2)
        else if (e("ான்") && (prev("ான்") < 0 || w.charAt(prev("ான்")) != 'ச'))
          w = w.dropRight(3) + "்"
        else if (e("ாள்") || e("ார்") || e("ேன்")) w = w.dropRight(3) + "்"
        else if (e("ா")) w = w.dropRight(1) + "்"
        else if (e("ாம்") || e("ெம்") || e("ேம்") || e("ோம்")) w = w.dropRight(3) + "்"
        else if (e("டும்")) w = w.dropRight(4) + "்"
        else if (e("ாய்")) w = w.dropRight(3) + "்"
        else if (e("னிர்") || e("ீயர்")) w = w.dropRight(4) + "்"
        else if (e("ீர்")) w = w.dropRight(3) + "்"
        else if (e("கு") && prev("கு") >= 0 && w.charAt(prev("கு")) == '்') w = w.dropRight(2)
        else if (e("து") && prev("து") >= 0 && w.charAt(prev("து")) == '்') w = w.dropRight(2)
        else hit = false
        // tense suffix chain 2 (runs after chain 1 on the updated word)
        val t2 = Seq("ாநின்ற்", "கின்ற்", "ாநின்ற", "கின்ற", "கிற்", "கிற").find(w.endsWith)
        t2.foreach { s => w = w.dropRight(s.length); hit = true }
        w = fixEndings(w, vetrumai)
        again = hit
      }
    }
    w
  }
}
