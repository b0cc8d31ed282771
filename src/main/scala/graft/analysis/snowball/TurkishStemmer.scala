package graft.analysis.snowball

/** Snowball Turkish stemmer — Evren (Kapusuz) Çilden's published algorithm,
  * Snowball 2.x; the last of the 18 stemmer languages the reference exposes
  * (`/root/reference/src/tokenizer/stemmer.rs:30`, `Language::Turkish`).
  *
  * Written from the published algorithm description, with the suffix
  * inventories and exact control flow recovered from PostgreSQL 15's
  * compiled `dict_snowball` build of the same published sources
  * (`tools/disasm_annot.py` / `tools/extract_among.py`) and gated against
  * the `stem/turkish.tsv` golden fixture.
  *
  * Shape (all backwards): if the word has at least two vowels, strip one
  * nominal-verb suffix chain (ymUş/yDU/ysA/yken, cAsInA+person+ymUş,
  * lAr(+DUr/yDU/ysA/ymUş — ends stemming), nUz+yDU/ysA, person+ymUş,
  * DUr+person+ymUş), then one noun possessive/case chain with the recursive
  * `-ki` sub-chain, then post-process: `ad`/`soyad` are reserved words; a
  * stem ending in d/g regains the harmony-matching high vowel; a final
  * b/c/d/ğ is devoiced to p/ç/t/k.
  *
  * A structural invariant recovered from the generated code keeps the two
  * top-level stages simple: their deletions always remove a suffix ending at
  * the live end of the string, so those deletes are truncations at the
  * cursor. Only the `-ki` chain needs the general `[bra, ket)` slice with
  * offset-from-end cursor restores — a chain entered through the no-delete
  * `(ndA or nA)` branch still has the undeleted case suffix to its right.
  */
object TurkishStemmer {
  private val Vowels = "aeıioöuü"
  private val HighVowels = "ıiuü" // grouping U

  /** Vowels that may precede each word-final vowel under vowel harmony
    * (groupings vowel1..vowel6 of the published source).
    */
  private def harmonyClass(v: Char): String = v match {
    case 'a' => "aıou"
    case 'e' => "eiöü"
    case 'ı' => "aı"
    case 'i' => "ei"
    case 'o' | 'u' => "ou"
    case 'ö' | 'ü' => "öü"
    case _ => ""
  }

  // among tables (recovered verbatim; longest suffix wins)
  private val YmUs = Array("mış", "miş", "muş", "müş")
  private val YDU = Array(
    "dı", "di", "du", "dü", "tı", "ti", "tu", "tü",
    "dık", "dik", "duk", "dük", "tık", "tik", "tuk", "tük",
    "dım", "dim", "dum", "düm", "tım", "tim", "tum", "tüm",
    "dın", "din", "dun", "dün", "tın", "tin", "tun", "tün")
  private val YsA = Array("sa", "se", "sak", "sek", "sam", "sem", "san", "sen")
  private val CAsInA = Array("casına", "cesine")
  private val SUnUz = Array("sınız", "siniz", "sunuz", "sünüz")
  private val LAr = Array("lar", "ler")
  private val YUm = Array("ım", "im", "um", "üm")
  private val SUn = Array("sın", "sin", "sun", "sün")
  private val YUz = Array("ız", "iz", "uz", "üz")
  private val NUz = Array("nız", "niz", "nuz", "nüz")
  private val DUr = Array("dır", "dir", "dur", "dür", "tır", "tir", "tur", "tür")
  private val NcA = Array("ca", "ce")
  private val LArI = Array("ları", "leri")
  private val Poss = Array("m", "n", "mız", "miz", "muz", "müz", "nız", "niz", "nuz", "nüz")
  private val NdA = Array("nda", "nde")
  private val NA = Array("na", "ne")
  private val NdAn = Array("ndan", "nden")
  private val NU = Array("nı", "ni", "nu", "nü")
  private val DAn = Array("dan", "den", "tan", "ten")
  private val NUn = Array("ın", "in", "un", "ün")
  private val YlA = Array("la", "le")
  private val DA = Array("da", "de", "ta", "te")
  private val YA = Array("a", "e")

  def stem(word: String): String = {
    // more_than_one_syllable_word: each vowel marks a syllable
    var vowels = 0
    var i = 0
    while (i < word.length) {
      if (Vowels.indexOf(word.charAt(i)) >= 0) vowels += 1
      i += 1
    }
    if (vowels < 2) return word
    val st = new State(word)
    if (st.stemNominalVerbSuffixes()) {
      st.stemNounSuffixes()
      st.postlude()
    }
    // A word that is itself a bare suffix stems to nothing; keep it whole
    // (the golden-fixture oracle's convention for an empty stemmer result,
    // hit only by Turkish since its suffix chains may consume everything).
    if (st.s.isEmpty) word else st.s
  }

  private final class State(var s: String) {
    /** Cursor: matching consumes leftward from here. */
    var c: Int = s.length

    @inline private def isVowel(ch: Char): Boolean = Vowels.indexOf(ch) >= 0
    @inline private def end(): Unit = c = s.length
    /** `] delete` — every delete in this algorithm truncates at the cursor. */
    @inline private def trunc(): Unit = { s = s.substring(0, c); end() }

    private def eqS(suf: String): Boolean =
      c >= suf.length && s.regionMatches(c - suf.length, suf, 0, suf.length) && {
        c -= suf.length; true
      }

    /** find_among_b: longest entry that is a suffix ending at the cursor. */
    private def among(entries: Array[String]): Boolean = {
      var best = -1
      var i = 0
      while (i < entries.length) {
        val e = entries(i)
        if (e.length > best && c >= e.length &&
            s.regionMatches(c - e.length, e, 0, e.length)) best = e.length
        i += 1
      }
      best >= 0 && { c -= best; true }
    }

    /** `test(goto vowel (v goto harmony(v)))` — cursor untouched. The second
      * goto skips any char (vowels included) not in the harmony class.
      */
    private def checkVowelHarmony(): Boolean = {
      var i = c - 1
      while (i >= 0 && !isVowel(s.charAt(i))) i -= 1
      if (i < 0) return false
      val compat = harmonyClass(s.charAt(i))
      var j = i - 1
      while (j >= 0 && compat.indexOf(s.charAt(j)) < 0) j -= 1
      j >= 0
    }

    /** `('x' test vowel) or ((not(test 'x')) test(next vowel))` — the buffer
      * consonant before a vowel-initial suffix; consumes x in branch one.
      */
    private def optCons(x: Char): Boolean =
      if (c >= 1 && s.charAt(c - 1) == x) {
        c >= 2 && isVowel(s.charAt(c - 2)) && { c -= 1; true }
      } else c >= 2 && isVowel(s.charAt(c - 2))

    /** `(U test non-vowel) or ((not(test U)) test(next non-vowel))`. */
    private def optUVowel(): Boolean =
      if (c >= 1 && HighVowels.indexOf(s.charAt(c - 1)) >= 0) {
        c >= 2 && !isVowel(s.charAt(c - 2)) && { c -= 1; true }
      } else c >= 2 && !isVowel(s.charAt(c - 2))

    // mark_* routines (cvh = harmony check on the not-yet-stripped word)
    private def markYmUs(): Boolean = checkVowelHarmony() && among(YmUs) && optCons('y')
    private def markYDU(): Boolean = checkVowelHarmony() && among(YDU) && optCons('y')
    private def markYsA(): Boolean = among(YsA) && optCons('y') // no harmony by design
    private def markYken(): Boolean = eqS("ken") && optCons('y')
    private def markCAsInA(): Boolean = among(CAsInA)
    private def markSUnUz(): Boolean = among(SUnUz)
    private def markLAr(): Boolean = checkVowelHarmony() && among(LAr)
    private def markYUm(): Boolean = checkVowelHarmony() && among(YUm) && optCons('y')
    private def markSUn(): Boolean = checkVowelHarmony() && among(SUn)
    private def markYUz(): Boolean = checkVowelHarmony() && among(YUz) && optCons('y')
    private def markNUz(): Boolean = checkVowelHarmony() && among(NUz)
    private def markDUr(): Boolean = checkVowelHarmony() && among(DUr)
    private def markNcA(): Boolean = checkVowelHarmony() && among(NcA) && optCons('n')
    private def markLArI(): Boolean = among(LArI)
    private def markPossessives(): Boolean = among(Poss) && optUVowel()
    private def markNdA(): Boolean = checkVowelHarmony() && among(NdA)
    private def markNA(): Boolean = checkVowelHarmony() && among(NA)
    private def markNdAn(): Boolean = checkVowelHarmony() && among(NdAn)
    private def markNU(): Boolean = checkVowelHarmony() && among(NU)
    private def markDAn(): Boolean = checkVowelHarmony() && among(DAn)
    private def markNUn(): Boolean = checkVowelHarmony() && among(NUn) && optCons('n')
    private def markYlA(): Boolean = checkVowelHarmony() && among(YlA) && optCons('y')
    private def markDA(): Boolean = checkVowelHarmony() && among(DA)
    private def markYU(): Boolean = checkVowelHarmony() &&
      (c >= 1 && HighVowels.indexOf(s.charAt(c - 1)) >= 0) && { c -= 1; true } && optCons('y')
    private def markYA(): Boolean = checkVowelHarmony() && among(YA) && optCons('y')
    private def markSU(): Boolean = checkVowelHarmony() &&
      (c >= 1 && HighVowels.indexOf(s.charAt(c - 1)) >= 0) && { c -= 1; true } && optCons('s')

    /** `slice_del` with an explicit right boundary: removes [c, ket); the
      * cursor stays put. `ket` can sit mid-string — a chain reached through
      * the no-delete `(ndA or nA)` noun branch still has the case suffix to
      * its right.
      */
    @inline private def del(ket: Int): Unit = { s = s.substring(0, c) + s.substring(ket) }

    /** `[mark_lAr] delete stem_suffix_chain_before_ki` inside a try: on any
      * failure the cursor is restored to its entry offset from the end.
      */
    private def tryLArChain(): Unit = {
      val off = c - s.length
      val ket = c
      if (markLAr()) {
        del(ket)
        if (chain()) return
      }
      c = s.length + off
    }

    /** stem_suffix_chain_before_ki: `[ 'ki' (DA | nUn | ndA branches) ]`.
      * A failed call never mutates the string (all deletes lie on success
      * paths), so callers may treat failure as a clean fall-through.
      */
    private def chain(): Boolean = {
      val ket0 = c
      eqS("ki") && chainBody(ket0)
    }

    /** Body after `ki` matched; `ket0` is where the pending delete ends. */
    private def chainBody(ket0: Int): Boolean = {
      val off0 = c - s.length
      if (markDA()) {
        del(ket0) // DA..ki
        val off1 = c - s.length
        val ket1 = c
        if (markLAr()) {
          del(ket1)
          val off2 = c - s.length
          if (!chain()) c = s.length + off2
        } else {
          c = s.length + off1
          if (markPossessives()) { del(ket1); tryLArChain() }
          else c = s.length + off1
        }
        true
      } else {
        c = s.length + off0
        if (markNUn()) {
          del(ket0) // nUn..ki
          val off1 = c - s.length
          val ket1 = c
          if (markLArI()) del(ket1)
          else {
            c = s.length + off1
            if (markPossessives()) { del(ket1); tryLArChain() }
            else {
              c = s.length + off1
              if (markSU()) { del(ket1); tryLArChain() }
              else {
                c = s.length + off1
                if (!chain()) c = s.length + off1
              }
            }
          }
          true
        } else {
          c = s.length + off0
          if (markNdA()) {
            val off1 = c - s.length
            if (markLArI()) { del(ket0); true } // lArI..ndA..ki in one slice
            else {
              c = s.length + off1
              if (markSU()) { del(ket0); tryLArChain(); true }
              else { c = s.length + off1; chain() }
            }
          } else false
        }
      }
    }

    /** Returns the continue_stemming_noun_suffixes flag (the lAr branch
      * unsets it and ends stemming before the noun stage and postlude).
      */
    def stemNominalVerbSuffixes(): Boolean = {
      end()
      // (ymUş or yDU or ysA or yken)
      if (markYmUs() || { end(); markYDU() } || { end(); markYsA() } ||
          { end(); markYken() }) { trunc(); return true }
      // cAsInA (sUnUz or lAr or yUm or sUn or yUz or true) ymUş
      end()
      if (markCAsInA()) {
        val p = c
        markSUnUz() || { c = p; markLAr() } || { c = p; markYUm() } ||
          { c = p; markSUn() } || { c = p; markYUz() } || { c = p; true }
        if (markYmUs()) { trunc(); return true }
      }
      // lAr ] delete try([(DUr or yDU or ysA or ymUş)]) unset flag ] delete
      end()
      if (markLAr()) {
        trunc()
        if (!(markDUr() || { end(); markYDU() } || { end(); markYsA() } ||
              { end(); markYmUs() })) end()
        trunc()
        return false
      }
      // nUz (yDU or ysA)
      end()
      if (markNUz()) {
        val p = c
        if (markYDU() || { c = p; markYsA() }) { trunc(); return true }
      }
      // (sUnUz or yUz or sUn or yUm) ] delete try([ ymUş ])
      end()
      if (markSUnUz() || { end(); markYUz() } || { end(); markSUn() } ||
          { end(); markYUm() }) {
        trunc()
        if (!markYmUs()) end()
        trunc()
        return true
      }
      // DUr ] delete try([ (sUnUz or lAr or yUm or sUn or yUz or true) ymUş ])
      end()
      if (markDUr()) {
        trunc()
        markSUnUz() || { end(); markLAr() } || { end(); markYUm() } ||
          { end(); markSUn() } || { end(); markYUz() } || { end(); true }
        if (!markYmUs()) end()
        trunc()
      }
      true
    }

    def stemNounSuffixes(): Unit = {
      // [mark_lAr] delete try(chain)
      end()
      if (markLAr()) { trunc(); chain(); return }
      // [mark_ncA] delete try(lArI | (poss|sU)+lAr+chain | lAr+chain)
      end()
      if (markNcA()) {
        trunc()
        if (markLArI()) { trunc(); return }
        end()
        if (markPossessives()) { trunc(); tryLArChain(); return }
        end()
        if (markSU()) { trunc(); tryLArChain(); return }
        end()
        if (markLAr()) { trunc(); chain(); () }
        return
      }
      // [(ndA or nA)] (lArI]del | sU]del try(lAr+chain) | chain) — failure falls through
      end()
      if (markNdA() || { end(); markNA() }) {
        val p = c
        if (markLArI()) { trunc(); return }
        c = p
        if (markSU()) { trunc(); tryLArChain(); return }
        c = p
        if (chain()) return
      }
      // [(ndAn or nU)] (sU]del try(lAr+chain) | lArI(no delete)) — failure falls through
      end()
      if (markNdAn() || { end(); markNU() }) {
        val p = c
        if (markSU()) { trunc(); tryLArChain(); return }
        c = p
        if (markLArI()) return // matched but not deleted, per the published source
      }
      // [mark_DAn] delete try(poss+lAr+chain | lAr+chain | chain)
      end()
      if (markDAn()) {
        trunc()
        if (markPossessives()) { trunc(); tryLArChain(); return }
        end()
        if (markLAr()) { trunc(); chain(); return }
        end()
        chain()
        return
      }
      // [(nUn or ylA)] delete try(lAr+chain(required) | (poss|sU)+lAr+chain | chain)
      end()
      if (markNUn() || { end(); markYlA() }) {
        trunc()
        if (markLAr()) {
          trunc()
          if (chain()) return
          end()
        } else end()
        if (markPossessives()) { trunc(); tryLArChain(); return }
        end()
        if (markSU()) { trunc(); tryLArChain(); return }
        end()
        chain()
        return
      }
      // [mark_lArI] delete
      end()
      if (markLArI()) { trunc(); return }
      // chain alone
      end()
      if (chain()) return
      // [(DA or yU or yA)] delete try((poss]del try(lAr]del) | lAr]del) chain)
      end()
      if (markDA() || { end(); markYU() } || { end(); markYA() }) {
        trunc()
        if (markPossessives()) {
          trunc()
          if (markLAr()) trunc() else end()
          chain()
          return
        }
        end()
        if (markLAr()) { trunc(); chain(); () }
        return
      }
      // [(poss or sU)] delete try(lAr+chain)
      end()
      if (markPossessives()) { trunc(); tryLArChain(); return }
      end()
      if (markSU()) { trunc(); tryLArChain() }
    }

    def postlude(): Unit = {
      // is_reserved_word: 'ad' try 'soy' atlimit — leave reserved words be
      end()
      if (eqS("ad")) {
        val p = c
        if (!eqS("soy")) c = p
        if (c == 0) return
      }
      // append_U_to_stems_ending_with_d_or_g: regain the dropped high vowel
      val n = s.length
      if (n >= 1 && (s.charAt(n - 1) == 'd' || s.charAt(n - 1) == 'g')) {
        var i = n - 1
        while (i >= 0 && !isVowel(s.charAt(i))) i -= 1
        if (i >= 0) s.charAt(i) match {
          case 'a' | 'ı' => s += "ı"
          case 'e' | 'i' => s += "i"
          case 'o' | 'u' => s += "u"
          case 'ö' | 'ü' => s += "ü"
          case _ => ()
        }
      }
      // post_process_last_consonants: devoice a final b/c/d/ğ
      if (s.nonEmpty) {
        val repl = s.charAt(s.length - 1) match {
          case 'b' => "p"
          case 'c' => "ç"
          case 'd' => "t"
          case 'ğ' => "k"
          case _ => null
        }
        if (repl != null) s = s.substring(0, s.length - 1) + repl
      }
    }
  }
}
