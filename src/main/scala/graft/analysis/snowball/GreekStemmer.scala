package graft.analysis.snowball

import Snow._

/** Snowball Greek stemmer (published algorithm, snowballstem.org — Ntais's
  * Greek stemmer with the Saroukos extensions, the same family the
  * reference exposes via `Language::Greek`,
  * `/root/reference/src/tokenizer/stemmer.rs:12-30`).
  *
  * Lowercases, strips accents and maps final ς→σ; words shorter than 3
  * letters are returned after that normalization only. A `test1` flag
  * gates the final ending-removal step: any of the main suffix rules
  * (step 1, 2d, 3, 4, 5a–5m) that fires clears it. Exception lists are
  * checked either as whole-word matches ("exact") or suffix matches
  * ("ends"), per rule, as in the published sources.
  */
object GreekStemmer {
  private val V = "αεηιουω"
  private val V2 = "αεηιοω"

  private def endsAny(w: String, sufs: Array[String]): Boolean =
    longestSuffix(w, sufs) >= 0
  private def exactAny(w: String, words: Array[String]): Boolean =
    words.contains(w)

  /** Remove the longest of `sufs` if one matches; returns null otherwise. */
  private def dropLongest(w: String, sufs: Array[String]): String = {
    val i = longestSuffix(w, sufs)
    if (i < 0) null else w.substring(0, w.length - sufs(i).length)
  }

  private val Step1 = Array(
    "φαγια", "φαγιου", "φαγιων", "σκαγια", "σκαγιου", "σκαγιων",
    "ολογιου", "ολογια", "ολογιων", "σογιου", "σογια", "σογιων",
    "τατογια", "τατογιου", "τατογιων", "κρεασ", "κρεατοσ", "κρεατα",
    "κρεατων", "περασ", "περατοσ", "περατη", "περατα", "περατων",
    "τερασ", "τερατοσ", "τερατα", "τερατων", "φωσ", "φωτοσ", "φωτα",
    "φωτων", "καθεστωσ", "καθεστωτοσ", "καθεστωτα", "καθεστωτων",
    "γεγονοσ", "γεγονοτοσ", "γεγονοτα", "γεγονοτων")
  private val Step1Repl = Array(
    "φα", "φα", "φα", "σκα", "σκα", "σκα",
    "ολο", "ολο", "ολο", "σο", "σο", "σο",
    "τατο", "τατο", "τατο", "κρε", "κρε", "κρε",
    "κρε", "περ", "περ", "περ", "περ", "περ",
    "τερ", "τερ", "τερ", "τερ", "φω", "φω", "φω",
    "φω", "καθεστ", "καθεστ", "καθεστ", "καθεστ",
    "γεγον", "γεγον", "γεγον", "γεγον")

  // Saroukos extension steps s1–s10 (run between step 1 and step 2a).
  private val S1Suf = Array(
    "ιζα", "ιζεσ", "ιζε", "ιζαμε", "ιζατε", "ιζαν", "ιζανε", "ιζω",
    "ιζεισ", "ιζει", "ιζουμε", "ιζετε", "ιζουν", "ιζουνε")
  private val S1PlusI = Array(
    "πα", "ξαναπα", "επα", "περιπα", "αναμπα", "εμπα", "δανε", "αθρο", "συναθρο")
  private val S1PlusIz = Array(
    "π", "ιμπ", "ρ", "πρ", "μπρ", "αρρ", "γλυκυρ", "πολυρ", "αμπαρ",
    "μαρ", "γκρ", "πιπερορ", "βολβορ", "γλυκορ", "λου", "β", "βαθυρι",
    "βαρκ", "μαρκ", "λ", "μ", "κορν")

  private val S2Suf = Array(
    "ωθηκα", "ωθηκεσ", "ωθηκε", "ωθηκαμε", "ωθηκατε", "ωθηκαν", "ωθηκανε")
  private val S2Plus = Array("αλ", "βι", "εν", "υψ", "λι", "ζω", "σ", "χ")

  private val S3Suf = Array("ισα", "ισεσ", "ισε", "ισαμε", "ισατε", "ισαν", "ισανε")
  private val S34PlusI = Array(
    "ξαναπα", "επα", "περιπα", "αναμπα", "εμπα", "χαρτοπα", "εξαρχα",
    "πε", "επε", "μετεπε", "εσε", "κλε", "εσωκλε", "εκλε", "απεκλε",
    "αποκλε", "δανε", "αθρο", "συναθρο")
  private val S3PlusIs = Array(
    "π", "λαρ", "δημοκρατ", "αφ", "γιγαντοαφ", "γε", "γκε", "γκ", "μ",
    "πουκαμ", "κομ", "αν", "ολο")

  private val S4Suf = Array("ισω", "ισεισ", "ισει", "ισουμε", "ισετε", "ισουν", "ισουνε")

  private val S5Suf = Array(
    "ιστοσ", "ιστουσ", "ιστου", "ιστα", "ιστεσ", "ιστε", "ιστη", "ιστησ",
    "ιστοι", "ιστων", "ιστο")
  private val S5PlusI = Array("σε", "ασε", "πλε", "κλε", "εσωκλε", "δανε", "συναθρο")
  private val S5PlusIst = Array(
    "εχθ", "καθ", "σκ", "κακ", "μακ", "κυλ", "φιλ", "μ", "γεμ", "αχν",
    "π", "ευπ", "απ", "εμπ", "γυρ", "χρ", "χωρ", "αρ", "αορ", "χτ",
    "αχτ", "κτ", "ακτ", "σχ", "ασχ", "ταχ", "υψ", "ατα", "φα", "ηφα",
    "λυγ", "μεγ", "ηδ")

  private val S6Suf = Array("ισμοσ", "ισμουσ", "ισμου", "ισμοι", "ισμων", "ισμο")
  private val S6PlusIsm = Array("σε", "μετασε", "μικροσε", "εγκλε", "αποκλε")
  private val S6PlusI = Array("δανε", "αντιδανε")
  private val S6DropIkTails = Array(
    "αγνωστικ", "ατομικ", "γνωστικ", "εθνικ", "εκλεκτικ", "σκεπτικ",
    "τοπικ", "αλεξανδριν", "βυζαντιν", "θεατριν")

  private val S7Suf = Array("αρακι", "αρακια", "ουδακι", "ουδακια")
  private val S7Plus = Array("σ", "χ")

  private val S8Suf = Array("ακι", "ακια", "ιτσα", "ιτσασ", "ιτσεσ", "ιτσων", "αρακι", "αρακια")
  private val S8PlusAk = Array(
    "κατραπ", "ρ", "βρ", "λαβρ", "αμβρ", "μερ", "ανθρ", "κορ", "σ",
    "ναγκασ", "μουστ", "ρυ", "φ", "σφ", "αλισφ", "χ", "βαμβ", "σλοβ",
    "τσεχοσλοβ", "τζ", "κ", "σκ", "καπακ", "σοκ", "πλ", "φυλ", "λουλ",
    "μαλ", "φαρμ", "καιμ", "κλιμ", "σπαν", "κον")
  private val S8PlusIts = Array(
    "π", "πατερ", "τοσ", "νυφ", "β", "καρδ", "ζ", "βαλ", "γλ", "τριπολ",
    "μακρυν", "γιαν", "ηγουμεν")

  private val S9Suf = Array("ιδιο", "ιδια", "ιδιων")
  private val S9Ends = Array("ε", "παιχν", "ιρ", "ψαλ", "αιφν", "ολο")

  private val S10Suf = Array("ισκοσ", "ισκου", "ισκο", "ισκε")
  private val S10Plus = Array("ρ", "ιβ", "δ", "λυκ", "φραγκ", "οβελ", "μην")

  private val Ex2a = Array(
    "οκ", "μαμ", "μαν", "μπαμπ", "πατερ", "γιαγι", "νταντ", "κυρ", "θει", "πεθερ")
  private val Ex2b = Array("οπ", "ιπ", "εμπ", "υπ", "γηπ", "δαπ", "κρασπ", "μιλ")
  private val Ex2c = Array(
    "αρκ", "καλιακ", "πεταλ", "λιχ", "πλεξ", "σκ", "σ", "φλ", "φρ", "βελ",
    "λουλ", "χν", "σπ", "τραγ", "φε")
  private val Ex2d = Array("θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ")

  private val Ex4 = Array(
    "αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ", "αντιδ", "φυσ",
    "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ", "μουλ", "μπαν",
    "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ", "συνομηλ", "πετσ", "πιτσ",
    "πικαντ", "πλιατσ", "ποστελν", "πρωτοδ", "σερτ", "συναδ", "τσαμ",
    "υποδ", "φιλον", "φυλοδ", "χασ")

  private val Ex5a = Array(
    "αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ", "ουλ", "πεθ", "πικρ",
    "ποτ", "σιχ", "χ")

  private val Suf5b1 = Array(
    "ουσανε", "ησανε", "ουντανε", "ιουντανε", "οντανε", "ιοντανε",
    "οτανε", "ιοτανε", "αγανε", "ηκανε", "ηθηκανε")
  private val Ex5b1 = Array("τρ", "τσ")
  private val Ex5b2 = Array(
    "βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ", "καλπουζ", "καστελ",
    "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ", "ν", "ουλ", "π",
    "πελεκ", "πλ", "πολισ", "πορτολ", "σαρακατσ", "σουλτ", "τσαρλατ",
    "ορφ", "τσιγγ", "τσοπ", "φωτοστεφ", "χ", "ψυχοπλ", "αγ", "γαλ",
    "γερ", "δεκ", "διπλ", "αμερικαν", "ουρ", "πιθ", "πουριτ", "σ",
    "ζωντ", "ικ", "καστ", "κοπ", "λιχ", "λουθηρ", "μαιντ", "μελ", "σιγ",
    "σπ", "στεγ", "τραγ", "τσαγ", "φ", "ερ", "αδαπ", "αθιγγ", "αμηχ",
    "ανικ", "ανοργ", "απηγ", "απιθ", "ατσιγγ", "βασ", "βασκ", "βαθυγαλ",
    "βιομηχ", "βραχυκ", "διατ", "διαφ", "ενοργ", "θυσ", "καπνοβιομηχ",
    "καταγαλ", "κλιβ", "κοιλαρφ", "λιβ", "μεγλοβιομηχ", "μικροβιομηχ",
    "νταβ", "ξηροκλιβ", "ολιγοδαμ", "ολογαλ", "πενταρφ", "περηφ",
    "περιτρ", "πλατ", "πολυδαπ", "πολυμηχ", "στεφ", "ταβ", "τετ",
    "υπερηφ", "υποκοπ", "χαμηλοδαπ", "ψηλοταβ")

  private val Ends5c = Array(
    "οδ", "αιρ", "φορ", "ταθ", "διαθ", "σχ", "ενδ", "ευρ", "τιθ",
    "υπερθ", "ραθ", "ενθ", "ροθ", "σθ", "πυρ", "αιν", "συνδ", "συν",
    "συνθ", "χωρ", "πον", "βρ", "καθ", "ευθ", "εκθ", "νετ", "ρον",
    "αρκ", "βαρ", "βολ", "ωφελ")
  private val Ex5c = Array(
    "αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν", "απλ", "βαρον",
    "ντρ", "σκ", "κοπ", "μπορ", "νιφ", "παγ", "παρακαλ", "σερπ",
    "σκελ", "συρφ", "τοκ", "υ", "δ", "εμ", "θαρρ", "θ")

  private val Ex5f1 = Array("π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ")
  private val Ex5f2 = Array("αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ", "προ", "νισ")

  private val Ends5g = Array("σκωλ", "σκουλ", "ναρθ", "σφ", "οθ", "πιθ")
  private val Ex5g = Array("διαθ", "θ", "παρακαταθ", "προσθ", "συνθ")

  private val Ex5h = Array(
    "φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ", "λαμπιδ", "λεχ",
    "μ", "πατ", "ρ", "λ", "μεδ", "μεσαζ", "υποτειν", "αμ", "αιθ",
    "ανηκ", "δεσποζ", "ενδιαφερ", "δε", "δευτερευ", "καθαρευ", "πλε", "τσα")
  private val Ends5h = Array(
    "ποδαρ", "βλεπ", "πανταχ", "φρυδ", "μαντιλ", "μαλλ", "ομ", "προτ",
    "κυματ", "λαχ", "ληγ", "φαγ", "πρωτ")

  // 5i exact-word list; the two negative entries block the re-append.
  private val Ex5i = Array(
    "π", "ασπ", "ανυπ", "αρτιπ", "αειπ", "συμπ", "προσωποπ", "σιδηροπ",
    "δροσοπ", "νεοπ", "κροκαλοπ", "ολοπ", "ρ", "τρ", "ουρ", "ασπαρ",
    "χαρ", "αχαρ", "απερ", "τ", "ανυστ", "αβαστ", "προστ", "αιμοστ",
    "διατ", "επιτ", "συντ", "υποτ", "αποτ", "ομοτ", "νομοτ", "ναυ",
    "πολυφ", "αφ", "ξεφ", "αδηφ", "παμφ", "αμαλλι", "λ", "αμαλ", "μ",
    "ουλαμ", "εν", "δερβεν", "ρπ", "πρ", "φρ", "χορτ", "σφ", "οφ",
    "λοχ", "πελ", "λλ", "σμην")
  private val Ex5iNeg = Array("ψοφ", "ναυλοχ")

  private val Ex5j = Array("ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον", "επταν")
  private val Ex5k = Array(
    "ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ", "ευχρ",
    "κοινοχρ", "παλιμψ")
  private val Ex5l = Array("ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων")
  private val Ex5m = Array("παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ", "ασουσ")

  private val Step6Suf = Array(
    "υσ", "ουσ", "ασ", "εσ", "ησεσ", "ηδεσ", "ησ", "εισ", "ηθεισ",
    "οσ", "υ", "ου", "ω", "ησω", "αω", "ηθω", "α", "ιουμα", "οσουνα",
    "ιοσουνα", "ομουνα", "ιομουνα", "ε", "ιεσαστε", "οσαστε", "ιοσαστε",
    "ουμαστε", "ιουμαστε", "ιεμαστε", "ουσατε", "ησατε", "αγατε",
    "ηκατε", "ηθηκατε", "ειτε", "ηθειτε", "η", "ι", "ασαι", "εσαι",
    "ιεσαι", "αται", "εται", "ιεται", "ουνται", "ιουνται", "ονται",
    "ουμαι", "αμαι", "ιεμαι", "ομαι", "ει", "ησει", "αει", "ηθει",
    "οι", "ουν", "ησουν", "οσουν", "ιοσουν", "ηθουν", "ομουν",
    "ιομουν", "ων", "ηδων", "αν", "ουσαν", "οντουσαν", "ιοντουσαν",
    "ησαν", "οσασταν", "ιοσασταν", "ομασταν", "ιομασταν", "ουνταν",
    "ιουνταν", "ονταν", "ιονταν", "οταν", "ιοταν", "αγαν", "ηκαν",
    "ηθηκαν", "ο")
  private val Step7 = Array(
    "εστερ", "εστατ", "οτερ", "οτατ", "υτερ", "υτατ", "ωτερ", "ωτατ")

  private def toLower(word: String): String = {
    val sb = new java.lang.StringBuilder(word.length)
    var i = 0
    while (i < word.length) {
      val c = Character.toLowerCase(word.charAt(i))
      sb.append(c match {
        case 'ά' => 'α'; case 'έ' => 'ε'; case 'ή' => 'η'; case 'ί' => 'ι'
        case 'ό' => 'ο'; case 'ύ' => 'υ'; case 'ώ' => 'ω'; case 'ς' => 'σ'
        case 'ϊ' => 'η'; case 'ϋ' => 'υ'; case 'ΐ' => 'η'; case 'ΰ' => 'υ'
        case x => x
      })
      i += 1
    }
    sb.toString
  }

  def stem(word: String): String = {
    var w = toLower(word)
    if (w.length < 3) return w
    var test1 = true
    @inline def endsV(s: String) = s.nonEmpty && V.indexOf(s.charAt(s.length - 1)) >= 0
    @inline def endsV2(s: String) = s.nonEmpty && V2.indexOf(s.charAt(s.length - 1)) >= 0

    // step 1: irregular noun families
    val s1 = longestSuffix(w, Step1)
    if (s1 >= 0) {
      w = w.substring(0, w.length - Step1(s1).length) + Step1Repl(s1)
      test1 = false
    }

    // s1: -ιζω verbs
    var t = dropLongest(w, S1Suf)
    if (t != null) {
      test1 = false
      w = if (exactAny(t, S1PlusI)) t + "ι"
          else if (exactAny(t, S1PlusIz)) t + "ιζ"
          else t
    }
    // s2: -ωθηκα
    t = dropLongest(w, S2Suf)
    if (t != null) {
      test1 = false
      w = if (exactAny(t, S2Plus)) t + "ων" else t
    }
    // s3: -ισα
    t = dropLongest(w, S3Suf)
    if (t != null) {
      test1 = false
      w = if (exactAny(t, S34PlusI)) t + "ι"
          else if (exactAny(t, S3PlusIs)) t + "ισ"
          else t
    }
    // s4: -ισω
    t = dropLongest(w, S4Suf)
    if (t != null) {
      test1 = false
      w = if (exactAny(t, S34PlusI)) t + "ι" else t
    }
    // s5: -ιστος
    t = dropLongest(w, S5Suf)
    if (t != null) {
      test1 = false
      w = if (exactAny(t, S5PlusI)) t + "ι"
          else if (exactAny(t, S5PlusIst)) t + "ιστ"
          else t
    }
    // s6: -ισμος
    t = dropLongest(w, S6Suf)
    if (t != null) {
      test1 = false
      w = if (exactAny(t, S6PlusIsm)) t + "ισμ"
          else if (exactAny(t, S6PlusI)) t + "ι"
          else {
            val d = longestSuffix(t, S6DropIkTails)
            if (d >= 0) t.substring(0, t.length - 2) else t
          }
    }
    // s7: -αρακι
    t = dropLongest(w, S7Suf)
    if (t != null) {
      test1 = false
      w = if (exactAny(t, S7Plus)) t + "αρακ" else t
    }
    // s8: -ακι / -ιτσα. Whole-stem match picks the re-append; otherwise a
    // stem merely ending in 'κορ' still re-appends ιτσ.
    t = dropLongest(w, S8Suf)
    if (t != null) {
      test1 = false
      w = if (exactAny(t, S8PlusAk)) t + "ακ"
          else if (exactAny(t, S8PlusIts)) t + "ιτσ"
          else if (t.endsWith("κορ")) t + "ιτσ"
          else t
    }
    // s9: -ιδιο (suffix-of-stem condition)
    t = dropLongest(w, S9Suf)
    if (t != null) {
      test1 = false
      w = if (endsAny(t, S9Ends)) t + "ιδ" else t
    }
    // s10: -ισκος
    t = dropLongest(w, S10Suf)
    if (t != null) {
      test1 = false
      w = if (exactAny(t, S10Plus)) t + "ισκ" else t
    }

    // step 2a-2d
    t = dropLongest(w, Array("αδεσ", "αδων"))
    if (t != null) { w = if (!endsAny(t, Ex2a)) t + "αδ" else t }
    t = dropLongest(w, Array("εδεσ", "εδων"))
    if (t != null) { w = if (endsAny(t, Ex2b)) t + "εδ" else t }
    t = dropLongest(w, Array("ουδεσ", "ουδων"))
    if (t != null) { w = if (endsAny(t, Ex2c)) t + "ουδ" else t }
    t = dropLongest(w, Array("εωσ", "εων"))
    if (t != null) { test1 = false; w = if (exactAny(t, Ex2d)) t + "ε" else t }

    // step 3: ια/ιου/ιων
    t = dropLongest(w, Array("ια", "ιου", "ιων"))
    if (t != null) { test1 = false; w = if (endsV(t)) t + "ι" else t }

    // step 4: ικα/ικο/ικου/ικων
    t = dropLongest(w, Array("ικα", "ικο", "ικου", "ικων"))
    if (t != null) {
      test1 = false
      w = if (t.nonEmpty && V.indexOf(t.last) >= 0 &&
              exactAny(t.substring(0, t.length - 1), Ex4))
            t.substring(0, t.length - 1) + "ικικ"
          else if (endsV(t) || exactAny(t, Ex4)) t + "ικ"
          else t
    }

    // step 5a
    if (w == "αγαμε") w = "αγαμ"
    t = dropLongest(w, Array("αγαμε", "ησαμε", "ουσαμε", "ηκαμε", "ηθηκαμε"))
    if (t != null) { w = t; test1 = false }
    if (w.endsWith("αμε")) {
      test1 = false
      val b = w.substring(0, w.length - 3)
      w = if (exactAny(b, Ex5a)) b + "αμ" else b
    }

    // step 5b
    t = dropLongest(w, Suf5b1)
    if (t != null) {
      test1 = false
      w = if (exactAny(t, Ex5b1)) t + "αγαν" else t
    }
    if (w.endsWith("ανε")) {
      test1 = false
      val b = w.substring(0, w.length - 3)
      w = if (b.nonEmpty && V2.indexOf(b.last) >= 0 &&
              exactAny(b.substring(0, b.length - 1), Ex5b2))
            b.substring(0, b.length - 1) + "αναν"
          else if (endsV2(b) || exactAny(b, Ex5b2)) b + "αν"
          else b
    }

    // step 5c
    if (w.endsWith("ησετε")) { w = w.substring(0, w.length - 5); test1 = false }
    if (w.endsWith("ετε")) {
      test1 = false
      val b = w.substring(0, w.length - 3)
      w = if (b.nonEmpty && V2.indexOf(b.last) >= 0 &&
              exactAny(b.substring(0, b.length - 1), Ex5c))
            b.substring(0, b.length - 1) + "ετετ"
          else if (endsV2(b) || endsAny(b, Ends5c) || exactAny(b, Ex5c)) b + "ετ"
          else b
    }

    // step 5d: οντασ/ωντασ
    t = dropLongest(w, Array("οντασ", "ωντασ"))
    if (t != null) {
      test1 = false
      w = if (t == "αρχ") t + "οντ" else if (t.endsWith("κρε")) t + "ωντ" else t
    }

    // step 5e: ομαστε/ιομαστε
    t = dropLongest(w, Array("ομαστε", "ιομαστε"))
    if (t != null) {
      test1 = false
      w = if (t == "ον") t + "ομαστ" else t
    }

    // step 5f
    if (w.endsWith("ιεστε")) {
      test1 = false
      val b = w.substring(0, w.length - 5)
      w = if (exactAny(b, Ex5f1)) b + "ιεστ" else b
    }
    if (w.endsWith("εστε")) {
      test1 = false
      val b = w.substring(0, w.length - 4)
      w = if (exactAny(b, Ex5f2)) b + "ιεστ" else b
    }

    // step 5g
    t = dropLongest(w, Array("ηθηκα", "ηθηκεσ", "ηθηκε"))
    if (t != null) { w = t; test1 = false }
    t = dropLongest(w, Array("ηκα", "ηκεσ", "ηκε"))
    if (t != null) {
      test1 = false
      w = if (endsAny(t, Ends5g) || exactAny(t, Ex5g)) t + "ηκ" else t
    }

    // step 5h
    t = dropLongest(w, Array("ουσα", "ουσεσ", "ουσε"))
    if (t != null) {
      test1 = false
      w = if (exactAny(t, Ex5h) || endsAny(t, Ends5h)) t + "ουσ" else t
    }

    // step 5i
    t = dropLongest(w, Array("αγα", "αγεσ", "αγε"))
    if (t != null) {
      test1 = false
      w = if (exactAny(t, Ex5iNeg)) t
          else if (exactAny(t, Ex5i)) t + "αγ"
          else t
    }

    // step 5j
    t = dropLongest(w, Array("ησε", "ησου", "ησα"))
    if (t != null) {
      test1 = false
      w = if (exactAny(t, Ex5j)) t + "ησ" else t
    }

    // step 5k
    if (w.endsWith("ηστε")) {
      test1 = false
      val b = w.substring(0, w.length - 4)
      w = if (exactAny(b, Ex5k)) b + "ηστ" else b
    }

    // step 5l
    t = dropLongest(w, Array("ουνε", "ησουνε", "ηθουνε"))
    if (t != null) {
      test1 = false
      w = if (exactAny(t, Ex5l)) t + "ουν" else t
    }

    // step 5m
    t = dropLongest(w, Array("ουμε", "ησουμε", "ηθουμε"))
    if (t != null) {
      test1 = false
      w = if (exactAny(t, Ex5m)) t + "ουμ" else t
    }

    // step 6
    t = dropLongest(w, Array("ματα", "ματων", "ματοσ"))
    if (t != null) w = t + "μα"
    if (test1) {
      val s6 = longestSuffix(w, Step6Suf)
      if (s6 >= 0) w = w.substring(0, w.length - Step6Suf(s6).length)
    }

    // step 7: comparatives
    val s7 = longestSuffix(w, Step7)
    if (s7 >= 0) w = w.substring(0, w.length - Step7(s7).length)
    // tsearch wrapper behavior: a word stemmed to nothing falls back to
    // the original (un-normalized) token
    if (w.isEmpty) word else w
  }
}
