package graft.search

import graft.analysis.Analyzer

/** Hand-rolled recursive-descent parser for the reference's query syntax
  * subset (grammar: `/root/reference/query-grammar/src/user_input_ast.rs:11-30`,
  * field/occur resolution `src/query/query_parser/query_parser.rs:207-634`):
  *
  *   - `term`, `+term`, `-term`, `a AND b`, `a OR b`, parens
  *   - `field:term`
  *   - `"a phrase"` / `'a phrase'` (escaped quotes ok), `"a phrase"~slop`,
  *     `"a phrase pre"*` (phrase prefix)
  *   - `term*` (prefix), `term~d` (fuzzy, d in 1..2)
  *   - `field:[a TO b]` / `{a TO b}` (inclusive/exclusive term ranges),
  *     `field:>a` / `>=a` / `<a` / `<=a` comparison shorthands;
  *     RFC3339 bounds/literals on configured date fields -> typed ranges
  *   - `NOT a` (== `-a`); pure-negative AND/OR legs splice into the parent
  *   - `field:IN [a b c]` (term set)
  *   - `/regex/`
  *   - `^boost`, per-field boosts (`fieldBoosts`), per-field fuzzy
  *     (`fuzzyFields`)
  *   - `*` (AllQuery); `field:*` (ExistsQuery — any value in the field,
  *     query_grammar.rs:319-362; json subpaths supported)
  *
  * Literals on analyzed fields run through the index's named analyzer chain
  * (`analyzer` ctor arg; read it from `manifest.textAnalyzer`);
  * a literal that tokenizes to several terms becomes a phrase query
  * (query_parser.rs:535-620). Occur default is Should unless
  * `conjunctionByDefault` (query_parser.rs:630-634). All-negative queries
  * are rejected (query_parser.rs:227-236).
  *
  * Known divergences (both deliberate):
  *  - MIXED implicit/explicit operator runs: the reference binds a binary
  *    op only to its two adjacent operands (`a AND b aaa` ==
  *    `(?(+a +b) *aaa)`, query_grammar.rs:1269); here AND/OR take whole
  *    whitespace clause groups as operands — classic precedence. Unmixed
  *    forms agree exactly.
  *  - Negative legs of binary ops: the reference parses `NOT b` / `-b`
  *    after OR (and NOT after AND) into a NESTED pure-negative clause
  *    (`(+a +(-b))`, query_grammar.rs:1282) which its own boolean weight
  *    evaluates to an EmptyScorer — `a AND NOT b` matches NOTHING there
  *    (boolean_weight.rs:306-318 with no include scorers). Here such legs
  *    flatten into the parent (`+a -b`), the semantics every `-` form of
  *    the reference produces (`a AND -b` == `(+a -b)`, :1280) and the one
  *    users mean.
  */
final class QueryParser(
    defaultField: String,
    rawFields: Set[String] = Set("url", "lang"),
    conjunctionByDefault: Boolean = false,
    /** JSON dynamic fields: `jsonfield.path.to.leaf:value` addresses a
      * path-prefixed term (query_parser.rs `split_full_path` resolution);
      * numeric literals match both their string-token and typed-number
      * representations, and `[a TO b]` ranges on numeric paths use the
      * order-preserving typed encoding.
      */
    jsonFields: Set[String] = Set.empty,
    /** `set_field_boost` (query_parser.rs:272-280): queries addressing the
      * field are wrapped in a Boost.
      */
    fieldBoosts: Map[String, Float] = Map.empty,
    /** `set_field_fuzzy` (query_parser.rs:282-304): plain literals on these
      * fields compile to fuzzy term queries.
      */
    fuzzyFields: Map[String, QueryParser.FuzzyConfig] = Map.empty,
    /** Typed date fields (indexed through `IndexConfig.longFields` as
      * microsecond terms): RFC3339 literals and range bounds compile to
      * typed ranges (query_parser.rs "date values").
      */
    dateFields: Set[String] = Set.empty,
    /** Named analyzer for text literals — MUST match the index's
      * `IndexConfig.textAnalyzer` (read it from `manifest.textAnalyzer`);
      * the reference resolves the field's registered tokenizer the same way
      * (query_parser.rs `compute_logical_ast_for_leaf`).
      */
    analyzer: String = "default",
    /** Multiple default fields (`QueryParser::for_index(index, vec![title,
      * text])`): an UNFIELDED leaf compiles once per default field and the
      * copies combine as SHOULD clauses, each under its own field boost
      * (query_parser.rs `compute_path_triplets_for_literal` +
      * `compute_logical_ast_from_leaf_lenient`). Empty = just
      * `defaultField`.
      */
    defaultFields: Seq[String] = Nil,
    /** Per-field analyzer overrides (the reference's per-field
      * `TextOptions.set_tokenizer`): literals addressing these fields are
      * analyzed with the named chain instead of [[analyzer]] — read them
      * from `manifest.textFieldAnalyzers`.
      */
    fieldAnalyzers: Map[String, String] = Map.empty) {

  private val effectiveDefaults: Seq[String] =
    if (defaultFields.nonEmpty) defaultFields else Seq(defaultField)

  import graft.index.JsonTerms

  private val analyzeTerms: String => Seq[String] = Analyzer.chainTerms(analyzer)
  private val fieldChains: Map[String, String => Seq[String]] =
    fieldAnalyzers.map { case (f, a) => f -> Analyzer.chainTerms(a) }
  private def analyzeFor(field: String): String => Seq[String] =
    fieldChains.getOrElse(field, analyzeTerms)

  private def utcMicros(iso: String): Long = {
    val i = java.time.Instant.parse(iso)
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private def withFieldBoost(field: String, q: Query): Query =
    fieldBoosts.get(field) match {
      case Some(b) if q != Query.Nothing => Query.Boost(q, b)
      case _ => q
    }

  /** Right((jsonField, path)) when the dotted field head is a json field. */
  private def resolveJson(field: String): Option[(String, String)] = {
    val dot = field.indexOf('.')
    if (dot > 0 && jsonFields.contains(field.substring(0, dot)))
      Some((field.substring(0, dot), field.substring(dot + 1)))
    else None
  }

  /** `parse_query_lenient` (`src/query/query_parser/query_parser.rs:349`):
    * never throws — returns the best-effort query plus the errors hit. On a
    * syntax error the input degrades to a bag-of-words disjunction of its
    * analyzed terms over the default field (the reference similarly salvages
    * literals around the error instead of failing the whole query).
    */
  def parseLenient(input: String): (Query, Seq[String]) =
    try (parse(input), Nil)
    catch {
      case e: Exception =>
        val terms = analyzeTerms(input)
        val q =
          if (terms.isEmpty) Query.Nothing
          else if (terms.length == 1) Query.Term(defaultField, terms.head)
          else Query.Bool(terms.map(t => Occur.Should -> Query.Term(defaultField, t)))
        (q, Seq(Option(e.getMessage).getOrElse(e.toString)))
    }

  def parse(input: String): Query = {
    val p = new Parser(input)
    val q = p.parseOr()
    p.skipWs()
    require(p.eof, s"trailing input at ${p.pos}: '${input.drop(p.pos)}'")
    q match {
      case Query.Bool(cs, _) if cs.nonEmpty && cs.forall(_._1 == Occur.MustNot) =>
        throw new IllegalArgumentException("all-negative query is forbidden")
      case other => other
    }
  }

  private def analyzed(field: String, text: String): Query = resolveJson(field) match {
    case Some((jf, path)) =>
      val terms = analyzeTerms(text)
      if (terms.isEmpty) Query.Nothing
      else if (terms.length == 1) {
        val strQ = Query.Term(jf, JsonTerms.str(path, terms(0)))
        // a numeric literal matches its typed term too (the reference's
        // query parser tries every type interpretation of a json literal)
        text.toLongOption match {
          case Some(v) => Query.should(strQ, Query.Term(jf, JsonTerms.long(path, v)))
          case None => strQ
        }
      } else Query.Phrase(jf, terms.toSeq.map(JsonTerms.str(path, _)))
    case None =>
      if (rawFields.contains(field)) Query.Term(field, text)
      else {
        val terms = analyzeFor(field)(text)
        if (terms.isEmpty) Query.Nothing
        else if (terms.length == 1) Query.Term(field, terms(0))
        else Query.Phrase(field, terms.toSeq)
      }
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def peek: Char = s.charAt(pos)
    def skipWs(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1

    /** Combine operator legs, SPLICING pure-negative groups ("NOT x" /
      * "-x") into the parent as MustNot clauses — the reference's logical
      * flattening (query_grammar.rs:1055-1062: `term OR -term` means
      * `*term -term`, `a AND NOT b` means `+a -b`).
      */
    private def combine(occur: Occur, legs: List[Query]): Query =
      Query.Bool(legs.flatMap {
        case Query.Bool(cs, 0) if cs.nonEmpty && cs.forall(_._1 == Occur.MustNot) => cs
        case q => Seq(occur -> q)
      })

    def parseOr(): Query = {
      var legs = List(parseAnd())
      skipWs()
      while (!eof && wordAhead("OR")) {
        consumeWord("OR")
        legs = parseAnd() :: legs
        skipWs()
      }
      if (legs.size == 1) legs.head
      else combine(Occur.Should, legs.reverse)
    }

    def parseAnd(): Query = {
      var legs = List(parseClauseGroup())
      skipWs()
      while (!eof && wordAhead("AND")) {
        consumeWord("AND")
        legs = parseClauseGroup() :: legs
        skipWs()
      }
      if (legs.size == 1) legs.head
      else combine(Occur.Must, legs.reverse)
    }

    /** A run of whitespace-separated clauses with +/- occurs (stops at
      * AND/OR/closing paren).
      */
    def parseClauseGroup(): Query = {
      var clauses = List.empty[(Occur, Query)]
      skipWs()
      while (!eof && peek != ')' && !wordAhead("AND") && !wordAhead("OR")) {
        val occur =
          if (peek == '+') { pos += 1; Occur.Must }
          else if (peek == '-') { pos += 1; Occur.MustNot }
          // `NOT x` keyword == `-x` (query_grammar.rs:772; a bare trailing
          // NOT is a parse error like the reference's test_is_parse_err)
          else if (wordAhead("NOT")) { consumeWord("NOT"); Occur.MustNot }
          else if (conjunctionByDefault) Occur.Must
          else Occur.Should
        val q = parseBoosted()
        if (q != Query.Nothing) clauses = (occur -> q) :: clauses
        skipWs()
      }
      clauses match {
        case Nil => Query.Nothing
        case (Occur.Should, q) :: Nil => q
        case (Occur.Must, q) :: Nil => q
        case _ => Query.Bool(clauses.reverse)
      }
    }

    def parseBoosted(): Query = {
      val q = parseAtom()
      if (!eof && peek == '^') {
        pos += 1
        val start = pos
        while (!eof && (peek.isDigit || peek == '.')) pos += 1
        val b = s.substring(start, pos).toFloat
        Query.Boost(q, b)
      } else q
    }

    def parseAtom(): Query = {
      skipWs()
      require(!eof, "unexpected end of query")
      if (peek == '(') {
        pos += 1
        val q = parseOr()
        skipWs()
        require(!eof && peek == ')', "missing )")
        pos += 1
        return q
      }
      // optional field prefix
      val save = pos
      val fieldOpt = tryField()
      // the reference tolerates spaces after an explicit field's colon
      // ("title: >a", query_grammar.rs:1305)
      if (fieldOpt.isDefined) skipWs()
      if (eof) { pos = save; require(false, "dangling field"); }
      def leaf(field: String): Query = peek match {
        case '"' | '\'' => withFieldBoost(field, parseQuoted(field))
        case '[' | '{' => withFieldBoost(field, parseRange(field))
        case '>' | '<' => withFieldBoost(field, parseCmpRange(field))
        case '/' => withFieldBoost(field, parseRegex(field))
        case '*' =>
          pos += 1
          fieldOpt match {
            case None => Query.All
            case Some(f) => withFieldBoost(f, resolveJson(f) match {
              case Some((jf, path)) => Query.jsonExists(jf, path)
              case None => Query.exists(f)
            })
          }
        case _ =>
          if (wordAhead("IN") && fieldOpt.isDefined) withFieldBoost(field, parseSet(field))
          else withFieldBoost(field, parseWord(field))
      }
      fieldOpt match {
        case Some(f) => leaf(f)
        case None if effectiveDefaults.size == 1 => leaf(effectiveDefaults.head)
        case None =>
          // unfielded leaf over several default fields: one copy per field,
          // SHOULD-combined (compute_logical_ast_from_leaf_lenient)
          val start = pos
          val parts = effectiveDefaults.map { f => pos = start; leaf(f) }
          if (parts.contains(Query.All)) Query.All
          else {
            val live = parts.filter(_ != Query.Nothing)
            if (live.isEmpty) Query.Nothing
            else if (live.size == 1) live.head
            else Query.Bool(live.map(Occur.Should -> _))
          }
      }
    }

    def tryField(): Option[String] = {
      val save = pos
      val start = pos
      while (!eof && (peek.isLetterOrDigit || peek == '_' || peek == '.')) pos += 1
      if (!eof && pos > start && peek == ':') {
        val f = s.substring(start, pos)
        pos += 1
        Some(f)
      } else { pos = save; None }
    }

    def parseQuoted(field: String): Query = {
      // single or double quotes; `\"` / `\'` escape the delimiter
      // (query_parser.rs "phrase terms")
      val quote = peek
      pos += 1
      val sb = new StringBuilder
      while (!eof && peek != quote) {
        if (peek == '\\' && pos + 1 < s.length &&
            (s.charAt(pos + 1) == quote || s.charAt(pos + 1) == '\\')) pos += 1
        sb.append(peek)
        pos += 1
      }
      require(!eof, "unterminated quote")
      val text = sb.toString
      pos += 1
      var slop = 0
      if (!eof && peek == '~') {
        pos += 1
        val d0 = pos
        while (!eof && peek.isDigit) pos += 1
        slop = s.substring(d0, pos).toInt
      } else if (!eof && peek == '*') {
        // `"big bad wo"*` — phrase-prefix (query_parser.rs "prefix operator")
        pos += 1
        val terms =
          if (rawFields.contains(field)) Seq(text) else analyzeFor(field)(text)
        require(terms.length >= 2,
          "phrase-prefix requires at least two terms (PhrasePrefixRequiresAtLeastTwoTerms)")
        return Query.PhrasePrefix(field, terms)
      }
      resolveJson(field) match {
        case Some((jf, path)) =>
          analyzeTerms(text) match {
            case Seq() => Query.Nothing
            case Seq(t) => Query.Term(jf, JsonTerms.str(path, t))
            case ts => Query.Phrase(jf, ts.map(JsonTerms.str(path, _)), slop)
          }
        case None =>
          val terms = if (rawFields.contains(field)) Seq(text) else analyzeFor(field)(text)
          terms match {
            case Seq() => Query.Nothing
            case Seq(t) => Query.Term(field, t)
            case ts => Query.Phrase(field, ts, slop)
          }
      }
    }

    def parseRange(field: String): Query = {
      val loInc = peek == '['
      pos += 1
      val lo = rangeBound()
      skipWs()
      consumeWord("TO")
      skipWs()
      val hi = rangeBound()
      skipWs()
      require(!eof && (peek == ']' || peek == '}'), "unterminated range")
      val hiInc = peek == ']'
      pos += 1
      buildRange(field, lo.filter(_ != "*"), hi.filter(_ != "*"), loInc, hiInc)
    }

    /** Comparison-operator ranges (query_grammar.rs:1305-1325):
      * `field:>a` / `>=a` / `<a` / `<=a`, spaces after the operator ok.
      */
    def parseCmpRange(field: String): Query = {
      val gt = peek == '>'
      pos += 1
      val inc = !eof && peek == '='
      if (inc) pos += 1
      skipWs()
      val start = pos
      while (!eof && !peek.isWhitespace && peek != ')' && peek != '^') pos += 1
      require(pos > start, "comparison operator needs a bound")
      val v = Some(s.substring(start, pos)).filter(_ != "*")
      if (gt) buildRange(field, v, None, inc, hiInc = false)
      else buildRange(field, None, v, loInc = false, inc)
    }

    private def buildRange(field: String, loV: Option[String], hiV: Option[String],
        loInc: Boolean, hiInc: Boolean): Query = {
      if (dateFields.contains(field))
        // RFC3339 bounds on a typed date field (query_parser.rs date ranges)
        return Query.longRange(field, loV.map(utcMicros), hiV.map(utcMicros), loInc, hiInc)
      resolveJson(field) match {
        case Some((jf, path)) =>
          val numeric = (loV ++ hiV).forall(_.toLongOption.isDefined)
          if (numeric) {
            // typed range clamped to this path's `l` term space: open ends
            // become the tag prefix itself / prefix+U+FFFF so the scan never
            // leaks into neighboring paths
            val tagPrefix = path + JsonTerms.Sep + "l"
            Query.TypedRange(jf,
              Some(loV.map(v => graft.index.JsonTerms.long(path, v.toLong)).getOrElse(tagPrefix)),
              Some(hiV.map(v => graft.index.JsonTerms.long(path, v.toLong)).getOrElse(tagPrefix + "\uffff")),
              loV.isEmpty || loInc, hiV.isEmpty || hiInc)
          } else {
            val tagPrefix = path + JsonTerms.Sep + "s"
            Query.TypedRange(jf,
              Some(loV.map(v => JsonTerms.str(path, norm(field, v))).getOrElse(tagPrefix)),
              Some(hiV.map(v => JsonTerms.str(path, norm(field, v))).getOrElse(tagPrefix + "\uffff")),
              loV.isEmpty || loInc, hiV.isEmpty || hiInc)
          }
        case None =>
          Query.TermRange(field,
            loV.map(norm(field, _)),
            hiV.map(norm(field, _)), loInc, hiInc)
      }
    }

    private def norm(field: String, v: String): String =
      if (rawFields.contains(field)) v else analyzeFor(field)(v).headOption.getOrElse(v)

    def rangeBound(): Option[String] = {
      skipWs()
      val start = pos
      while (!eof && !peek.isWhitespace && peek != ']' && peek != '}') pos += 1
      val v = s.substring(start, pos)
      if (v.isEmpty) None else Some(v)
    }

    def parseRegex(field: String): Query = {
      pos += 1
      val start = pos
      while (!eof && peek != '/') pos += 1
      require(!eof, "unterminated regex")
      val pat = s.substring(start, pos)
      pos += 1
      Query.Regexp(field, pat)
    }

    def parseSet(field: String): Query = {
      consumeWord("IN")
      skipWs()
      require(!eof && peek == '[', "IN expects [...]")
      pos += 1
      val terms = scala.collection.mutable.ArrayBuffer[String]()
      skipWs()
      while (!eof && peek != ']') {
        val start = pos
        while (!eof && !peek.isWhitespace && peek != ']') pos += 1
        terms += norm(field, s.substring(start, pos))
        skipWs()
      }
      require(!eof, "unterminated IN set")
      pos += 1
      Query.TermSet(field, terms.toSeq)
    }

    def parseWord(field: String): Query = {
      val start = pos
      while (!eof && !peek.isWhitespace && !"()^\"".contains(peek)) pos += 1
      var w = s.substring(start, pos)
      require(w.nonEmpty, s"empty term at $pos")
      if (dateFields.contains(field)) {
        // RFC3339 literal on a typed date field -> exact typed match
        val v = utcMicros(w)
        Query.longRange(field, Some(v), Some(v), loInclusive = true, hiInclusive = true)
      } else if (w.endsWith("*") && w.length > 1)
        Query.Prefix(field, norm(field, w.dropRight(1)))
      else {
        // fuzzy suffix ~d
        val m = "~([0-9]+)$".r.findFirstMatchIn(w)
        m match {
          case Some(mm) =>
            val d = mm.group(1).toInt
            Query.Fuzzy(field, norm(field, w.substring(0, mm.start)), d)
          case None => fuzzyFields.get(field) match {
            case Some(fc) =>
              Query.Fuzzy(field, norm(field, w), fc.distance, fc.prefix, fc.transpositionCostOne)
            case None => analyzed(field, w)
          }
        }
      }
    }

    def wordAhead(kw: String): Boolean = {
      skipWs()
      s.startsWith(kw, pos) && {
        val after = pos + kw.length
        after >= s.length || !s.charAt(after).isLetterOrDigit
      }
    }
    def consumeWord(kw: String): Unit = {
      skipWs()
      require(wordAhead(kw), s"expected $kw at $pos")
      pos += kw.length
    }
  }
}

object QueryParser {
  /** `set_field_fuzzy` knobs (`src/query/query_parser/query_parser.rs:282-304`). */
  final case class FuzzyConfig(distance: Int = 1, prefix: Boolean = false,
      transpositionCostOne: Boolean = false)
}
