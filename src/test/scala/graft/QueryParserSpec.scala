package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.search.{Occur, Query, QueryParser}

class QueryParserSpec extends AnyFunSuite {
  val p = new QueryParser("text")

  test("single term") {
    assert(p.parse("alpha") == Query.Term("text", "alpha"))
    assert(p.parse("Alpha") == Query.Term("text", "alpha")) // analyzed
  }
  test("multiple default fields: unfielded leaves fan out as SHOULD") {
    // query_parser.rs test_parse_query_to_ast: "toto" with defaults
    // [title, text] -> (title:toto text:toto); fielded leaves don't fan out
    val mp = new QueryParser("text", defaultFields = Seq("title", "text"))
    assert(mp.parse("toto") == Query.Bool(Seq(
      Occur.Should -> Query.Term("title", "toto"),
      Occur.Should -> Query.Term("text", "toto"))))
    assert(mp.parse("title:toto") == Query.Term("title", "toto"))
    assert(mp.parse("\"alpha beta\"") == Query.Bool(Seq(
      Occur.Should -> Query.Phrase("title", Seq("alpha", "beta")),
      Occur.Should -> Query.Phrase("text", Seq("alpha", "beta")))))
    // per-field boost applies inside each SHOULD copy (field_boost)
    val bp = new QueryParser("text", defaultFields = Seq("title", "text"),
      fieldBoosts = Map("title" -> 2.0f))
    assert(bp.parse("toto") == Query.Bool(Seq(
      Occur.Should -> Query.Boost(Query.Term("title", "toto"), 2.0f),
      Occur.Should -> Query.Term("text", "toto"))))
    // boolean structure composes per leaf
    assert(mp.parse("+toto -titi") == Query.Bool(Seq(
      Occur.Must -> Query.Bool(Seq(
        Occur.Should -> Query.Term("title", "toto"),
        Occur.Should -> Query.Term("text", "toto"))),
      Occur.MustNot -> Query.Bool(Seq(
        Occur.Should -> Query.Term("title", "titi"),
        Occur.Should -> Query.Term("text", "titi"))))))
    // unfielded * stays AllQuery
    assert(mp.parse("*") == Query.All)
  }
  test("occur prefixes") {
    assert(p.parse("+alpha -beta gamma") == Query.Bool(Seq(
      Occur.Must -> Query.Term("text", "alpha"),
      Occur.MustNot -> Query.Term("text", "beta"),
      Occur.Should -> Query.Term("text", "gamma"))))
  }
  test("AND / OR with precedence") {
    assert(p.parse("a AND b") == Query.Bool(Seq(
      Occur.Must -> Query.Term("text", "a"), Occur.Must -> Query.Term("text", "b"))))
    assert(p.parse("a OR b OR c") == Query.Bool(Seq(
      Occur.Should -> Query.Term("text", "a"),
      Occur.Should -> Query.Term("text", "b"),
      Occur.Should -> Query.Term("text", "c"))))
    assert(p.parse("a AND b OR c") == Query.Bool(Seq(
      Occur.Should -> Query.Bool(Seq(
        Occur.Must -> Query.Term("text", "a"), Occur.Must -> Query.Term("text", "b"))),
      Occur.Should -> Query.Term("text", "c"))))
  }
  test("field prefix and raw fields") {
    assert(p.parse("lang:EN") == Query.Term("lang", "EN")) // raw: not analyzed
    assert(p.parse("text:Alpha") == Query.Term("text", "alpha"))
  }
  test("phrase with slop") {
    assert(p.parse("\"alpha beta\"") == Query.Phrase("text", Seq("alpha", "beta")))
    assert(p.parse("\"alpha beta\"~2") == Query.Phrase("text", Seq("alpha", "beta"), 2))
    assert(p.parse("\"alpha\"") == Query.Term("text", "alpha"))
  }
  test("phrase prefix, single quotes, escaped quotes") {
    assert(p.parse("\"alpha beta ga\"*") ==
      Query.PhrasePrefix("text", Seq("alpha", "beta", "ga")))
    intercept[IllegalArgumentException](p.parse("\"alpha\"*")) // needs >= 2 terms
    assert(p.parse("'alpha beta'~1") == Query.Phrase("text", Seq("alpha", "beta"), 1))
    assert(p.parse("\"say \\\"hi\\\" now\"") ==
      Query.Phrase("text", Seq("say", "hi", "now")))
  }

  test("field boosts, fuzzy fields, date fields") {
    val pb = new QueryParser("text",
      fieldBoosts = Map("title" -> 2.0f),
      fuzzyFields = Map("names" -> QueryParser.FuzzyConfig(2, prefix = true,
        transpositionCostOne = true)),
      dateFields = Set("warc_ts"))
    assert(pb.parse("title:alpha") == Query.Boost(Query.Term("title", "alpha"), 2.0f))
    assert(pb.parse("alpha") == Query.Term("text", "alpha")) // default field unboosted
    assert(pb.parse("names:smith") ==
      Query.Fuzzy("names", "smith", 2, prefix = true, transpositionCostOne = true))
    val micros = java.time.Instant.parse("2002-10-02T15:00:00Z").getEpochSecond * 1000000L
    assert(pb.parse("warc_ts:[2002-10-02T15:00:00Z TO *]") ==
      Query.longRange("warc_ts", Some(micros), None, loInclusive = true, hiInclusive = true))
    assert(pb.parse("warc_ts:2002-10-02T15:00:00Z") ==
      Query.longRange("warc_ts", Some(micros), Some(micros),
        loInclusive = true, hiInclusive = true))
  }

  test("multi-token literal becomes phrase") {
    assert(p.parse("can't") == Query.Phrase("text", Seq("can", "t")))
  }
  test("ranges") {
    assert(p.parse("text:[aaa TO bbb]") ==
      Query.TermRange("text", Some("aaa"), Some("bbb"), loInclusive = true, hiInclusive = true))
    assert(p.parse("text:{aaa TO bbb}") ==
      Query.TermRange("text", Some("aaa"), Some("bbb"), loInclusive = false, hiInclusive = false))
    assert(p.parse("text:[* TO bbb}") ==
      Query.TermRange("text", None, Some("bbb"), loInclusive = true, hiInclusive = false))
  }
  test("set, prefix, fuzzy, regex, all") {
    assert(p.parse("text:IN [a b c]") == Query.TermSet("text", Seq("a", "b", "c")))
    assert(p.parse("alp*") == Query.Prefix("text", "alp"))
    assert(p.parse("alpha~1") == Query.Fuzzy("text", "alpha", 1))
    assert(p.parse("/w00.?3/") == Query.Regexp("text", "w00.?3"))
    assert(p.parse("*") == Query.All)
  }
  test("field:* is exists, not all (query_grammar.rs:319-362)") {
    assert(p.parse("lang:*") == Query.exists("lang"))
    assert(p.parse("lang: *") == Query.exists("lang")) // space-tolerant colon
    assert(p.parse("a lang:*") == Query.Bool(Seq(
      Occur.Should -> Query.Term("text", "a"),
      Occur.Should -> Query.exists("lang"))))
    val pj = new QueryParser("text", jsonFields = Set("attrs"))
    assert(pj.parse("attrs.meta.src:*") == Query.jsonExists("attrs", "meta.src"))
  }
  test("boost and parens") {
    assert(p.parse("alpha^2.5") == Query.Boost(Query.Term("text", "alpha"), 2.5f))
    assert(p.parse("(a OR b) AND c") == Query.Bool(Seq(
      Occur.Must -> Query.Bool(Seq(
        Occur.Should -> Query.Term("text", "a"), Occur.Should -> Query.Term("text", "b"))),
      Occur.Must -> Query.Term("text", "c"))))
  }
  test("all-negative forbidden") {
    intercept[IllegalArgumentException](p.parse("-alpha -beta"))
  }
  test("conjunction by default") {
    val pc = new QueryParser("text", conjunctionByDefault = true)
    assert(pc.parse("a b") == Query.Bool(Seq(
      Occur.Must -> Query.Term("text", "a"), Occur.Must -> Query.Term("text", "b"))))
  }
  test("NOT keyword (query_grammar.rs:772,1247-1283)") {
    // `a AND NOT b` == `+a -b`; `NOT a AND b` == `-a +b` (negative legs
    // splice into the conjunction — the reference's logical flattening)
    assert(p.parse("a AND NOT b") == Query.Bool(Seq(
      Occur.Must -> Query.Term("text", "a"), Occur.MustNot -> Query.Term("text", "b"))))
    assert(p.parse("NOT a AND b") == Query.Bool(Seq(
      Occur.MustNot -> Query.Term("text", "a"), Occur.Must -> Query.Term("text", "b"))))
    // inside a clause group NOT behaves like `-`
    assert(p.parse("a NOT b") == Query.Bool(Seq(
      Occur.Should -> Query.Term("text", "a"), Occur.MustNot -> Query.Term("text", "b"))))
    // `term OR -term` means `*term -term` (query_grammar.rs:1058)
    assert(p.parse("a OR -b") == Query.Bool(Seq(
      Occur.Should -> Query.Term("text", "a"), Occur.MustNot -> Query.Term("text", "b"))))
    // NOTa is a plain term; bare/all-negative NOT is rejected
    assert(p.parse("NOTa") == Query.Term("text", "nota"))
    intercept[Exception](p.parse("NOT"))
    intercept[IllegalArgumentException](p.parse("NOT a"))
  }
  test("comparison-operator ranges (query_grammar.rs:1305-1325)") {
    assert(p.parse("title:>a") == Query.TermRange("title", Some("a"), None, false, false))
    assert(p.parse("title:>=a") == Query.TermRange("title", Some("a"), None, true, false))
    assert(p.parse("title: <a") == Query.TermRange("title", None, Some("a"), false, false))
    assert(p.parse("title:<=bsd") == Query.TermRange("title", None, Some("bsd"), false, true))
    assert(p.parse("weight: <= 70") == Query.TermRange("weight", None, Some("70"), false, true))
    // default field + composition + parens
    assert(p.parse(">=a") == Query.TermRange("text", Some("a"), None, true, false))
    assert(p.parse("(title:>a)^2") == Query.Boost(
      Query.TermRange("title", Some("a"), None, false, false), 2.0f))
    // typed date field shorthand
    val pd = new QueryParser("text", dateFields = Set("ts"))
    assert(pd.parse("ts:>=2025-01-01T00:00:00Z") ==
      Query.longRange("ts", Some(1735689600000000L), None, true, false))
  }
}
