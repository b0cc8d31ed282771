package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.search.{Occur, Query, QueryParser}

/** Grammar round-trip fuzz: render random query ASTs into the reference's
  * query syntax (`/root/reference/query-grammar/src/query_grammar.rs`) with
  * an independent printer written here, then assert the parser reproduces
  * the AST exactly. The generator only emits canonical shapes — the ones the
  * parser itself produces (no single-clause Bools, no pure-negative Bools,
  * terms that are analyzer fixpoints) — so equality is exact, not modulo
  * simplification.
  */
class QueryGrammarFuzzSpec extends AnyFunSuite {

  private val fields = Vector("text", "title", "body")

  private def word(r: Random): String = {
    val n = 2 + r.nextInt(7)
    (0 until n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
  }
  private def words(r: Random, n: Int): Seq[String] = Seq.fill(n)(word(r))

  private def regexPat(r: Random): String = r.nextInt(3) match {
    case 0 => word(r) + ".*"
    case 1 => word(r) + "." + word(r)
    case 2 => "[" + word(r) + "]" + word(r)
  }

  private val boosts = Vector(0.5f -> "0.5", 2.0f -> "2.0", 3.5f -> "3.5")

  /** One leaf for an explicit field: (AST, rendered). `kinds` bounds the
    * alternative count so the fan-out property can exclude shapes that only
    * exist fielded (IN sets, field:* exists).
    */
  private def leaf(r: Random, f: String, kinds: Int = 9): (Query, String) =
    r.nextInt(kinds) match {
      case 0 =>
        val w = word(r); (Query.Term(f, w), s"$f:$w")
      case 1 =>
        val ws = words(r, 2 + r.nextInt(2)); val slop = r.nextInt(4)
        (Query.Phrase(f, ws, slop),
          s"""$f:"${ws.mkString(" ")}"""" + (if (slop > 0) s"~$slop" else ""))
      case 2 =>
        val ws = words(r, 2 + r.nextInt(2))
        (Query.PhrasePrefix(f, ws), s"""$f:"${ws.mkString(" ")}"*""")
      case 3 =>
        val w = word(r); (Query.Prefix(f, w), s"$f:$w*")
      case 4 =>
        val w = word(r); val d = 1 + r.nextInt(2)
        (Query.Fuzzy(f, w, d), s"$f:$w~$d")
      case 5 =>
        val p = regexPat(r); (Query.Regexp(f, p), s"$f:/$p/")
      case 6 => range(r, f)
      case 7 =>
        val ws = words(r, 1 + r.nextInt(3)).distinct
        (Query.TermSet(f, ws), s"$f:IN [${ws.mkString(" ")}]")
      case 8 =>
        (Query.exists(f), s"$f:*")
    }

  private def ob(inc: Boolean) = if (inc) "[" else "{"
  private def cb(inc: Boolean) = if (inc) "]" else "}"

  private def range(r: Random, f: String): (Query, String) = r.nextInt(3) match {
    case 0 => // two-bound bracket form; brackets carry the inclusive flags
      val ws = words(r, 2).sorted
      val (a, b) = (ws(0), ws(1))
      val loInc = r.nextBoolean(); val hiInc = r.nextBoolean()
      (Query.TermRange(f, Some(a), Some(b), loInc, hiInc),
        s"$f:${ob(loInc)}$a TO $b${cb(hiInc)}")
    case 1 => // comparison shorthand pins the unbounded side's flag
      val w = word(r); val inc = r.nextBoolean()
      if (r.nextBoolean())
        (Query.TermRange(f, Some(w), None, inc, hiInclusive = false),
          s"$f:>${if (inc) "=" else ""}$w")
      else
        (Query.TermRange(f, None, Some(w), loInclusive = false, inc),
          s"$f:<${if (inc) "=" else ""}$w")
    case 2 => // half-open bracket: `*` bound, brackets still set the flags
      val w = word(r); val loInc = r.nextBoolean(); val hiInc = r.nextBoolean()
      if (r.nextBoolean())
        (Query.TermRange(f, Some(w), None, loInc, hiInc),
          s"$f:${ob(loInc)}$w TO *${cb(hiInc)}")
      else
        (Query.TermRange(f, None, Some(w), loInc, hiInc),
          s"$f:${ob(loInc)}* TO $w${cb(hiInc)}")
  }

  /** Random query of bounded depth: leaves (sometimes boosted), `*`, and
    * boolean trees in all three syntax forms.
    */
  private def gen(r: Random, depth: Int): (Query, String) = {
    val choice = if (depth == 0) r.nextInt(6) else r.nextInt(10)
    if (choice < 5) {
      val (q, s) = leaf(r, fields(r.nextInt(fields.length)))
      if (r.nextInt(4) == 0) {
        val (b, bs) = boosts(r.nextInt(boosts.length))
        (Query.Boost(q, b), s"$s^$bs")
      } else (q, s)
    } else if (choice == 5) (Query.All, "*")
    else bool(r, depth)
  }

  /** Nested Bools must be parenthesized or the parent clause group would
    * absorb their clauses.
    */
  private def sub(r: Random, depth: Int): (Query, String) = {
    val (q, s) = gen(r, depth)
    q match {
      case _: Query.Bool => (q, s"($s)")
      case _ => (q, s)
    }
  }

  private def bool(r: Random, depth: Int): (Query, String) = {
    val n = 2 + r.nextInt(3)
    val subs = Seq.fill(n)(sub(r, depth - 1))
    r.nextInt(3) match {
      case 0 => // whitespace clause group with +/-/NOT occur prefixes
        val occs0 = subs.map(_ => r.nextInt(3) match {
          case 0 => Occur.Should
          case 1 => Occur.Must
          case 2 => Occur.MustNot
        })
        // pure-negative groups are rejected at top level and spliced as
        // AND/OR legs — keep every generated Bool non-pure-negative
        val occs =
          if (occs0.forall(_ == Occur.MustNot)) occs0.updated(0, Occur.Must)
          else occs0
        val rendered = occs.zip(subs).map {
          case (Occur.Should, (_, s)) => s
          case (Occur.Must, (_, s)) => s"+$s"
          case (Occur.MustNot, (_, s)) =>
            if (r.nextBoolean()) s"-$s" else s"NOT $s"
        }.mkString(" ")
        (Query.Bool(occs.zip(subs.map(_._1))), rendered)
      case 1 => // explicit AND
        (Query.Bool(subs.map(Occur.Must -> _._1)),
          subs.map(_._2).mkString(" AND "))
      case 2 => // explicit OR
        (Query.Bool(subs.map(Occur.Should -> _._1)),
          subs.map(_._2).mkString(" OR "))
    }
  }

  test("parse(render(ast)) == ast over 600 random trees") {
    val p = new QueryParser("text")
    val r = new Random(20260819L)
    for (i <- 0 until 600) {
      val (ast, s) = gen(r, depth = 1 + r.nextInt(3))
      val parsed =
        try p.parse(s)
        catch { case e: Exception => fail(s"trial $i: parse failed on '$s': $e") }
      assert(parsed == ast, s"trial $i: '$s'\n  expected $ast\n  got      $parsed")
    }
  }

  test("multi-default-field fan-out holds for every unfielded leaf kind") {
    val mp = new QueryParser("text", defaultFields = Seq("title", "text"))
    val r = new Random(42L)
    for (i <- 0 until 200) {
      val seed = r.nextLong()
      // identical draw sequences -> the same leaf addressed at each field
      val (qt, st) = leaf(new Random(seed), "title", kinds = 7)
      val (qx, _) = leaf(new Random(seed), "text", kinds = 7)
      val unfielded = st.stripPrefix("title:")
      val expected = Query.Bool(Seq(Occur.Should -> qt, Occur.Should -> qx))
      assert(mp.parse(unfielded) == expected, s"trial $i: '$unfielded'")
    }
  }
}
