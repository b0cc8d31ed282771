package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.PipelineOps

/** Curation ops: repetition quality filter, benchmark decontamination,
  * deterministic mixture sampling.
  */
class CurationSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("repetitionScore: repeated boilerplate scores high, unique text zero") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // all 3-grams unique
      (2L, "spam spam spam spam spam spam spam spam"), // one distinct 3-gram
      (3L, "one two three one two three one two three") // heavy repetition
    ).toDF("doc_id", "text")
    val r = PipelineOps.repetitionScore(docs)
      .select("doc_id", "dup_ngram_frac").as[(Long, Double)].collect().toMap
    assert(r(1L) == 0.0)
    assert(r(2L) > 0.8)
    assert(r(3L) > 0.5)
  }

  test("contamination: finds the planted overlap, excludes self-pairs") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "intro text then the quick brown fox jumps over the lazy dog outro"), // contains bench
      (2L, "completely unrelated words nothing shared here at all"),
      (100L, "the quick brown fox jumps over the lazy dog") // the bench doc itself
    ).toDF("doc_id", "text")
    val hits = PipelineOps.contamination(docs, bench, 3)
      .select("doc_id", "bench_id").as[(Long, Long)].collect().toSet
    assert(hits == Set((1L, 100L))) // doc 2 clean; self-pair excluded
  }

  test("stratifiedSample: deterministic across repartition, respects weights") {
    val docs = (0L until 4000L).map(i => (i, if (i % 2 == 0) "en" else "de", s"d$i"))
      .toDF("doc_id", "lang", "text")
    val w = Map("en" -> 0.5, "de" -> 0.1)
    val a = PipelineOps.stratifiedSample(docs, "lang", w)
      .select("doc_id").as[Long].collect().toSet
    val b = PipelineOps.stratifiedSample(docs.repartition(17), "lang", w)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b) // row-deterministic: partitioning can't change the sample
    val en = a.count(_ % 2 == 0).toDouble / 2000
    val de = a.count(_ % 2 == 1).toDouble / 2000
    assert(math.abs(en - 0.5) < 0.05 && math.abs(de - 0.1) < 0.03)
    // unlisted strata drop entirely
    val none = PipelineOps.stratifiedSample(docs, "lang", Map("fr" -> 1.0))
    assert(none.count() == 0L)
  }

  test("urlBlocklistFilter: exact host, subdomain, case, and TLD-never-blocks") {
    val docs = Seq(
      (1L, "https://Bad.Example.COM/x"), // exact host match (case-folded)
      (2L, "https://deep.sub.bad.example.com/y"), // subdomain of a blocked parent
      (3L, "https://good.example.com/z"), // sibling, not blocked
      (4L, "https://bad.example.com.evil.org/w"), // blocked string as a LEFT part: not a suffix
      (5L, "https://com/q") // one-label host: never matches (no >=2-label suffix)
    ).toDF("doc_id", "url")
    val bl = Seq("BAD.example.com", "com").toDF("domain")
    val got = PipelineOps.urlBlocklistFilter(docs, bl)
      .select("doc_id", "blocked").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> false, 4L -> false, 5L -> false))
    val by = PipelineOps.urlBlocklistFilter(docs, bl)
      .where(col("blocked")).select("doc_id", "blocked_by")
      .as[(Long, String)].collect().toMap
    assert(by == Map(1L -> "bad.example.com", 2L -> "bad.example.com"))
  }

  test("curationFunnel: each doc attributed to its FIRST failing stage") {
    // lines of 10 words, optionally terminal-punctuated (c4's keep rule)
    def mk(words: Seq[String], punct: Boolean): String =
      words.grouped(10).map(g => g.mkString(" ") + (if (punct) "." else ""))
        .mkString("\n")
    val filler = (1 to 48).map(i => s"item${i}x")
    val fillerE = (1 to 48).map(i => s"other${i}y")
    val span = Seq("zebra", "quokka", "marmot", "badger", "weasel", "otter")
    val docs = Seq(
      (1L, "tiny doc the and."), // < 50 words -> gopher
      (2L, mk(filler ++ Seq("the", "and"), punct = false)), // no terminal '.' -> c4
      (3L, Seq.fill(6)("the black cats sat upon the soft mats and slept.")
        .mkString("\n")), // passes gopher+c4, 10-token cycle -> repetition
      // stop words lead so the line-terminal '.' never glues onto them
      (4L, mk(Seq("the", "and") ++ filler ++ span, punct = true)), // bench span -> contaminated
      (5L, mk(Seq("the", "and") ++ fillerE, punct = true)) // clean -> kept
    ).toDF("doc_id", "text")
    val bench = Seq((999L,
      mk(span ++ Seq("ferret", "stoat", "mink", "the"), punct = true))).toDF("doc_id", "text")
    val got = PipelineOps.curationFunnel(docs, bench)
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "gopher", 2L -> "c4", 3L -> "repetition",
      4L -> "contaminated", 5L -> "kept"))
    // partitioning-invariant (all stages row-deterministic)
    val got2 = PipelineOps.curationFunnel(docs.repartition(7), bench)
      .as[(Long, String)].collect().toMap
    assert(got2 == got)
  }

  test("hashSplit: deterministic disjoint labels, fractions near target, salt independence") {
    val docs = (0L until 5000L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val a = PipelineOps.hashSplit(docs, valPermille = 100, testPermille = 50)
      .as[(Long, String)].collect().toMap
    val b = PipelineOps.hashSplit(docs.repartition(13), valPermille = 100, testPermille = 50)
      .as[(Long, String)].collect().toMap
    assert(a == b) // pure function of (doc_id, salt): partitioning is irrelevant
    assert(a.size == 5000 && a.values.forall(Set("train", "val", "test")))
    // independent JVM oracle: same md5 arithmetic, zero Spark involvement
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long, salt: String): Long = {
      val hex = md.digest(s"$id#$salt".getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 1000
    }
    a.foreach { case (id, lbl) =>
      val want = bucket(id, "split") match {
        case x if x < 50 => "test"
        case x if x < 150 => "val"
        case _ => "train"
      }
      assert(lbl == want, s"doc $id")
    }
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 5000.0).toMap
    assert(math.abs(frac("test") - 0.05) < 0.01 && math.abs(frac("val") - 0.1) < 0.015)
    // a different salt draws an independent split (some docs move)
    val c = PipelineOps.hashSplit(docs, 100, 50, salt = "other")
      .as[(Long, String)].collect().toMap
    assert(c.exists { case (id, l) => a(id) != l })
  }

  test("globalShuffle: permutation of 0..n-1, repartition-invariant, matches full-sort rank") {
    val docs = (0L until 4096L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pos = PipelineOps.globalShuffle(docs).as[(Long, Long)].collect().toMap
    assert(pos.size == 4096 && pos.values.toSet == (0L until 4096L).toSet)
    val pos2 = PipelineOps.globalShuffle(docs.repartition(29)).as[(Long, Long)].collect().toMap
    assert(pos == pos2)
    // independent oracle: JVM md5 keys, plain sort, index = position
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): Long = java.lang.Long.parseLong(
      md.digest(s"$id#shuffle".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
    val want = (0L until 4096L).sortBy(id => (h(id), id)).zipWithIndex
      .map { case (id, i) => id -> i.toLong }.toMap
    assert(pos == want)
    // different salt, different permutation
    val other = PipelineOps.globalShuffle(docs, salt = "epoch2").as[(Long, Long)].collect().toMap
    assert(other != pos && other.values.toSet == (0L until 4096L).toSet)
  }

  test("domainCap: keeps the cap lowest doc_ids per host, small hosts whole") {
    val docs = ((0L until 30L).map(i => (i, s"https://h${i % 3}.example/p$i")) :+
      (100L, "https://rare.example/only")).toDF("doc_id", "url")
    val kept = PipelineOps.domainCap(docs, 4)
      .select("doc_id", "host", "host_rank").as[(Long, String, Long)].collect()
    // each of h0/h1/h2 has 10 docs -> capped at its 4 smallest doc_ids
    val byHost = kept.groupBy(_._2)
    assert(byHost("h0.example").map(_._1).sorted.toSeq == Seq(0L, 3L, 6L, 9L))
    assert(byHost("h1.example").map(_._1).sorted.toSeq == Seq(1L, 4L, 7L, 10L))
    assert(byHost("h2.example").map(_._1).sorted.toSeq == Seq(2L, 5L, 8L, 11L))
    // under-cap host survives untouched, rank 1
    assert(byHost("rare.example").toSeq == Seq((100L, "rare.example", 1L)))
    // ranks are 1..cap within each host
    assert(kept.forall(r => r._3 >= 1L && r._3 <= 4L))
  }

  test("paragraphDedup: corpus-wide first occurrence survives, copies drop") {
    def toks(prefix: String, n: Int) = (1 to n).map(i => s"$prefix$i").mkString(" ")
    val A = toks("a", 8); val B = toks("b", 8); val C = toks("c", 8)
    val D = toks("d", 8); val E = toks("e", 8); val tail = toks("t", 4)
    val docs = Seq(
      (1L, s"$A $B"),       // both windows first occurrences
      (2L, s"$A $C"),       // A is a corpus-wide copy, C is new
      (3L, A),              // everything already seen -> empty clean text
      (4L, s"$D $D"),       // within-doc copy: first instance survives
      (5L, s"$E $tail")     // short tail window is its own paragraph
    ).toDF("doc_id", "text")
    val r = PipelineOps.paragraphDedup(docs)
      .select("doc_id", "n_paras", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect().map(x => x._1 -> x).toMap
    assert(r(1L) == ((1L, 2L, 2L, s"$A $B")))
    assert(r(2L) == ((2L, 2L, 1L, C)))
    assert(r(3L) == ((3L, 1L, 0L, "")))
    assert(r(4L) == ((4L, 2L, 1L, D)))
    assert(r(5L) == ((5L, 2L, 2L, s"$E $tail")))
  }

  test("urlNormalize: scheme/host case, ports, trackers, fragments, slashes") {
    val urls = Seq(
      (1L, "HTTP://WWW.Example.COM:80/A/B/?utm_source=x&q=1#frag"),
      (2L, "https://Site.org:443/path"),
      (3L, "https://site.org:8080/path/"),
      (4L, "http://a.b/?gclid=z"),
      (5L, "https://x.y/p?a=1&ref=tw&b=2"),
      (6L, "https://x.y/p?a=1&b=2")
    ).toDF("doc_id", "url")
    val c = PipelineOps.urlNormalize(urls)
      .select("doc_id", "canonical_url").as[(Long, String)].collect().toMap
    assert(c(1L) == "http://www.example.com/A/B?q=1") // case kept in path only
    assert(c(2L) == "https://site.org/path")          // default port stripped
    assert(c(3L) == "https://site.org:8080/path")     // non-default port kept
    assert(c(4L) == "http://a.b")                     // query + root slash gone
    assert(c(5L) == "https://x.y/p?a=1&b=2")          // mid-query tracker out
    assert(c(6L) == "https://x.y/p?a=1&b=2")

    val dd = PipelineOps.urlDedup(urls)
      .select("doc_id", "canonical_url", "n_dupes")
      .as[(Long, String, Long)].collect()
    val xy = dd.filter(_._2 == "https://x.y/p?a=1&b=2")
    assert(xy.toSeq == Seq((5L, "https://x.y/p?a=1&b=2", 2L))) // lowest id kept
    assert(dd.length == 5)
  }

  test("htmlExtract: scripts/styles/comments out, tags to spaces, entities decode") {
    val docs = Seq(
      (1L, "<html><head><title>T</title><style>p{a:1}</style></head><body>" +
        "<p>Hello <b>world</b></p><script>if (a<b) { x(\"</p>\"); }</script>" +
        "<div>A &amp; B&nbsp;C</div><!-- hidden --></body></html>"),
      (2L, "no markup at all"),
      (3L, "&amp;lt; stays escaped; &#39;q&#39;"),
      (4L, "a  <br/>\n b\tc"),
      (5L, "<SCRIPT SRC='x'>var y;</SCRIPT >tail")
    ).toDF("doc_id", "html_text")
    val r = PipelineOps.htmlExtract(docs)
      .select("doc_id", "extracted_text").as[(Long, String)].collect().toMap
    assert(r(1L) == "T Hello world A & B C")   // script content (incl. </p>) gone
    assert(r(2L) == "no markup at all")
    assert(r(3L) == "&lt; stays escaped; 'q'") // double-escape decodes ONE level
    assert(r(4L) == "a b c")                   // whitespace + void tag collapse
    assert(r(5L) == "tail")                    // case-insensitive, space before >
  }

  test("lmSurprise: integer floor-log2 surprise matches an independent model") {
    // corpus mixing hot tokens and unique tails so all three buckets appear
    val docs = Seq(
      1L -> "a a a a",
      2L -> "a b b c",
      3L -> (1 to 300).map(i => s"u$i").mkString(" "),
      4L -> (1 to 1100).map(i => s"v$i").mkString(" "),
      5L -> ("a " * 40 + "b " * 24).trim,
      6L -> "a a a w1 w2 w3 w4 w5"
    ).toDF("doc_id", "text")
    // independent model: plain Scala counts + bit arithmetic (no SQL bin())
    val toks = Seq(
      1L -> Seq.fill(4)("a"),
      2L -> Seq("a", "b", "b", "c"),
      3L -> (1 to 300).map(i => s"u$i"),
      4L -> (1 to 1100).map(i => s"v$i"),
      5L -> (Seq.fill(40)("a") ++ Seq.fill(24)("b")),
      6L -> (Seq.fill(3)("a") ++ (1 to 5).map(i => s"w$i")))
    val cnt = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = cnt.values.sum
    def bits(t: String): Long = 63L - java.lang.Long.numberOfLeadingZeros(total / cnt(t))
    val expected = toks.map { case (id, ts) =>
      val sum = ts.map(bits).sum
      val mean = sum * 1000 / ts.size
      val bucket = if (mean <= 7000) "head" else if (mean <= 9000) "middle" else "tail"
      (id, ts.size.toLong, sum, mean, bucket)
    }.toSet
    val got = PipelineOps.lmSurprise(docs)
      .select("doc_id", "n_toks", "sum_bits", "mean_millibits", "lm_bucket")
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(got == expected)
    assert(got.map(_._5) == Set("head", "middle", "tail")) // all buckets exercised
    // non-broadcast (shuffle-join) path is result-identical
    val got2 = PipelineOps.lmSurprise(docs, broadcastLm = false)
      .select("doc_id", "n_toks", "sum_bits", "mean_millibits", "lm_bucket")
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(got2 == expected)
  }

  test("bigramSurprise: conditional floor-log2 bits match an independent model") {
    // hot bigram (a b), rarer continuations of 'a', and unique-tail docs
    val docs = Seq(
      1L -> "a b a b a b a b",
      2L -> "a b a c a d",
      3L -> (1 to 50).map(i => s"u$i").mkString(" "),
      4L -> "a b",
      5L -> "x" // single token: no bigram — excluded
    ).toDF("doc_id", "text")
    val toks = Seq(
      1L -> Seq("a", "b", "a", "b", "a", "b", "a", "b"),
      2L -> Seq("a", "b", "a", "c", "a", "d"),
      3L -> (1 to 50).map(i => s"u$i"),
      4L -> Seq("a", "b"))
    // independent model: plain Scala pair counts + bit arithmetic
    val pairs = toks.flatMap { case (id, ts) => ts.sliding(2).map(p => (id, (p(0), p(1)))) }
    val cnt2 = pairs.map(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cnt1 = pairs.map(_._2._1).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val vsz = pairs.map(_._2._2).distinct.size.toLong
    def bits(p: (String, String)): Long =
      63L - java.lang.Long.numberOfLeadingZeros((cnt1(p._1) + vsz) / (cnt2(p) + 1))
    val expected = toks.map { case (id, ts) =>
      val bs = ts.sliding(2).map(p => bits((p(0), p(1)))).toSeq
      val sum = bs.sum
      val mean = sum * 1000 / bs.size
      val bucket = if (mean <= 4290) "head" else if (mean <= 4352) "middle" else "tail"
      (id, bs.size.toLong, sum, mean, bucket)
    }.toSet
    val cols = Seq("doc_id", "n_bigrams", "sum_bits", "mean_millibits", "ppx_bucket")
    val got = PipelineOps.bigramSurprise(docs)
      .select(cols.head, cols.tail: _*)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(got == expected)
    assert(!got.exists(_._1 == 5L)) // bigram-less doc excluded
    // doc 1's (a b) is the modal continuation of 'a' → cheapest mean;
    // doc 3's all-unique chain is maximally surprising per position
    val byId = got.map(r => r._1 -> r._4).toMap
    assert(byId(1L) < byId(2L) && byId(2L) < byId(3L))
    // non-broadcast (shuffle-join) path is result-identical
    val got2 = PipelineOps.bigramSurprise(docs, broadcastLm = false)
      .select(cols.head, cols.tail: _*)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(got2 == expected)
  }

  test("piiRedact: emails and IPs replaced and counted; clean text untouched") {
    val docs = Seq(
      (1L, "write to alice@example.com or bob.smith+x@sub.domain.org today"),
      (2L, "server at 10.0.42.7 and fallback 192.168.1.250 responded"),
      (3L, "no personal data in this row at all"),
      (4L, "mixed: carol@corp.io from 172.16.0.9")
    ).toDF("doc_id", "text")
    val r = PipelineOps.piiRedact(docs)
      .select("doc_id", "clean_text", "n_emails", "n_ips")
      .as[(Long, String, Long, Long)].collect().map(x => x._1 -> x).toMap
    assert(r(1L)._2 == "write to <EMAIL> or <EMAIL> today" && r(1L)._3 == 2 && r(1L)._4 == 0)
    assert(r(2L)._2 == "server at <IP> and fallback <IP> responded" && r(2L)._3 == 0 && r(2L)._4 == 2)
    assert(r(3L)._2 == "no personal data in this row at all" && r(3L)._3 == 0 && r(3L)._4 == 0)
    assert(r(4L)._2 == "mixed: <EMAIL> from <IP>" && r(4L)._3 == 1 && r(4L)._4 == 1)
  }

  test("chunkWindows: independent sliding windows; full coverage + overlap") {
    val docs = Seq(
      (1L, (1 to 20).map(i => s"w$i").mkString(" ")), // 20 toks → starts 0,8,16
      (2L, "a b c"),                                   // short: one window
      (3L, ""),                                        // empty: no chunks
      (4L, (1 to 16).map(i => s"x$i").mkString(" "))   // exactly 2 windows
    ).toDF("doc_id", "text")
    val got = PipelineOps.chunkWindows(docs, windowTokens = 16, stride = 8)
      .as[(Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    // independent formulation: scala sliding over the same analyzer tokens
    val want = Seq(
      1L -> (1 to 20).map(i => s"w$i"),
      2L -> Seq("a", "b", "c"),
      4L -> (1 to 16).map(i => s"x$i")
    ).flatMap { case (id, toks) =>
      (0 to (toks.size - 1) / 8).map { i =>
        val w = toks.slice(i * 8, i * 8 + 16)
        (id, i.toLong, w.size.toLong, w.mkString(" "))
      }
    }
    assert(got == want)
    // coverage: every token index of doc 1 appears in some chunk
    val covered = got.filter(_._1 == 1L)
      .flatMap(c => (c._2 * 8) until (c._2 * 8 + c._3)).toSet
    assert(covered == (0 until 20).toSet)
  }

  test("packSequences: matches the sequential fold; bucket width irrelevant") {
    val rng = new scala.util.Random(7)
    // sparse doc_ids (gaps + a huge id) so bucketing by doc_id range is
    // exercised with uneven buckets; word counts 0..24 (zeros drop out)
    val docs = (0 until 300).map { i =>
      val id = i.toLong * 37 + (if (i == 299) 1L << 40 else 0L)
      (id, Seq.fill(rng.nextInt(25))("w" + rng.nextInt(50)).mkString(" "))
    }.toDF("doc_id", "text")
    val max = 64L
    val got = PipelineOps.packSequences(docs, max, bucketWidth = 256L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // independent sequential fold over the same token counts
    val counts = PipelineOps.tokenCounts(docs).select("doc_id", "n_tokens")
      .as[(Long, Long)].collect().sortBy(_._1).filter(_._2 > 0)
    var p = 0L
    val want = counts.map { case (id, n) =>
      val row = (id, n, p / max, (p + n - 1) / max, p % max)
      p += n
      row
    }.toSeq
    assert(got == want)
    // invariants: offsets < max; a doc spans ceil((offset+n)/max) sequences
    assert(got.forall { case (_, n, f, l, off) =>
      off < max && l - f == (off + n - 1) / max })
    // bucket width is an implementation knob, not a semantic one
    val other = PipelineOps.packSequences(docs, max, bucketWidth = 1L << 20)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(other == got)
  }

  test("decontaminateSpans: removes exactly the collided spans") {
    val bench = Seq((100L, "quick brown fox")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "start words then quick brown fox end words here"),
      (2L, "totally clean document with no overlap at all"),
      (3L, "quick brown fox leads this document"), // collision at position 1
      (4L, "trailing hit quick brown fox"),        // collision at the end
      (5L, "tiny doc")                              // shorter than n: no grams
    ).toDF("doc_id", "text")
    val r = PipelineOps.decontaminateSpans(docs, bench, 3)
      .select("doc_id", "n_toks", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect().map(t => t._1 -> t).toMap
    assert(r(1L)._4 == "start words then end words here" && r(1L)._3 == 3L)
    assert(r(2L)._3 == 0L && r(2L)._4 == "totally clean document with no overlap at all")
    assert(r(3L)._4 == "leads this document")
    assert(r(4L)._4 == "trailing hit")
    assert(r(5L)._3 == 0L && r(5L)._4 == "tiny doc")
  }

  test("decontaminateSpans: overlapping collided grams merge into one span") {
    // bench grams "b c d" and "c d e" overlap in the doc: the union of
    // covered positions must come out, not double-removal or a gap
    val bench = Seq((1L, "b c d"), (2L, "c d e")).toDF("doc_id", "text")
    val docs = Seq((10L, "a b c d e f")).toDF("doc_id", "text")
    val r = PipelineOps.decontaminateSpans(docs, bench, 3)
      .select("n_removed", "clean_text").as[(Long, String)].head()
    assert(r == ((4L, "a f")))
  }

  test("tokenShards: soft budget, doc_id order, partitioning-invariant; sink roundtrip") {
    val docs = (0L until 200L)
      .map(i => (i, Seq.fill(1 + (i % 13).toInt)("w" + i).mkString(" ")))
      .toDF("doc_id", "text")
    val budget = 50L
    val got = PipelineOps.tokenShards(docs, budget)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // independent sequential fold over doc_id order
    var run = 0L
    val want = (0L until 200L).map { i =>
      val n = 1L + i % 13
      val sid = run / budget
      run += n
      (i, n, sid)
    }
    assert(got == want)
    // bucket width and input partitioning are implementation knobs
    assert(PipelineOps.tokenShards(docs.repartition(17), budget, bucketWidth = 16L)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq == want)
    // soft budget: every shard holds < budget + its largest doc
    val byShard = want.groupBy(_._3).values
    assert(byShard.forall(s => s.map(_._2).sum < budget + s.map(_._2).max))
    // consecutive doc ranges per shard (docs never interleave across shards)
    assert(byShard.forall { s =>
      val ids = s.map(_._1).sorted; ids == (ids.head to ids.last)
    })
    // sink: partitioned parquet + manifest agree with the assignment
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    PipelineOps.writeTokenShards(docs, dir, budget)
    val back = spark.read.parquet(dir).select("doc_id", "shard_id")
      .as[(Long, Long)].collect().toMap
    assert(back == want.map(t => t._1 -> t._3).toMap)
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_manifest.json")), "UTF-8")
    val wantShards = want.groupBy(_._3).map { case (k, v) => (k, v.size, v.map(_._2).sum) }
    wantShards.foreach { case (sid, nd, nt) =>
      assert(manifest.contains(s"""{"shard_id": $sid, "docs": $nd, "tokens": $nt}"""))
    }
  }

  test("minHashNewDocs: exact dups always drop, disjoint docs always survive") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "completely different corpus text with many distinct words in here")
    ).toDF("doc_id", "text")
    val newB = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again today"), // == doc 1
      (11L, "zeta eta theta iota kappa lambda mu nu xi omicron pi rho"), // disjoint
      (12L, "completely different corpus text with many distinct words in here")  // == doc 2
    ).toDF("doc_id", "text")
    val kept = PipelineOps.minHashNewDocs(newB, corpus, 0.5)
      .as[Long].collect().toSet
    // identical text -> identical signatures -> certain band collision ->
    // Jaccard 1 -> dropped; zero shared shingles can never verify -> kept
    assert(kept == Set(11L))
    // threshold 1.0+epsilon keeps everything verify-able only at J == 1
    val keptStrict = PipelineOps.minHashNewDocs(newB, corpus, 1.0)
      .as[Long].collect().toSet
    assert(keptStrict == Set(11L))
  }

  test("classifierScore: integer-exact linear model; missing tokens weigh 0") {
    val docs = Seq(
      (1L, "good clean prose here"),
      (2L, "spam spam junk"),
      (3L, "unknown tokens only wow")).toDF("doc_id", "text")
    val weights = Seq(("good", 500L), ("clean", 300L), ("prose", 200L),
      ("spam", -800L), ("junk", -400L)).toDF("tok", "w")
    for (bcast <- Seq(true, false)) {
      val r = PipelineOps.classifierScore(docs, weights, bias = 10L, bcast)
        .select("doc_id", "n_toks", "score", "mean_milli")
        .as[(Long, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
      assert(r(1L) == ((1L, 4L, 1010L, 252500L)))   // 500+300+200+0+10
      assert(r(2L) == ((2L, 3L, -1990L, -663333L))) // -800*2-400+10; trunc toward 0
      assert(r(3L) == ((3L, 4L, 10L, 2500L)))       // all unknown: bias only
    }
  }

  test("exactSubstrDedup: removes every occurrence of a duplicated span") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x y z c d e w v"),  // shares exactly "c d e" with doc 1
      (3L, "p q"),              // shorter than minLen: untouched
      (4L, "m n o m n o m n o") // within-doc repeats: fully duplicated
    ).toDF("doc_id", "text")
    val r = PipelineOps.exactSubstrDedup(docs, minLen = 3)
      .select("doc_id", "n_toks", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect().map(t => t._1 -> t).toMap
    assert(r(1L)._4 == "a b f g h" && r(1L)._3 == 3L)
    assert(r(2L)._4 == "x y z w v" && r(2L)._3 == 3L)
    assert(r(3L) == ((3L, 2L, 0L, "p q")))
    assert(r(4L)._4 == "" && r(4L)._3 == 9L) // every window duplicated
  }

  test("exactSubstrDedup: matches a brute-force oracle on a random corpus") {
    val rnd = new scala.util.Random(20210714L)
    val vocab = Array("t0", "t1", "t2", "t3", "t4", "t5")
    val L = 4
    val corpus = (0L until 40L).map { id =>
      (id, Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    // independent oracle: count every L-window string corpus-wide, then a
    // token survives iff no window covering it has count >= 2
    val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val counts = toks.values.flatMap(_.sliding(L).filter(_.size == L).map(_.mkString(" ")))
      .groupBy(identity).map { case (k, v) => k -> v.size }
    val want = corpus.map { case (id, _) =>
      val ts = toks(id)
      val badStarts = (0 to ts.size - L).filter(p => counts(ts.slice(p, p + L).mkString(" ")) >= 2)
      val kept = ts.zipWithIndex.collect {
        case (t, i) if !badStarts.exists(p => p <= i && i <= p + L - 1) => t
      }
      id -> ((ts.size.toLong, (ts.size - kept.size).toLong, kept.mkString(" ")))
    }.toMap
    val df = corpus.toDF("doc_id", "text")
    for ((bDup, bHits) <- Seq((true, true), (false, false))) {
      val got = PipelineOps.exactSubstrDedup(df, L, bDup, bHits)
        .select("doc_id", "n_toks", "n_removed", "clean_text")
        .as[(Long, Long, Long, String)].collect()
        .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
      assert(got == want, s"broadcastDup=$bDup broadcastHits=$bHits")
    }
  }

  test("dsirWeights: integer-exact vs an independent model; both join paths") {
    val rows = Seq(
      (1L, "en", "alpha beta alpha beta alpha beta"),
      (2L, "en", "alpha beta gamma alpha beta gamma"),
      (3L, "de", "zulu yankee zulu yankee zulu yankee"),
      (4L, "de", "alpha zulu beta yankee gamma xray"),
      (5L, "fr", "alpha alpha alpha beta beta gamma"))
    val docs = rows.toDF("doc_id", "lang", "text")
    // independent plain-Scala model of the documented formula
    val toks = rows.map { case (id, lang, t) => (id, lang == "en", t.split(" ").toSeq) }
    val all = toks.flatMap { case (id, isT, ts) => ts.map(tok => (id, isT, tok)) }
    val cntR = all.groupBy(_._3).map { case (k, v) => k -> v.size.toLong }
    val cntT = all.groupBy(_._3).map { case (k, v) => k -> v.count(_._2).toLong }
    val totalR = cntR.values.sum
    val totalT = cntT.values.sum
    val vocab = cntR.size.toLong
    def fl2(x: Long): Long = (63 - java.lang.Long.numberOfLeadingZeros(x)).toLong
    val want = toks.map { case (id, _, ts) =>
      val br = ts.map(t => fl2(totalR / cntR(t))).sum
      val bt = ts.map(t => fl2((totalT + vocab) / (cntT(t) + 1))).sum
      id -> ((ts.size.toLong, br, bt, br - bt))
    }.toMap
    for (bcast <- Seq(true, false)) {
      val got = PipelineOps.dsirWeights(docs, col("lang") === "en", broadcastLm = bcast)
        .select("doc_id", "n_toks", "sum_bits_raw", "sum_bits_target", "weight_bits")
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
      assert(got == want)
    }
    // directional sanity: the pure-target doc outranks the pure-raw doc
    assert(want(1L)._4 > want(3L)._4)
  }

  test("bloomNewDocs: equals the plain anti-join at any fpp (exactness never rests on the filter)") {
    val corpus = (0L until 500L).map(i => (i, s"corpus document number $i body"))
      .toDF("doc_id", "text")
    val newB = ((0L until 500L by 3).map(i => (i + 10000L, s"corpus document number $i body")) ++
      (0L until 100L).map(i => (i + 20000L, s"fresh new doc $i"))).toDF("doc_id", "text")
    val expected = newB.join(corpus.select("text"), Seq("text"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(expected == (0L until 100L).map(_ + 20000L).toSet)
    // saturated filter (high fpp) and sane filter must both return the
    // exact anti-join, on BOTH hit-fp join paths: the Bloom pass and the
    // broadcast-vs-shuffle semi-join choice only route, never decide
    for (fpp <- Seq(0.5, 0.01); bcast <- Seq(true, false)) {
      val df = PipelineOps.bloomNewDocs(newB, corpus, 500L, fpp,
        broadcastHitFps = bcast)
      val got = df.as[Long].collect().toSet
      assert(got == expected, s"fpp=$fpp bcast=$bcast")
      // the escape hatch must actually change the requested strategy: the
      // hit-fp frame carries the broadcast hint iff broadcastHitFps (the
      // physical join at this toy scale may broadcast either way via AQE
      // size estimation, so assert the hint, not the executed operator)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("LeftSemi"), s"fpp=$fpp bcast=$bcast: no semi-join")
      val hinted = df.queryExecution.analyzed.toString.contains("ResolvedHint")
      assert(hinted == bcast,
        s"broadcastHitFps=$bcast but broadcast hint present=$hinted")
    }
  }

  // independent plain-Scala restatement of the Gopher rule battery
  private def gopherOracle(text: String): (Long, Long, Long, Long, Long, Long, Long, Boolean) = {
    val ws = text.split("\\s+", -1).filter(_.nonEmpty)
    val n = ws.length.toLong
    val sumLen = ws.map(_.length.toLong).sum
    val alpha = ws.count(_.exists(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))).toLong
    val symbols = (text.count(_ == '#') +
      (text.length - text.replace("...", "").length) / 3).toLong
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
      .count(s => ws.exists(_.toLowerCase == s)).toLong
    val ls = text.split("\n", -1)
    val nl = math.max(ls.length, 1).toLong
    val bullets = ls.count { l =>
      val t = l.dropWhile(_ == ' ')
      t.startsWith("- ") || t.startsWith("* ") || t.startsWith("• ") || t.startsWith("# ")
    }.toLong
    val ell = ls.count { l =>
      val t = l.reverse.dropWhile(_ == ' ').reverse
      t.endsWith("...") || t.endsWith("…")
    }.toLong
    val mean = Math.floorDiv(sumLen * 1000, n)
    val alphaM = Math.floorDiv(alpha * 1000, n)
    val symM = Math.floorDiv(symbols * 1000, n)
    val bulM = Math.floorDiv(bullets * 1000, nl)
    val ellM = Math.floorDiv(ell * 1000, nl)
    val keep = n >= 50 && n <= 100000 && mean >= 3000 && mean <= 10000 &&
      symM <= 100 && bulM <= 900 && ellM <= 300 && alphaM >= 800 && stops >= 2
    (n, mean, alphaM, symM, bulM, ellM, stops, keep)
  }

  test("gopherQuality: directed rule flips + fuzz vs an independent oracle") {
    val good = ((1 to 60).map(i => s"document word number$i") :+ "the words that flow")
      .mkString(" ") // >50 words, has 'the' and 'that'
    val directed = Seq(
      (1L, good), // passes every rule
      (2L, (1 to 60).map(_ => "a").mkString(" ")), // mean word len 1000 < 3000
      (3L, "short doc the that"), // < 50 words
      (4L, good + " " + (1 to 30).map(_ => "#").mkString(" ")), // symbol ratio
      (5L, good.split(" ").grouped(4).map("- " + _.mkString(" ")).mkString("\n")), // all bullets
      (6L, good.split(" ").grouped(4).map(_.mkString(" ") + "...").mkString("\n")), // all ellipses
      (7L, (1 to 60).map(i => s"$i 9$i").mkString(" ")), // no alpha words
      (8L, (1 to 60).map(i => s"word$i flows here").mkString(" ")) // no stop words
    ).toDF("doc_id", "text")
    val got = PipelineOps.gopherQuality(directed).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getBoolean(8)))).toMap
    val texts = directed.select("doc_id", "text").as[(Long, String)].collect().toMap
    for ((id, row) <- got) {
      val (n, mean, alphaM, symM, bulM, ellM, stops, keep) = gopherOracle(texts(id))
      assert(row == ((n, mean, alphaM, symM, bulM, ellM, stops, keep)), s"doc $id")
    }
    assert(got(1L)._8, "good doc must pass")
    assert((2L to 8L).forall(i => !got(i)._8), "each directed flip must fail")
    // fuzz: random multi-line docs over a mixed vocab
    val rnd = new scala.util.Random(42)
    val vocab = Array("the", "word", "x", "#", "...", "be", "-", "zz9", "12",
      "longerword", "with", "•")
    val fuzz = (100L until 200L).map { id =>
      val nW = 1 + rnd.nextInt(120)
      val words = Array.fill(nW)(vocab(rnd.nextInt(vocab.length)))
      val text = words.grouped(1 + rnd.nextInt(9))
        .map(_.mkString(" ") + (if (rnd.nextBoolean()) "..." else ""))
        .mkString("\n")
      (id, text)
    }.toDF("doc_id", "text")
    val fGot = PipelineOps.gopherQuality(fuzz).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getBoolean(8)))).toMap
    val fTexts = fuzz.select("doc_id", "text").as[(Long, String)].collect().toMap
    for ((id, text) <- fTexts) {
      val (n, mean, alphaM, symM, bulM, ellM, stops, keep) = gopherOracle(text)
      assert(fGot(id) == ((n, mean, alphaM, symM, bulM, ellM, stops, keep)), s"fuzz doc $id")
    }
  }

  // independent plain-Scala restatement of the C4 line rules
  private def c4Oracle(text: String, minKept: Int): (Long, Long, Boolean, String) = {
    val ls = text.split("\n", -1)
    val kept = ls.filter { l =>
      val r = l.reverse.dropWhile(_ == ' ').reverse
      (r.endsWith(".") || r.endsWith("!") || r.endsWith("?") || r.endsWith("\"")) &&
        l.split(" ", -1).count(_.nonEmpty) >= 3 &&
        !l.toLowerCase.contains("javascript")
    }
    val banned = text.toLowerCase.contains("lorem ipsum") || text.contains("{")
    (ls.length.toLong, kept.length.toLong,
      kept.length >= minKept && !banned, kept.mkString("\n"))
  }

  test("c4LineFilter: line rules, doc bans, clean text; fuzz vs oracle") {
    val base = (1 to 6).map(i => s"this is sentence number $i of the page.").mkString("\n")
    val directed = Seq(
      (1L, base), // all lines kept
      (2L, base + "\nno terminal punctuation here"), // line dropped, doc kept
      (3L, base + "\nplease enable javascript to continue."), // js line dropped
      (4L, base + "\nlorem ipsum dolor sit amet."), // doc banned
      (5L, base + "\nfunction f() { return 1; }"), // '{' bans the doc
      (6L, "too short.\nalso brief!\nok fine?"), // <3 words per line -> 0 kept
      (7L, "one good sentence right here.\nanother good one follows now.") // <5 kept
    ).toDF("doc_id", "text")
    val got = PipelineOps.c4LineFilter(directed).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getString(4))))
      .toMap
    val texts = directed.select("doc_id", "text").as[(Long, String)].collect().toMap
    for ((id, text) <- texts)
      assert(got(id) == c4Oracle(text, 5), s"doc $id")
    assert(got(1L)._3 && !got(4L)._3 && !got(5L)._3 && !got(6L)._3 && !got(7L)._3)
    assert(got(2L)._3 && got(2L)._2 == 6L) // dropped line doesn't ban the doc
    // fuzz
    val rnd = new scala.util.Random(7)
    val ends = Array(".", "!", "?", "\"", "", "...", " ")
    val fill = Array("alpha", "beta", "javascript", "{", "lorem ipsum", "x")
    val fuzz = (100L until 200L).map { id =>
      val nL = 1 + rnd.nextInt(10)
      val text = (1 to nL).map { _ =>
        val w = 1 + rnd.nextInt(6)
        Array.fill(w)(fill(rnd.nextInt(fill.length))).mkString(" ") + ends(rnd.nextInt(ends.length))
      }.mkString("\n")
      (id, text)
    }.toDF("doc_id", "text")
    val fGot = PipelineOps.c4LineFilter(fuzz, minKeptLines = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getString(4))))
      .toMap
    val fTexts = fuzz.select("doc_id", "text").as[(Long, String)].collect().toMap
    for ((id, text) <- fTexts)
      assert(fGot(id) == c4Oracle(text, 2), s"fuzz doc $id")
  }
}
