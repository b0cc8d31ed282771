package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.Analyzer
import graft.corpus.WebCorpus
import graft.index._
import graft.search._

/** Typed term encoding (order-preserving long/double/date maps) and
  * in-engine typed RangeQuery: kernels walk their own segment dictionary and
  * union postings into a bitset — checked against a driver-side brute-force
  * oracle, before and after segment merge.
  */
class TypedRangeSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("encodings preserve order and roundtrip") {
    val longs = Seq(Long.MinValue, -1000000007L, -100L, -1L, 0L, 1L, 42L,
      1L << 40, Long.MaxValue)
    val le = longs.map(TypedTerms.encodeLong)
    assert(le == le.sorted)
    assert(le.forall(_.length == 16))
    longs.foreach(v => assert(TypedTerms.decodeLong(TypedTerms.encodeLong(v)) == v))

    val doubles = Seq(Double.NegativeInfinity, -1e300, -2.5, -1e-300, -0.0,
      0.0, 1e-300, 1.0, 2.5, 1e300, Double.PositiveInfinity)
    val de = doubles.map(TypedTerms.encodeDouble)
    assert(de == de.sorted)
    doubles.foreach(v => assert(TypedTerms.decodeDouble(TypedTerms.encodeDouble(v)) == v))

    val ts = java.sql.Timestamp.valueOf("2025-03-04 05:06:07.123456789")
    assert(TypedTerms.timestampMicros(ts) % 1000000L == 123456L)

    assert(TypedTerms.encodeBool(false) < TypedTerms.encodeBool(true))

    // IPs: v4 maps into ::ffff:a.b.c.d, v4/v6 interleave in address order
    val ips = Seq("0.0.0.0", "9.255.255.255", "10.0.0.1", "172.16.254.3",
      "192.168.0.1", "255.255.255.255")
    val ie = ips.map(TypedTerms.encodeIp)
    assert(ie == ie.sorted)
    assert(ie.forall(_.length == 32))
    ips.foreach(ip => assert(TypedTerms.decodeIp(TypedTerms.encodeIp(ip)) == ip))
    val v6 = Seq("::1", "2001:db8::8a2e:370:7334", "fe80::1",
      "ffff:ffff:ffff:ffff:ffff:ffff:ffff:ffff")
    val v6e = v6.map(TypedTerms.encodeIp)
    assert(v6e == v6e.sorted)
    v6.foreach(ip => assert(TypedTerms.decodeIp(TypedTerms.encodeIp(ip)) ==
      java.net.InetAddress.getByName(ip).getHostAddress))
    // v4 space sits inside v6 order between ::1 and fe80::
    assert(TypedTerms.encodeIp("::1") < TypedTerms.encodeIp("0.0.0.0"))
    assert(TypedTerms.encodeIp("255.255.255.255") < TypedTerms.encodeIp("fe80::1"))
  }

  test("typed range inside boolean engine query == brute-force oracle; survives merge") {
    import spark.implicits._
    val n = 400
    val dir = java.nio.file.Files.createTempDirectory("graft-typed").toString
    val src = WebCorpus.generate(spark, n.toLong, 3).toDF()
      .withColumn("nlen", length(col("text")).cast("long"))
    IndexBuilder.build(spark, src, dir, IndexConfig(numPartitions = 4, longFields = Seq("nlen")))

    val corpus: Map[String, (Seq[String], Long)] = (0L until n.toLong).map { i =>
      val d = WebCorpus.genDoc(i)
      d.url -> ((Analyzer.terms(d.text).toSeq, d.text.length.toLong))
    }.toMap

    def engineUrls(q: Query): Set[String] = {
      val s = new Searcher(spark, dir)
      s.allMatches(q, scored = false).join(s.docmapDF, Seq("segment", "docId"))
        .select("url").as[String].collect().toSet
    }
    def oracleUrls(tok: Option[String], lo: Option[Long], hi: Option[Long],
        loInc: Boolean = true, hiInc: Boolean = true): Set[String] =
      corpus.collect { case (u, (toks, len))
        if tok.forall(toks.contains) &&
          lo.forall(v => if (loInc) len >= v else len > v) &&
          hi.forall(v => if (hiInc) len <= v else len < v) => u
      }.toSet

    val lens = corpus.values.map(_._2)
    val (lo, hi) = (lens.min + (lens.max - lens.min) / 4, lens.min + 3 * (lens.max - lens.min) / 4)

    def checkAll(): Unit = {
      // bare typed range
      assert(engineUrls(Query.longRange("nlen", Some(lo), Some(hi))) ==
        oracleUrls(None, Some(lo), Some(hi)))
      // inside a boolean MUST with a scored text term
      assert(engineUrls(Query.must(Query.Term("text", "alpha"),
        Query.longRange("nlen", Some(lo), Some(hi)))) ==
        oracleUrls(Some("alpha"), Some(lo), Some(hi)))
      // exclusive bounds + open ends
      assert(engineUrls(Query.longRange("nlen", Some(lo), Some(hi),
        loInclusive = false, hiInclusive = false)) ==
        oracleUrls(None, Some(lo), Some(hi), loInc = false, hiInc = false))
      assert(engineUrls(Query.longRange("nlen", None, Some(lo))) ==
        oracleUrls(None, None, Some(lo)))
      assert(engineUrls(Query.longRange("nlen", Some(hi), None)) ==
        oracleUrls(None, Some(hi), None))
      // count path and batch path agree
      val s = new Searcher(spark, dir)
      val q = Query.longRange("nlen", Some(lo), Some(hi))
      assert(s.count(q) == oracleUrls(None, Some(lo), Some(hi)).size)
      val hits = s.batchTopDocs(Seq(Query.must(Query.Term("text", "alpha"), q)), 5).head
      assert(hits.forall { h =>
        val (toks, len) = corpus(h.url); toks.contains("alpha") && len >= lo && len <= hi
      })
    }
    checkAll()
    SegmentMerger.mergeUntilStable(spark, dir,
      SegmentMerger.LogMergePolicy(minNumSegments = 2, maxFanIn = 4))
    checkAll()
  }

  test("ip field: term + range queries across mixed v4/v6, lenient on junk") {
    import spark.implicits._
    val n = 300
    // deterministic mixed corpus: mostly v4, every 7th v6, every 50th junk
    def ipOf(i: Long): String =
      if (i % 50 == 0) "not-an-ip"
      else if (i % 7 == 0) f"2001:db8::${i}%x"
      else s"10.${(i / 256) % 256}.${i % 256}.7"
    val dir = java.nio.file.Files.createTempDirectory("graft-ip").toString
    val idOf: String => Long = _.takeRight(8).toLong // .../p%08d url suffix
    val src = WebCorpus.generate(spark, n.toLong, 3).toDF()
      .withColumn("ip", udf((u: String) => ipOf(idOf(u))).apply(col("url")))
    IndexBuilder.build(spark, src, dir, IndexConfig(numPartitions = 4, ipFields = Seq("ip")))

    // independent oracle: v6-mapped 16-byte unsigned lexicographic order
    def key(addr: String): IndexedSeq[Int] = {
      val b = java.net.InetAddress.getByName(addr).getAddress
      val full = if (b.length == 16) b
        else Array.fill[Byte](10)(0) ++ Array[Byte](-1, -1) ++ b
      full.map(_ & 0xff).toIndexedSeq
    }
    import scala.math.Ordering.Implicits._
    def oracle(lo: String, hi: String, loInc: Boolean, hiInc: Boolean): Set[Long] =
      (0L until n.toLong).filter { i =>
        val a = ipOf(i)
        a != "not-an-ip" && {
          val k = key(a)
          (if (loInc) k >= key(lo) else k > key(lo)) &&
            (if (hiInc) k <= key(hi) else k < key(hi))
        }
      }.toSet
    def engineIds(q: Query): Set[Long] = {
      val s = new Searcher(spark, dir)
      s.allMatches(q, scored = false).join(s.docmapDF, Seq("segment", "docId"))
        .select("url").as[String].collect().map(idOf).toSet
    }
    // v4-only window
    assert(engineIds(Query.ipRange("ip", Some("10.0.64.0"), Some("10.0.192.255"))) ==
      oracle("10.0.64.0", "10.0.192.255", loInc = true, hiInc = true))
    // window spanning the whole v4 space: every v4 doc, no v6 doc
    assert(engineIds(Query.ipRange("ip", Some("0.0.0.0"), Some("255.255.255.255"))) ==
      oracle("0.0.0.0", "255.255.255.255", loInc = true, hiInc = true))
    // v6-only window; exclusive upper
    assert(engineIds(Query.ipRange("ip", Some("2001:db8::"), Some("2001:db8::ff"),
        loInclusive = true, hiInclusive = false)) ==
      oracle("2001:db8::", "2001:db8::ff", loInc = true, hiInc = false))
    // exact term (v4 and v6 literal forms); 1 and 7 are not junk/v6-v4 swaps
    assert(engineIds(Query.ipTerm("ip", "10.0.1.7")) == Set(1L))
    assert(engineIds(Query.ipTerm("ip", "2001:db8::7")) == Set(7L))
    // junk rows indexed nothing: doc 0 matches no ip query at all
    assert(!engineIds(Query.ipRange("ip", Some("::"), None)).contains(0L))
  }

  test("bytes field: exact term + unsigned-order ranges, survives merge") {
    import spark.implicits._
    // encoding: lexicographic hex order == unsigned byte order, incl. the
    // sign-bit corner (0x7f < 0x80) and prefix-extension (ab < ab00)
    val vals = Seq(Array[Byte](), Array[Byte](0), Array[Byte](0, 1),
      Array[Byte](0x7f), Array[Byte](0x7f, -1), Array[Byte](-128),
      Array[Byte](-1), Array[Byte](-1, 0))
    val enc = vals.map(TypedTerms.encodeBytes)
    assert(enc == enc.sorted)
    vals.foreach(v => assert(
      java.util.Arrays.equals(TypedTerms.decodeBytes(TypedTerms.encodeBytes(v)), v)))

    val n = 300
    val dir = java.nio.file.Files.createTempDirectory("graft-bytes").toString
    val idOf: String => Long = _.takeRight(8).toLong
    // 2-byte big-endian digest column: unsigned order == doc_id order, and
    // high bytes >= 0x80 exercise signed-byte pitfalls
    def digOf(i: Long): Array[Byte] =
      Array[Byte]((((i * 37) % 256) - 128).toByte, (i % 256).toByte)
    val src = WebCorpus.generate(spark, n.toLong, 3).toDF()
      .withColumn("dig", udf((u: String) => digOf(idOf(u))).apply(col("url")))
    IndexBuilder.build(spark, src, dir,
      IndexConfig(numPartitions = 4, bytesFields = Seq("dig")))

    import scala.math.Ordering.Implicits._
    def key(b: Array[Byte]): IndexedSeq[Int] = b.map(_ & 0xff).toIndexedSeq
    def oracle(lo: Array[Byte], hi: Array[Byte], hiInc: Boolean): Set[Long] =
      (0L until n.toLong).filter { i =>
        val k = key(digOf(i))
        k >= key(lo) && (if (hiInc) k <= key(hi) else k < key(hi))
      }.toSet
    def engineIds(q: Query): Set[Long] = {
      val s = new Searcher(spark, dir)
      s.allMatches(q, scored = false).join(s.docmapDF, Seq("segment", "docId"))
        .select("url").as[String].collect().map(idOf).toSet
    }
    def checkAll(): Unit = {
      // exact term: digOf has period 256, so doc 50's digest is unique in
      // [0, 300) (50 + 256 >= n)
      assert(engineIds(Query.bytesTerm("dig", digOf(50))) == Set(50L))
      // range crossing the signed-byte boundary (0x70.. to 0x90..)
      val (lo, hi) = (Array[Byte](0x70, 0), Array[Byte](-112, -1))
      assert(engineIds(Query.bytesRange("dig", Some(lo), Some(hi))) ==
        oracle(lo, hi, hiInc = true))
      // exclusive upper + inside a boolean MUST with a scored text term
      assert(engineIds(Query.bytesRange("dig", Some(lo), Some(hi),
        hiInclusive = false)) == oracle(lo, hi, hiInc = false))
      val withTok = engineIds(Query.must(Query.Term("text", "alpha"),
        Query.bytesRange("dig", Some(lo), Some(hi))))
      assert(withTok.subsetOf(oracle(lo, hi, hiInc = true)) && withTok.nonEmpty)
    }
    checkAll()
    SegmentMerger.mergeUntilStable(spark, dir,
      SegmentMerger.LogMergePolicy(minNumSegments = 2, maxFanIn = 4))
    checkAll()
  }
}
