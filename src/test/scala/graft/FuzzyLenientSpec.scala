package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.index._
import graft.search._

/** Transposition-cost-one fuzzy (the reference's fuzzy_query.rs:329 test
  * scenario) and lenient query parsing.
  */
class FuzzyLenientSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("osa distance: transposition costs one") {
    assert(Searcher.osaDistance("jaapn", "japan") == 1) // one adjacent swap (ref test case)
    assert(Searcher.osaDistance("japan", "japna") == 1) // adjacent swap
    assert(Searcher.osaDistance("japan", "japan") == 0)
    assert(Searcher.osaDistance("abc", "cab") == 2)
    assert(Searcher.osaDistance("abcd", "acbd") == 1)
  }

  test("fuzzy with transposition_cost_one matches swapped terms at d=1") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fuzzy").toString
    val rows = Seq(("u0", "japan tokyo"), ("u1", "spain madrid"), ("u2", "jaapn typo"))
      .toDF("url", "text")
      .withColumn("lang", lit("en"))
      .withColumn("warc_ts", to_timestamp(lit("2025-01-01 00:00:00")))
    IndexBuilder.build(spark, rows, dir, IndexConfig(numPartitions = 1))
    val s = new Searcher(spark, dir)
    def urls(q: Query): Set[String] = {
      s.allMatches(q, scored = false).join(s.docmapDF, Seq("segment", "docId"))
        .select("url").as[String].collect().toSet
    }
    // "japna" is one transposition from "japan": matches only with the option
    assert(urls(Query.Fuzzy("text", "japna", 1, transpositionCostOne = true))
      .contains("u0"))
    assert(!urls(Query.Fuzzy("text", "japna", 1)).contains("u0"))
    // both metrics agree on plain single-edit typos
    assert(urls(Query.Fuzzy("text", "spainn", 1)).contains("u1"))
    assert(urls(Query.Fuzzy("text", "spainn", 1, transpositionCostOne = true))
      .contains("u1"))
  }

  test("lenient parse salvages a broken query") {
    val p = new QueryParser("text")
    val (q1, errs1) = p.parseLenient("spark AND (table")
    assert(errs1.nonEmpty)
    assert(q1 != Query.Nothing)
    val (q2, errs2) = p.parseLenient("\"unterminated phrase")
    assert(errs2.nonEmpty && q2 != Query.Nothing)
    // a valid query parses with no errors, identically to parse()
    val (q3, errs3) = p.parseLenient("spark AND table")
    assert(errs3.isEmpty && q3 == p.parse("spark AND table"))
  }
}
