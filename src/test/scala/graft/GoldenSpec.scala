package graft

import org.scalatest.funsuite.AnyFunSuite

/** Golden pin (FIXTURES.md §3): the committed reference-query-set results —
  * (rank, url, exact f32 score bits) for top-10 over the 10k-doc corpus —
  * must reproduce verbatim. Any change to tokenizer, codec, scoring, WAND,
  * tie-breaking, partitioning, or merge order shows up here.
  */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("reference query set reproduces the committed goldens bit-for-bit") {
    val goldenPath = java.nio.file.Paths.get("src/test/resources/golden/queries.json")
    assume(java.nio.file.Files.exists(goldenPath), "golden file not generated yet")
    val dir = graft.tools.GoldenGen.buildIndex(spark)
    val fresh = graft.tools.GoldenGen.toJson(graft.tools.GoldenGen.run(spark, dir))
    val committed = java.nio.file.Files.readString(goldenPath)
    assert(fresh == committed,
      "golden mismatch — scoring/ranking semantics changed; regenerate " +
        "with runMain graft.tools.GoldenGen ONLY if the change is intended")
  }
}
