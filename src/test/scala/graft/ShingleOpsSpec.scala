package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.ShingleOps
import graft.ops.PipelineOps

/** The native shingle/minhash kernel expressions must be value-identical to
  * the SQL-fragment compositions they replace — the DuckDB oracle re-derives
  * LSH candidates from the same md5 arithmetic, so any drift here flips
  * oracle rows, not just perf.
  */
class ShingleOpsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  /** Corpus slice plus adversarial edge rows (empty text, pure punctuation,
    * <3 tokens, a >=40-char token that the length filter must drop,
    * duplicated shingles).
    */
  private lazy val docs = {
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(200)
    val edges = spark.createDataFrame(Seq(
      (100001L, ""),
      (100002L, "...!!!  --  "),
      (100003L, "one"),
      (100004L, "one two"),
      (100005L, "one two three two three one one two three"),
      (100006L, ("x" * 45) + " pad left right " + ("y" * 39)),
      (100007L, "Tab\tand\nNewLine MIXED case 123abc"))).toDF("doc_id", "text")
    base.unionByName(edges)
  }

  test("sql_tokens == filter/split/lower expr form, order included") {
    val hof = docs.select(col("doc_id"), expr(PipelineOps.TokensExprSpark).as("t"))
    val native = docs.select(col("doc_id"), ShingleOps.sql_tokens(col("text")).as("t"))
    val h = hof.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val n = native.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(h.keySet == n.keySet)
    for ((k, v) <- h) assert(n(k) == v, s"doc $k")
    // tf via size - size(array_remove) == filter-count (the bm25Df form)
    val tfPair = docs.select(
      size(expr(s"filter(${PipelineOps.TokensExprSpark}, x -> x = 'the')")).as("a"),
      (size(ShingleOps.sql_tokens(col("text"))) -
        size(array_remove(ShingleOps.sql_tokens(col("text")), "the"))).as("b"))
    assert(tfPair.where(col("a") =!= col("b")).count() == 0L)
  }

  test("distinct_shingles == array_distinct(HOF shingle expr), order included") {
    val hof = PipelineOps.withShingles(docs).select(col("doc_id"), col("sh"))
    val native = docs.select(col("doc_id"), ShingleOps.distinct_shingles(col("text")).as("sh"))
    val h = hof.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val n = native.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(h.keySet == n.keySet)
    for ((k, v) <- h) assert(n(k) == v, s"doc $k")
  }

  test("minhash_sigs == HOF composition (md5-conv affine minima), bit-exact") {
    val a = PipelineOps.MinHashA
    val b = PipelineOps.MinHashB
    val p = PipelineOps.MinHashP
    val hofCols = a.indices.map { i =>
      expr(s"array_min(transform(hh, h -> (h * ${a(i)}L + ${b(i)}L) % ${p}L))").as(s"mh$i")
    }
    val hof = PipelineOps.withShingles(docs)
      .withColumn("hh", expr("transform(sh, tok -> " + PipelineOps.TokHashSpark + ")"))
      .select(col("doc_id") +: hofCols: _*)
      .collect()
      .map(r => r.getLong(0) -> a.indices.map(i => r.getLong(1 + i)))
      .toMap
    val native = docs.select(col("doc_id"), ShingleOps.minhash_sigs(col("text")).as("mhs"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toIndexedSeq)
      .toMap
    assert(hof.keySet == native.keySet)
    for ((k, v) <- hof) assert(native(k) == v, s"doc $k")
  }

  test("shingle_xxhashes == transform(sh, xxhash64) (seed 42), order included") {
    val hof = PipelineOps.withShingles(docs)
      .select(col("doc_id"), transform(col("sh"), s => xxhash64(s)).as("hs"))
    val native = docs.select(col("doc_id"), ShingleOps.shingle_xxhashes(col("text")).as("hs"))
    val h = hof.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val n = native.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(h.keySet == n.keySet)
    for ((k, v) <- h) assert(n(k) == v, s"doc $k")
  }

  test("SQL registration: minhash_sigs usable from spark.sql") {
    ShingleOps.register(spark)
    docs.limit(5).createOrReplaceTempView("shingle_spec_docs")
    val rows = spark.sql(
      "SELECT doc_id, minhash_sigs(text) AS mhs, size(distinct_shingles(text)) AS nsh " +
        "FROM shingle_spec_docs").collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getSeq[Long](1).length == PipelineOps.MinHashA.length))
  }
}
