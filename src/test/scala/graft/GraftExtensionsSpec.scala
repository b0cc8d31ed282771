package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** SQL function surface: tantivy_tokenize / porter_stem /
  * ddsketch_percentiles registered and runnable from spark.sql.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  lazy val spark = {
    val s = TestSpark.spark
    GraftFunctions.registerAll(s)
    s
  }

  test("tantivy_tokenize and porter_stem from SQL, inside codegen") {
    import spark.implicits._
    val out = spark.sql(
      "SELECT transform(tantivy_tokenize('The Relational engines, hopping!'), t -> porter_stem(t)) AS ts")
      .as[Seq[String]].head()
    assert(out == Seq("the", "relat", "engin", "hop"))
  }

  test("en_stem (Porter2/Snowball english) from SQL") {
    import spark.implicits._
    val out = spark.sql(
      "SELECT transform(tantivy_tokenize('National conditional studies, hopping!'), t -> en_stem(t)) AS ts")
      .as[Seq[String]].head()
    assert(out == Seq("nation", "condit", "studi", "hop"))
  }

  test("snowball_stem from SQL with a literal language") {
    import spark.implicits._
    val out = spark.sql(
      "SELECT transform(tantivy_tokenize('Häuser laufen schneller!'), t -> snowball_stem(t, 'german')) AS ts")
      .as[Seq[String]].head()
    assert(out == Seq("haus", "lauf", "schnell"))
    // english routes to the Porter2 implementation
    val en = spark.sql("SELECT snowball_stem('conditional', 'english') AS s").as[String].head()
    assert(en == "condit")
    intercept[Exception](spark.sql("SELECT snowball_stem('x', 'klingon')").collect())
  }

  test("ddsketch_percentiles from SQL with literal percents and defaults") {
    import spark.implicits._
    (1 to 1000).map(_.toDouble).toDF("v").createOrReplaceTempView("vals")
    val got = spark.sql("SELECT ddsketch_percentiles(v, array(50.0, 99.0)) FROM vals")
      .as[Seq[Double]].head()
    assert(math.abs(got(0) - 500.0) <= 0.02 * 500.0)
    assert(math.abs(got(1) - 990.0) <= 0.02 * 990.0)
    val defaults = spark.sql("SELECT ddsketch_percentiles(v) FROM vals").as[Seq[Double]].head()
    assert(defaults.length == 7) // ES default percents
    // grouped usage
    val grouped = spark.sql(
      "SELECT v % 2 AS g, ddsketch_percentiles(v, array(50.0)) AS p FROM vals GROUP BY v % 2")
    assert(grouped.count() == 2)
  }

  test("extensions class applies the same registrations") {
    // builder-level smoke: the class must be constructible and apply cleanly
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // throws on malformed injection
  }
}
