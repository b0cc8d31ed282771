package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Elasticsearch-compatible JSON aggregation requests, compiled to Catalyst
  * plans — the `src/aggregation/` module of the reference
  * (`/root/reference/src/aggregation/agg_req.rs:55,120` request tree;
  * bucket aggs with nested sub-aggregations, metric leaves).
  *
  * Where the reference runs segment collection -> intermediate merge ->
  * final (`segment_agg_result.rs` / `intermediate_agg_result.rs`), we hand
  * the identical tree to Catalyst: buckets become groupBy keys, metrics
  * become aggregate expressions, and Spark's partial aggregation IS the
  * per-segment/intermediate/final pipeline. Each bucket path compiles to one
  * DataFrame (flattened buckets: one row per leaf bucket, keys as columns).
  *
  * Supported: terms (size, min_doc_count), histogram (interval, offset),
  * date_histogram (fixed_interval as duration), range, filter;
  * metrics: avg, min, max, sum, value_count, stats, percentiles,
  * cardinality (exact and approx).
  */
object AggRequest {

  sealed trait Node
  final case class Terms(field: String, size: Int, minDocCount: Long,
      subs: Map[String, Node], missing: Option[String] = None) extends Node
  final case class Histogram(field: String, interval: Double, offset: Double,
      subs: Map[String, Node],
      extendedBounds: Option[(Double, Double)] = None) extends Node
  final case class DateHistogram(field: String, intervalExpr: String,
      subs: Map[String, Node]) extends Node
  final case class RangeAgg(field: String, ranges: Seq[(Option[Double], Option[Double])],
      subs: Map[String, Node]) extends Node
  final case class FilterAgg(predicate: String, subs: Map[String, Node]) extends Node
  final case class Metric(kind: String, field: String, percents: Seq[Double],
      sketch: Boolean = false) extends Node

  import org.json4s._
  import org.json4s.jackson.JsonMethods

  /** Parse the ES-style {"aggs": {name: {type: {...}, "aggs": {...}}}} tree. */
  def parse(json: String): Map[String, Node] = {
    val root = JsonMethods.parse(json)
    val aggs = root \ "aggs" match {
      case JNothing => root
      case a => a
    }
    parseAggs(aggs)
  }

  private def parseAggs(j: JValue): Map[String, Node] = j match {
    case JObject(fields) => fields.map { case (name, spec) => name -> parseNode(spec) }.toMap
    case _ => Map.empty
  }

  private def str(j: JValue, k: String): Option[String] =
    (j \ k) match { case JString(s) => Some(s); case _ => None }
  private def num(j: JValue, k: String): Option[Double] = (j \ k) match {
    case JInt(i) => Some(i.toDouble)
    case JDouble(d) => Some(d)
    case JLong(l) => Some(l.toDouble)
    case _ => None
  }

  private def parseNode(spec: JValue): Node = {
    val subs = parseAggs(spec \ "aggs")
    val metricKinds = Seq("avg", "min", "max", "sum", "value_count", "stats",
      "extended_stats", "percentiles", "cardinality")
    metricKinds.collectFirst {
      case k if (spec \ k) != JNothing =>
        val body = spec \ k
        val pcts = (body \ "percents") match {
          case JArray(vs) => vs.collect { case JInt(i) => i.toDouble; case JDouble(d) => d }
          case _ => Seq(1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0) // ES defaults
        }
        val sk = (body \ "sketch") match { case JBool(b) => b; case _ => false }
        Metric(k, str(body, "field").getOrElse(""), pcts, sk)
    }.getOrElse {
      if ((spec \ "terms") != JNothing) {
        val b = spec \ "terms"
        Terms(str(b, "field").get, num(b, "size").map(_.toInt).getOrElse(10),
          num(b, "min_doc_count").map(_.toLong).getOrElse(1L), subs,
          missing = str(b, "missing"))
      } else if ((spec \ "histogram") != JNothing) {
        val b = spec \ "histogram"
        val eb = (b \ "extended_bounds") match {
          case JNothing => None
          case ebj =>
            for (lo <- num(ebj, "min"); hi <- num(ebj, "max")) yield (lo, hi)
        }
        Histogram(str(b, "field").get, num(b, "interval").get,
          num(b, "offset").getOrElse(0.0), subs, eb)
      } else if ((spec \ "date_histogram") != JNothing) {
        val b = spec \ "date_histogram"
        DateHistogram(str(b, "field").get,
          str(b, "fixed_interval").orElse(str(b, "calendar_interval")).getOrElse("1 day"), subs)
      } else if ((spec \ "range") != JNothing) {
        val b = spec \ "range"
        val ranges = (b \ "ranges") match {
          case JArray(rs) => rs.map(r => (num(r, "from"), num(r, "to")))
          case _ => Seq.empty
        }
        RangeAgg(str(b, "field").get, ranges, subs)
      } else if ((spec \ "filter") != JNothing) {
        FilterAgg(str(spec \ "filter", "query_string").getOrElse("true"), subs)
      } else throw new IllegalArgumentException(s"unsupported agg: $spec")
    }
  }

  /** Compile one named agg tree over `df`. Returns name -> flattened bucket
    * DataFrame (bucket key columns along the path + metric columns + doc_count).
    */
  def compile(df: DataFrame, aggs: Map[String, Node]): Map[String, DataFrame] =
    aggs.map { case (name, node) => name -> compileOne(df, name, node, Nil) }

  def run(df: DataFrame, json: String): Map[String, DataFrame] = compile(df, parse(json))

  private def metricColumns(name: String, m: Metric): Seq[Column] = m.kind match {
    case "avg" => Seq(avg(m.field).as(s"${name}_avg"))
    case "min" => Seq(min(m.field).as(s"${name}_min"))
    case "max" => Seq(max(m.field).as(s"${name}_max"))
    case "sum" => Seq(sum(m.field).as(s"${name}_sum"))
    case "value_count" => Seq(count(col(m.field)).as(s"${name}_count"))
    case "stats" => Seq(
      count(col(m.field)).as(s"${name}_count"), min(m.field).as(s"${name}_min"),
      max(m.field).as(s"${name}_max"), avg(m.field).as(s"${name}_avg"),
      sum(m.field).as(s"${name}_sum"))
    case "extended_stats" => Seq(
      // ES extended_stats: stats + sum_of_squares + population variance/std
      // (extended_stats.rs in the reference aggregation module)
      count(col(m.field)).as(s"${name}_count"), min(m.field).as(s"${name}_min"),
      max(m.field).as(s"${name}_max"), avg(m.field).as(s"${name}_avg"),
      sum(m.field).as(s"${name}_sum"),
      sum(col(m.field) * col(m.field)).as(s"${name}_sum_of_squares"),
      var_pop(m.field).as(s"${name}_variance"),
      stddev_pop(m.field).as(s"${name}_std_deviation"))
    case "percentiles" if m.sketch =>
      // the reference's sketch family (DDSketch, percentiles.rs:217-227);
      // one array-valued aggregate, split into per-percent columns
      val arr = DDSketch.percentilesAgg(col(m.field), m.percents).as(s"__${name}_pcts")
      Seq(arr) // split post-agg in aggregateAt via percentColumns
    case "percentiles" => m.percents.map(p =>
      expr(s"percentile(${m.field}, ${p / 100.0})").as(s"${name}_p${p.toInt}"))
    case "cardinality" => Seq(approx_count_distinct(m.field).as(s"${name}_cardinality"))
    case other => throw new IllegalArgumentException(s"metric $other")
  }

  private def compileOne(df: DataFrame, name: String, node: Node,
      groupCols: List[(String, Column)]): DataFrame = node match {
    case m: Metric =>
      expandSketch(
        aggregateAt(df, groupCols, metricColumns(name, m), sortKeys = groupCols.map(_._1)),
        Seq(name -> m))
    case Terms(field, size, minDocCount, subs, missing) =>
      // ES `missing`: null keys fall into the given bucket value
      val keyCol = missing.map(mv => coalesce(col(field), lit(mv))).getOrElse(col(field))
      val keyed = (s"${name}_key", keyCol)
      val out = withSubs(df, groupCols :+ keyed, subs)
        .where(col("doc_count") >= minDocCount)
      if (groupCols.isEmpty)
        out.orderBy(col("doc_count").desc, col(keyed._1)).limit(size)
      else out // nested terms: size applies per parent bucket; left unbounded (flat form)
    case Histogram(field, interval, offset, subs, extendedBounds) =>
      val bucket = (floor((col(field) - offset) / interval) * interval + offset).as(s"${name}_key")
      val out = withSubs(df, groupCols :+ ((s"${name}_key", bucket)), subs)
      val bounded = extendedBounds match {
        case Some((lo, hi)) if groupCols.isEmpty =>
          // ES extended_bounds: materialize empty buckets across [min, max]
          val loB = math.floor((lo - offset) / interval) * interval + offset
          val n = math.floor((hi - loB) / interval).toLong
          val allBuckets = df.sparkSession.range(n + 1)
            .select((lit(loB) + col("id") * interval).as(s"${name}_key"))
          allBuckets.join(out, Seq(s"${name}_key"), "full_outer")
            .withColumn("doc_count", coalesce(col("doc_count"), lit(0L)))
        case _ => out
      }
      bounded.orderBy(groupCols.map(c => col(c._1)) :+ col(s"${name}_key"): _*)
    case DateHistogram(field, interval, subs) =>
      val bucket = window(col(field).cast("timestamp"), interval).getField("start").as(s"${name}_key")
      withSubs(df, groupCols :+ ((s"${name}_key", bucket)), subs)
    case RangeAgg(field, ranges, subs) =>
      val c = col(field)
      val key = ranges.foldLeft(lit(null).cast("string")) { case (acc, (from, to)) =>
        val cond = (from.map(c >= _).getOrElse(lit(true))) && (to.map(c < _).getOrElse(lit(true)))
        val label = s"${from.map(_.toString).getOrElse("*")}-${to.map(_.toString).getOrElse("*")}"
        when(cond, lit(label)).otherwise(acc)
      }.as(s"${name}_key")
      withSubs(df.where(ranges.map { case (f, t) =>
        (f.map(c >= _).getOrElse(lit(true))) && (t.map(c < _).getOrElse(lit(true)))
      }.reduce(_ || _)), groupCols :+ ((s"${name}_key", key)), subs)
    case FilterAgg(pred, subs) =>
      withSubs(df.where(expr(pred)), groupCols, subs)
  }

  /** Group by the accumulated bucket keys, computing doc_count plus all
    * metric leaves of `subs`; recurse into nested bucket subs.
    */
  private def withSubs(df: DataFrame, groupCols: List[(String, Column)],
      subs: Map[String, Node]): DataFrame = {
    val (metricSubs, bucketSubs) = subs.partition(_._2.isInstanceOf[Metric])
    if (bucketSubs.nonEmpty) {
      // flatten: nested bucket path recurses; metrics at this level ignored
      // unless no deeper bucket (flat-output design: deepest path wins)
      val (subName, subNode) = bucketSubs.head
      compileOne(df, subName, subNode, groupCols)
    } else {
      val metricCols = metricSubs.toSeq.flatMap { case (n, m) =>
        metricColumns(n, m.asInstanceOf[Metric])
      }
      expandSketch(
        aggregateAt(df, groupCols, metricCols, groupCols.map(_._1)),
        metricSubs.toSeq.map { case (n, m) => n -> m.asInstanceOf[Metric] })
    }
  }

  /** Split each sketch-percentiles array column into per-percent columns
    * (same output shape as the exact path).
    */
  private def expandSketch(df: DataFrame, metrics: Seq[(String, Metric)]): DataFrame =
    metrics.filter(nm => nm._2.kind == "percentiles" && nm._2.sketch).foldLeft(df) {
      case (d, (n, m)) =>
        m.percents.zipWithIndex.foldLeft(d) { case (dd, (p, i)) =>
          dd.withColumn(s"${n}_p${p.toInt}", col(s"__${n}_pcts")(i))
        }.drop(s"__${n}_pcts")
    }

  private def aggregateAt(df: DataFrame, groupCols: List[(String, Column)],
      metricCols: Seq[Column], sortKeys: Seq[String]): DataFrame = {
    val aggCols = count(lit(1)).as("doc_count") +: metricCols
    if (groupCols.isEmpty) df.agg(aggCols.head, aggCols.tail: _*)
    else df.groupBy(groupCols.map { case (n, c) => c.as(n) }: _*)
      .agg(aggCols.head, aggCols.tail: _*)
  }
}
