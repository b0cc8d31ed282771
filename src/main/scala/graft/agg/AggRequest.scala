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
  /** `top_hits` leaf (the reference's `metric/top_hits.rs:117-124`):
    * per-bucket top-`size` documents by `sort` starting at `from`, emitting
    * the `docvalue_fields` columns (glob `*` patterns supported, expanded
    * against the frame's columns — `globbed_string_to_regex`; `_source` is
    * accepted as an alias with plain names). In the flattened output the hit
    * rows ARE the leaf rows, with the bucket's doc_count and sibling
    * metrics joined on.
    */
  final case class TopHits(size: Int, sort: Seq[(String, Boolean)],
      source: Seq[String], from: Int = 0) extends Node

  /** Expand docvalue_fields glob patterns against available column names. */
  private[graft] def expandDocValue(patterns: Seq[String],
      available: Seq[String]): Seq[String] =
    patterns.flatMap { p =>
      if (p.contains("*")) {
        val re = "^" + java.util.regex.Pattern.quote(p).replace("*", "\\E.*\\Q") + "$"
        available.filter(_.matches(re))
      } else Seq(p)
    }.distinct
  /** `order`: the reference's CustomOrder (`bucket/term_agg.rs:235-330`) —
    * target is "_count", "_key", or a sub-aggregation name (optionally
    * `name.metric` for multi-value metrics), paired with ascending?.
    * None = the ES default (_count desc, key asc tiebreak).
    */
  /** `show_term_doc_count_error` adds `doc_count_error_upper_bound` to the
    * JSON result — always 0 here: the reference bounds the error introduced
    * by its per-segment `segment_size` cutoff (`term_agg.rs:85-96`), while
    * this engine aggregates exact global counts before any cutoff, so
    * `segment_size`/`shard_size` are accepted and ignored.
    * `sum_other_doc_count` (docs in buckets beyond `size`) is always emitted
    * in the JSON result, like the reference's `BucketResult::Terms`.
    */
  /** `missing` is the reference's `Option<Key>` (term_agg.rs:311): a string
    * bucket value for text fields or a number for numeric fields.
    * `include`/`exclude` (term_agg.rs:139-145,273-276): Right(values) for an
    * exact-value array, Left(regex) for a single-string FULL-MATCH regex
    * (the reference's dictionary automaton matches whole terms); both filter
    * terms BEFORE collection, so filtered docs never reach any bucket — nor
    * `sum_other_doc_count`. The `missing` bucket bypasses the filter, like
    * the reference's dictionary-ordinal allow-set does.
    */
  final case class Terms(field: String, size: Int, minDocCount: Long,
      subs: Map[String, Node], missing: Option[Any] = None,
      order: Option[(String, Boolean)] = None,
      showDocCountError: Boolean = false,
      include: Option[Either[String, Seq[String]]] = None,
      exclude: Option[Either[String, Seq[String]]] = None) extends Node
  /** Histogram options match `bucket/histogram/histogram.rs:91-145`:
    * absolute grid `[offset + k*interval, offset + (k+1)*interval)`; by
    * default every bucket between the data min and max is returned
    * (empty ones included) — `min_doc_count` > 0 filters them instead;
    * `hard_bounds` clips the value range (closed interval),
    * `extended_bounds` widens the materialized grid.
    */
  /** `keyed` renders the JSON buckets as a map keyed by the bucket label
    * (`BucketEntries::HashMap`, agg_result.rs:187-201; map key =
    * `key.to_string()`, the Rust `{}` float format for numeric keys).
    */
  final case class Histogram(field: String, interval: Double, offset: Double,
      subs: Map[String, Node],
      extendedBounds: Option[(Double, Double)] = None,
      hardBounds: Option[(Double, Double)] = None,
      minDocCount: Long = 0L, keyed: Boolean = false) extends Node
  /** `date_histogram` is the same grid over epoch milliseconds
    * (`bucket/histogram/date_histogram.rs:34-120`): fixed_interval/offset
    * are duration strings (ms/s/m/h/d), bounds are ms timestamps; the
    * bucket key renders as a timestamp.
    */
  final case class DateHistogram(field: String, intervalMs: Long, offsetMs: Long,
      subs: Map[String, Node],
      extendedBounds: Option[(Double, Double)] = None,
      hardBounds: Option[(Double, Double)] = None,
      minDocCount: Long = 0L, keyed: Boolean = false) extends Node
  /** One requested range bucket (`bucket/range.rs:91-97`): optional custom
    * key, half-open [from, to). On a date-typed field the bounds are epoch
    * milliseconds (the reference's axis is nanos — ms here, consistent with
    * date_histogram keys) or RFC3339 strings.
    */
  final case class RangeSpec(key: Option[String], from: Option[Double], to: Option[Double])
  final case class RangeAgg(field: String, ranges: Seq[RangeSpec],
      subs: Map[String, Node], keyed: Boolean = false) extends Node
  final case class FilterAgg(predicate: String, subs: Map[String, Node]) extends Node
  /** Filter bucket whose predicate is an opaque DataFrame transform —
    * the hook `Searcher.aggregate` uses to honor the reference's contract
    * that a filter agg's `query_string` is an ENGINE query parsed by the
    * index's own parser (`bucket/filter.rs:170-193`), not a SQL predicate:
    * the engine resolves the query to a doc set and the bucket becomes a
    * semi join. Not constructible from JSON — built via [[transformFilters]].
    */
  final case class FilterFnAgg(fn: DataFrame => DataFrame,
      subs: Map[String, Node]) extends Node

  /** Rebuild a parsed tree with every FilterAgg's string predicate replaced
    * by a DataFrame transform produced from it (recursing through sub-aggs).
    */
  def transformFilters(node: Node, fn: String => DataFrame => DataFrame): Node = {
    def subs(m: Map[String, Node]): Map[String, Node] =
      m.map { case (k, v) => k -> transformFilters(v, fn) }
    node match {
      case FilterAgg(pred, s) => FilterFnAgg(fn(pred), subs(s))
      case t: Terms => t.copy(subs = subs(t.subs))
      case h: Histogram => h.copy(subs = subs(h.subs))
      case dh: DateHistogram => dh.copy(subs = subs(dh.subs))
      case ra: RangeAgg => ra.copy(subs = subs(ra.subs))
      case ffa: FilterFnAgg => ffa.copy(subs = subs(ffa.subs))
      case leaf => leaf
    }
  }
  /** `missing` substitutes the given value for docs lacking the field, for
    * EVERY metric kind (the reference's `metric/average.rs:24-29` — each
    * metric request carries `missing: Option<f64>`; accepted as a number or
    * a numeric string, as serde does). `sigma` is the extended_stats
    * deviation-bounds width (`extended_stats.rs:39-44`, default 2.0).
    */
  /** `keyed` (percentiles only, default true — percentiles.rs:79,104):
    * true renders `values` as a map keyed by the formatted percent, false
    * as an array of {key, value} entries.
    */
  final case class Metric(kind: String, field: String, percents: Seq[Double],
      sketch: Boolean = false, missing: Option[Double] = None,
      sigma: Option[Double] = None, keyed: Boolean = true) extends Node

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

  private def bounds(j: JValue): Option[(Double, Double)] = j match {
    case JNothing => None
    case b => for (lo <- num(b, "min"); hi <- num(b, "max")) yield (lo, hi)
  }

  /** `date_histogram.rs` duration syntax (`parse_into_milliseconds`):
    * integer + ms|s|m|h|d, negative allowed (offsets); legacy "1 day"-style
    * Spark strings accepted for back-compat.
    */
  private[graft] def durationMs(s: String): Long = {
    val t = s.trim
    val re = "(-?\\d+)(ms|s|m|h|d)".r
    t match {
      case re(n, u) =>
        n.toLong * (u match {
          case "ms" => 1L; case "s" => 1000L; case "m" => 60000L
          case "h" => 3600000L; case "d" => 86400000L
        })
      case _ =>
        val re2 = "(-?\\d+)\\s+(\\w+)s?".r
        t match {
          case re2(n, u) => n.toLong * (u.stripSuffix("s") match {
            case "millisecond" => 1L
            case "second" => 1000L
            case "minute" => 60000L
            case "hour" => 3600000L
            case "day" => 86400000L
            case "week" => 7L * 86400000L
            case other => throw new IllegalArgumentException(s"interval unit $other")
          })
          case _ => throw new IllegalArgumentException(s"cannot parse interval '$s'")
        }
    }
  }

  private def parseNode(spec: JValue): Node = {
    val subs = parseAggs(spec \ "aggs")
    if ((spec \ "top_hits") != JNothing) {
      val b = spec \ "top_hits"
      val sort = (b \ "sort") match {
        case JArray(ss) => ss.collect { case JObject((f, fs) :: Nil) =>
          (f, str(fs, "order").forall(_ == "asc"))
        }
        case _ => Seq.empty
      }
      val source = (b \ "docvalue_fields") match {
        case JArray(vs) => vs.collect { case JString(s) => s }
        case _ => (b \ "_source") match {
          case JArray(vs) => vs.collect { case JString(s) => s }
          case _ => Seq.empty
        }
      }
      return TopHits(num(b, "size").map(_.toInt).getOrElse(3), sort, source,
        from = num(b, "from").map(_.toInt).getOrElse(0))
    }
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
        val miss = num(body, "missing")
          .orElse(str(body, "missing").flatMap(s => scala.util.Try(s.toDouble).toOption))
        val sig = num(body, "sigma")
          .orElse(str(body, "sigma").flatMap(s => scala.util.Try(s.toDouble).toOption))
        Metric(k, str(body, "field").getOrElse(""), pcts, sk, missing = miss, sigma = sig,
          keyed = (body \ "keyed") match { case JBool(v) => v; case _ => true })
    }.getOrElse {
      if ((spec \ "terms") != JNothing) {
        val b = spec \ "terms"
        val order = (b \ "order") match {
          case JObject((target, JString(dir)) :: Nil) => Some((target, dir == "asc"))
          case _ => None
        }
        // single string = regex, array of strings = exact values (the
        // reference's IncludeExcludeParam serde)
        def incExc(k: String): Option[Either[String, Seq[String]]] = (b \ k) match {
          case JString(re) => Some(Left(re))
          case JArray(vs) => Some(Right(vs.collect { case JString(s) => s }))
          case _ => None
        }
        Terms(str(b, "field").get, num(b, "size").map(_.toInt).getOrElse(10),
          num(b, "min_doc_count").map(_.toLong).getOrElse(1L), subs,
          missing = str(b, "missing").map(s => s: Any)
            .orElse(num(b, "missing").map(d => d: Any)),
          order = order,
          showDocCountError = (b \ "show_term_doc_count_error") match {
            case JBool(v) => v; case _ => false
          },
          include = incExc("include"), exclude = incExc("exclude"))
      } else if ((spec \ "histogram") != JNothing) {
        val b = spec \ "histogram"
        Histogram(str(b, "field").get, num(b, "interval").get,
          num(b, "offset").getOrElse(0.0), subs,
          extendedBounds = bounds(b \ "extended_bounds"),
          hardBounds = bounds(b \ "hard_bounds"),
          minDocCount = num(b, "min_doc_count").map(_.toLong).getOrElse(0L),
          keyed = (b \ "keyed") match { case JBool(v) => v; case _ => false })
      } else if ((spec \ "date_histogram") != JNothing) {
        val b = spec \ "date_histogram"
        val iv = str(b, "fixed_interval").orElse(str(b, "calendar_interval")).getOrElse("1d")
        DateHistogram(str(b, "field").get, durationMs(iv),
          str(b, "offset").map(durationMs).getOrElse(0L), subs,
          extendedBounds = bounds(b \ "extended_bounds"),
          hardBounds = bounds(b \ "hard_bounds"),
          minDocCount = num(b, "min_doc_count").map(_.toLong).getOrElse(0L),
          keyed = (b \ "keyed") match { case JBool(v) => v; case _ => false })
      } else if ((spec \ "range") != JNothing) {
        val b = spec \ "range"
        def bound(r: JValue, k: String): Option[Double] = num(r, k).orElse(
          str(r, k).map(s => java.time.Instant.parse(s).toEpochMilli.toDouble))
        val ranges = (b \ "ranges") match {
          case JArray(rs) => rs.map(r => RangeSpec(str(r, "key"), bound(r, "from"), bound(r, "to")))
          case _ => Seq.empty
        }
        RangeAgg(str(b, "field").get, ranges, subs,
          keyed = (b \ "keyed") match { case JBool(v) => v; case _ => false })
      } else if ((spec \ "filter") != JNothing) {
        FilterAgg(str(spec \ "filter", "query_string").getOrElse("true"), subs)
      } else throw new IllegalArgumentException(s"unsupported agg: $spec")
    }
  }

  /** Compile one named agg tree over `df`. Returns name -> flattened bucket
    * DataFrame (bucket key columns along the path + metric columns +
    * doc_count). With `withTotals` each terms level also carries a
    * `__<name>_bg_total` internal column — the per-parent
    * `sum_other_doc_count` base the JSON renderer subtracts from; it costs
    * one extra aggregate per terms level, so the flattened-frame path
    * (which never renders sum_other) skips it by default.
    */
  def compile(df: DataFrame, aggs: Map[String, Node],
      withTotals: Boolean = false): Map[String, DataFrame] =
    aggs.map { case (name, node) => name -> compileOne(df, name, node, Nil, withTotals) }

  def run(df: DataFrame, json: String): Map[String, DataFrame] = compile(df, parse(json))

  /** Collect each compiled root frame and rebuild the reference's nested
    * JSON result tree (`src/aggregation/agg_result.rs`): bucket aggs emit
    * `{"buckets": [...]}` with per-bucket `key`/`doc_count`/sub-aggs, metric
    * leaves emit `{"value": ...}` (or the stats / percentiles object),
    * top_hits emits `{"hits": [...]}`. Bucket order follows the agg's own
    * ordering at every level. Driver-side by construction — the frames are
    * already size-limited bucket sets, the same place the reference's
    * final-result merge runs.
    */
  /** The reference's `DEFAULT_BUCKET_LIMIT` (agg_limits.rs:79-86): the
    * result-size guard for the final JSON materialization.
    */
  val DefaultBucketLimit = 65000

  def runJson(df: DataFrame, json: String,
      bucketLimit: Int = DefaultBucketLimit): String =
    runJsonNodes(df, parse(json), bucketLimit)

  /** [[runJson]] over an already-parsed (possibly [[transformFilters]]-
    * rewritten) tree.
    */
  def runJsonNodes(df: DataFrame, aggs: Map[String, Node],
      bucketLimit: Int = DefaultBucketLimit): String = {
    val frames = compile(df, aggs, withTotals = true)
    // AggregationLimitsGuard analog (agg_limits.rs): the flattened frames
    // are collected driver-side for the JSON rebuild, so the bucket cap is
    // enforced AS a plan-side limit — an over-budget aggregation aborts with
    // the reference's error instead of materializing an unbounded result
    var collected = 0
    val out = JObject(aggs.toList.sortBy(_._1).map { case (name, node) =>
      val budget = bucketLimit - collected
      val raw = frames(name).limit(budget + 1).collect()
      collected += raw.length
      if (collected > bucketLimit)
        throw new IllegalStateException(
          s"Aborting aggregation because bucket limit was exceeded. " +
            s"Limit: $bucketLimit, Current: $collected")
      val rows: Seq[Map[String, Any]] = raw.toSeq.map { r =>
        r.schema.fieldNames.zipWithIndex.map { case (f, i) => f -> r.get(i) }.toMap
      }
      name -> renderNode(node, name, rows, df.columns.toSeq)
    })
    JsonMethods.compact(JsonMethods.render(out))
  }

  private def jval(a: Any): JValue = a match {
    case null => JNull
    case b: Boolean => JBool(b)
    case i: Int => JInt(BigInt(i))
    case l: Long => JInt(BigInt(l))
    case f: Float => JDouble(f.toDouble)
    case d: Double => JDouble(d)
    case d: java.math.BigDecimal => JDecimal(BigDecimal(d))
    case t: java.sql.Timestamp => JInt(BigInt(t.getTime)) // epoch ms, ES "key"
    case s: String => JString(s)
    case other => JString(other.toString)
  }

  /** Flattened column suffix for one percentile: integral percents keep the
    * classic `p50` form; fractional ones encode the dot (`p99_9`) so 99 and
    * 99.9 cannot collide.
    */
  private def pctCol(name: String, p: Double): String =
    if (p == math.rint(p)) s"${name}_p${p.toInt}"
    else s"${name}_p${p.toString.replace('.', '_')}"

  private def numOfAny(a: Any): Option[Double] = a match {
    case n: Number => Some(n.doubleValue())
    case _ => None
  }

  private def numOf(a: Any): Double = a match {
    case null => Double.NaN
    case n: Number => n.doubleValue()
    case t: java.sql.Timestamp => t.getTime.toDouble
    case s: String => Double.NaN
    case _ => Double.NaN
  }

  /** Empty buckets (zero-count grid fill / padded parents) carry null metric
    * columns; render them the way the reference's accumulators start out
    * (`metric/stats.rs`): sums and counts at 0, min/max/avg absent (null).
    */
  private def zeroIfNull(v: Any, zero: JValue): JValue =
    if (v == null) zero else jval(v)

  private def metricJson(name: String, m: Metric, row: Map[String, Any]): JValue = m.kind match {
    case "avg" | "min" | "max" =>
      JObject(List("value" -> jval(row.getOrElse(s"${name}_${m.kind}", null))))
    case "sum" =>
      JObject(List("value" -> zeroIfNull(row.getOrElse(s"${name}_sum", null), JDouble(0.0))))
    case "value_count" =>
      JObject(List("value" -> zeroIfNull(row.getOrElse(s"${name}_count", null), JInt(0))))
    case "cardinality" =>
      JObject(List("value" -> zeroIfNull(row.getOrElse(s"${name}_cardinality", null), JInt(0))))
    case "stats" =>
      JObject(List("count", "min", "max", "avg", "sum").map { k =>
        val v = row.getOrElse(s"${name}_$k", null)
        k -> (k match {
          case "count" => zeroIfNull(v, JInt(0))
          case "sum" => zeroIfNull(v, JDouble(0.0))
          case _ => jval(v)
        })
      })
    case "extended_stats" =>
      // ExtendedStats (extended_stats.rs:66-98): count/sum always present,
      // min/max/avg/sum_of_squares null when count == 0, variance family
      // null when count <= 1; *_population aliases the population value;
      // std_deviation_bounds = avg ± sigma·std (default sigma 2.0), null
      // whenever the variance is
      def d(k: String): Any = row.getOrElse(s"${name}_$k", null)
      val varv = d("variance"); val vars = d("variance_sampling")
      val sd = d("std_deviation"); val sds = d("std_deviation_sampling")
      val bounds: JValue = (numOfAny(d("avg")), numOfAny(sd), numOfAny(sds)) match {
        case (Some(mean), Some(dev), Some(devs)) =>
          val sig = m.sigma.getOrElse(2.0)
          JObject(List(
            "upper" -> JDouble(mean + dev * sig), "lower" -> JDouble(mean - dev * sig),
            "upper_sampling" -> JDouble(mean + devs * sig),
            "lower_sampling" -> JDouble(mean - devs * sig),
            "upper_population" -> JDouble(mean + dev * sig),
            "lower_population" -> JDouble(mean - dev * sig)))
        case _ => JNull
      }
      JObject(List(
        "count" -> zeroIfNull(d("count"), JInt(0)),
        "min" -> jval(d("min")), "max" -> jval(d("max")), "avg" -> jval(d("avg")),
        "sum" -> zeroIfNull(d("sum"), JDouble(0.0)),
        "sum_of_squares" -> jval(d("sum_of_squares")),
        "variance" -> jval(varv), "variance_population" -> jval(varv),
        "variance_sampling" -> jval(vars),
        "std_deviation" -> jval(sd), "std_deviation_population" -> jval(sd),
        "std_deviation_sampling" -> jval(sds),
        "std_deviation_bounds" -> bounds))
    case "percentiles" =>
      // map keys use the reference's format_percentile (percentiles.rs:169-
      // 176: Rust to_string + ".0" when integral) — Scala Double.toString
      // produces the same form; keyed=false renders {key, value} entries
      val kv = m.percents.toList.map(p =>
        p.toString -> jval(row.getOrElse(pctCol(name, p), null)))
      JObject(List("values" ->
        (if (m.keyed) JObject(kv)
        else JArray(m.percents.toList.map(p => JObject(List(
          "key" -> JDouble(p),
          "value" -> jval(row.getOrElse(pctCol(name, p), null)))))))))
    case _ => JNull
  }

  /** Bucket comparison order for rendering (mirrors each agg's plan-side
    * ordering).
    */
  private def bucketSort(node: Node, name: String,
      buckets: Seq[(Any, Seq[Map[String, Any]])]): Seq[(Any, Seq[Map[String, Any]])] = {
    def keyStr(a: Any): String = if (a == null) "" else a.toString
    def docCount(rows: Seq[Map[String, Any]]): Long =
      rows.headOption.flatMap(r =>
        r.get(s"${name}_doc_count").orElse(r.get("doc_count"))).collect {
        case l: Long => l; case i: Int => i.toLong
      }.getOrElse(0L)
    node match {
      case t: Terms =>
        val asc = t.order.exists(_._2)
        t.order match {
          case Some(("_key", _)) =>
            val s = buckets.sortBy { case (k, _) => (numOf(k), keyStr(k)) }
            if (asc) s else s.reverse
          case Some((target, _)) if target != "_count" =>
            val colName = metricColName(target, t.subs)
            val s = buckets.sortBy { case (k, rs) =>
              (numOf(rs.headOption.flatMap(_.get(colName)).orNull), keyStr(k))
            }
            if (asc) s else s.reverse
          case _ => // _count (or default desc)
            val s = buckets.sortBy { case (k, rs) => (docCount(rs), keyStr(k)) }
            if (asc) s else buckets.sortBy { case (k, rs) => (-docCount(rs), keyStr(k)) }
        }
      case _: Histogram | _: DateHistogram =>
        buckets.sortBy { case (k, _) => numOf(k) }
      case _: RangeAgg =>
        // request order: joins above a nested range level may reorder the
        // frame; the definition frame's ord column travels with every row
        buckets.sortBy { case (_, rs) =>
          numOf(rs.head.getOrElse(s"__${name}_ord", null))
        }
      case _ => buckets
    }
  }

  private def renderNode(node: Node, name: String, rows: Seq[Map[String, Any]],
      avail: Seq[String]): JValue =
    node match {
      case m: Metric =>
        metricJson(name, m, rows.headOption.getOrElse(Map.empty))
      case th: TopHits =>
        // padding rows (zero-count grid buckets, empty parents) carry a null
        // rank — an empty bucket has an empty hits array, not a null hit;
        // joins above this level may reorder, so sort by rank explicitly
        val hits = rows.filter(_.get(s"${name}_rank").exists(_ != null))
          .sortBy(r => numOf(r(s"${name}_rank")))
        val fields = expandDocValue(th.source, avail)
        JObject(List("hits" -> JArray(hits.toList.map(r =>
          JObject((s"${name}_rank" :: fields.toList).flatMap(f =>
            r.get(f).map(v => f -> jval(v))))))))
      case FilterAgg(_, subs) =>
        renderFilter(name, subs, rows, avail)
      case FilterFnAgg(_, subs) =>
        renderFilter(name, subs, rows, avail)
      case bucketNode =>
        renderBuckets(bucketNode, name, rows, avail)
    }

  private def renderFilter(name: String, subs: Map[String, Node],
      rows: Seq[Map[String, Any]], avail: Seq[String]): JValue = {
    val row = rows.headOption.getOrElse(Map.empty)
    // with a deeper bucket sub the filter's own count was renamed to
    // `<name>_doc_count` by withSubs; padding rows leave it null → 0
    val dc = row.get(s"${name}_doc_count").orElse(row.get("doc_count"))
      .flatMap(Option(_)).getOrElse(0L)
    JObject(("doc_count" -> jval(dc)) :: subNodesJson(subs, name, rows, avail))
  }

  private def renderBuckets(bucketNode: Node, name: String,
      rows: Seq[Map[String, Any]], avail: Seq[String]): JValue = {
        val (subs, keyed) = bucketNode match {
          case t: Terms => (t.subs, false)
          case h: Histogram => (h.subs, h.keyed)
          case dh: DateHistogram => (dh.subs, dh.keyed)
          case ra: RangeAgg => (ra.subs, ra.keyed)
          case _ => (Map.empty[String, Node], false)
        }
        val keyName = s"${name}_key"
        // group rows by this level's key, preserving frame encounter order.
        // A null key is always a padding row (an empty parent bucket's
        // right-join fill): terms drops docs without the field, histogram /
        // range filter null values plan-side, so no genuine bucket keys null.
        val order = scala.collection.mutable.LinkedHashMap.empty[Any, Vector[Map[String, Any]]]
        rows.foreach { r =>
          val k = r.getOrElse(keyName, null)
          if (k != null)
            order(k) = order.getOrElse(k, Vector.empty) :+ r
        }
        val buckets = bucketSort(bucketNode, name, order.toSeq)
        def levelDocCount(row: Map[String, Any]): Any =
          row.get(s"${name}_doc_count").orElse(row.get("doc_count"))
            .flatMap(Option(_)).getOrElse(0L)
        val bucketObjs: List[(Any, JObject)] = buckets.toList.map { case (k, subRows) =>
          val row = subRows.head
          val docCount = levelDocCount(row)
          val keyFields: List[(String, JValue)] = k match {
            case t: java.sql.Timestamp =>
              List("key" -> JInt(BigInt(t.getTime)),
                "key_as_string" -> JString(
                  java.time.Instant.ofEpochMilli(t.getTime).toString))
            case b: Boolean =>
              // bool term keys serialize as u64 0/1 plus key_as_string
              // (intermediate_agg_result.rs:84 + :654-662)
              List("key" -> JInt(BigInt(if (b) 1 else 0)),
                "key_as_string" -> JString(b.toString))
            case other => List("key" -> jval(other))
          }
          val fromTo = List(s"${name}_from" -> "from", s"${name}_to" -> "to",
            s"${name}_from_str" -> "from_as_string", s"${name}_to_str" -> "to_as_string").flatMap {
            case (colN, out) => row.get(colN).filter(_ != null).map(v => out -> jval(v))
          }
          k -> JObject(keyFields ++ fromTo ++ List("doc_count" -> jval(docCount)) ++
            subNodesJson(subs, name, subRows, avail))
        }
        // keyed=true: buckets as a map keyed by the bucket label — the range
        // key string, or the Rust `{}` float format of a numeric key (date
        // histogram keys are their epoch-ms value, intermediate_agg_result
        // .rs:484-492 `key.to_string()`)
        val bucketsJson: JValue =
          if (!keyed) JArray(bucketObjs.map(_._2))
          else JObject(bucketObjs.map { case (k, obj) =>
            (k match {
              case t: java.sql.Timestamp => fmtF64(t.getTime.toDouble)
              case n: Number => fmtF64(n.doubleValue)
              case s: String => s
              case other => String.valueOf(other)
            }) -> (obj: JValue)
          })
        // terms results carry `sum_other_doc_count` (BucketResult::Terms,
        // agg_result.rs:152-158): docs in buckets that passed min_doc_count
        // but fell beyond `size`. `doc_count_error_upper_bound` is opt-in and
        // always 0 — counts here are exact global counts (no segment_size
        // cutoff before the merge).
        val termsExtra: List[(String, JValue)] = bucketNode match {
          case t: Terms =>
            val bgTotal = rows.iterator
              .map(_.getOrElse(s"__${name}_bg_total", null))
              .collectFirst { case l: Long => l; case i: Int => i.toLong }
              .getOrElse(0L)
            val kept = buckets.iterator.map { case (_, rs) =>
              levelDocCount(rs.head) match {
                case l: Long => l; case i: Int => i.toLong; case _ => 0L
              }
            }.sum
            ("sum_other_doc_count" -> JInt(BigInt(math.max(0L, bgTotal - kept)))) ::
              (if (t.showDocCountError)
                List("doc_count_error_upper_bound" -> JInt(BigInt(0))) else Nil)
          case _ => Nil
        }
        JObject(("buckets" -> bucketsJson) :: termsExtra)
    }

  private def subNodesJson(subs: Map[String, Node], parentName: String,
      subRows: Seq[Map[String, Any]], avail: Seq[String]): List[(String, JValue)] =
    subs.toList.sortBy(_._1).map { case (subName, subNode) =>
      subName -> renderNode(subNode, subName, subRows, avail)
    }

  private def metricColumns(name: String, m: Metric): Seq[Column] = {
    // `missing` fills nulls with an f64 (the reference coerces the column to
    // f64 when substituting); without it the raw column keeps its own type
    val c: Column = m.missing match {
      case Some(mv) => coalesce(col(m.field).cast("double"), lit(mv))
      case None => col(m.field)
    }
    m.kind match {
      case "avg" => Seq(avg(c).as(s"${name}_avg"))
      case "min" => Seq(min(c).as(s"${name}_min"))
      case "max" => Seq(max(c).as(s"${name}_max"))
      case "sum" => Seq(sum(c).as(s"${name}_sum"))
      case "value_count" => Seq(count(c).as(s"${name}_count"))
      case "stats" => Seq(
        count(c).as(s"${name}_count"), min(c).as(s"${name}_min"),
        max(c).as(s"${name}_max"), avg(c).as(s"${name}_avg"),
        sum(c).as(s"${name}_sum"))
      case "extended_stats" =>
        // extended_stats.rs: stats + sum_of_squares + population AND sampling
        // variance/std — variance is None for count <= 1 (finalize at
        // :251-257), so the Spark aggregates are gated on the count; the
        // sigma-width deviation bounds derive from these in the renderer
        val cnt = count(c)
        val vp = when(cnt > 1, var_pop(c))
        val vs = when(cnt > 1, var_samp(c))
        Seq(
          cnt.as(s"${name}_count"), min(c).as(s"${name}_min"),
          max(c).as(s"${name}_max"), avg(c).as(s"${name}_avg"),
          sum(c).as(s"${name}_sum"),
          sum(c * c).as(s"${name}_sum_of_squares"),
          vp.as(s"${name}_variance"),
          vs.as(s"${name}_variance_sampling"),
          sqrt(vp).as(s"${name}_std_deviation"),
          sqrt(vs).as(s"${name}_std_deviation_sampling"))
      case "percentiles" if m.sketch =>
        // the reference's sketch family (DDSketch, percentiles.rs:217-227);
        // one array-valued aggregate, split into per-percent columns
        val arr = DDSketch.percentilesAgg(c, m.percents).as(s"__${name}_pcts")
        Seq(arr) // split post-agg in aggregateAt via percentColumns
      case "percentiles" => m.percents.map { p =>
        val e = m.missing match {
          case Some(mv) => s"coalesce(cast(${m.field} as double), $mv)"
          case None => m.field
        }
        expr(s"percentile($e, ${p / 100.0})").as(pctCol(name, p))
      }
      case "cardinality" => Seq(approx_count_distinct(c).as(s"${name}_cardinality"))
      case other => throw new IllegalArgumentException(s"metric $other")
    }
  }

  private def compileOne(df: DataFrame, name: String, node: Node,
      groupCols: List[(String, Column)], withTotals: Boolean): DataFrame = node match {
    case m: Metric =>
      expandSketch(
        aggregateAt(df, groupCols, metricColumns(name, m), sortKeys = groupCols.map(_._1)),
        Seq(name -> m))
    case Terms(field, size, minDocCount, subs, missing, order, _, include, exclude) =>
      // ES `missing`: null keys fall into the given bucket value; without it
      // docs lacking the field contribute NO bucket (`term_agg.rs` only
      // collects docs carrying a term; `term_missing_agg.rs` is the opt-in)
      val base = if (missing.isDefined) df else df.where(col(field).isNotNull)
      // include/exclude filter real terms before collection (nulls pass —
      // the missing bucket bypasses the dictionary-ordinal allow-set);
      // single-string regexes are full-match, like the fst automaton
      def matches(p: Either[String, Seq[String]]): Column = p match {
        case Left(re) => col(field).rlike(s"^(?:$re)$$")
        case Right(vs) => col(field).isin(vs: _*)
      }
      val src = Seq(
        include.map(p => col(field).isNull || matches(p)),
        exclude.map(p => col(field).isNull || !matches(p))
      ).flatten.foldLeft(base)((d, c) => d.where(c))
      val keyCol = missing.map(mv => coalesce(col(field), lit(mv))).getOrElse(col(field))
      val keyName = s"${name}_key"
      val keyed = (keyName, keyCol)
      val path = groupCols :+ keyed
      val inner = withSubs(src, name, path, subs, withTotals)
      val orderCols = termsOrder(order, keyName, subs)
      // `sum_other_doc_count` base: docs in buckets passing min_doc_count at
      // this level, per parent path; the renderer subtracts the kept buckets
      // (`cut_off_buckets`, term_agg.rs:1166-1181, sums the truncated tail —
      // total minus kept is the same number, computed without materializing
      // the tail). With min_doc_count <= 1 every bucketed doc counts, so a
      // plain scan-count avoids the per-bucket pre-aggregate.
      val totName = s"__${name}_bg_total"
      def attachTotal(out: DataFrame): DataFrame = if (!withTotals) out else {
        val totals: DataFrame =
          if (minDocCount <= 1L) {
            if (groupCols.isEmpty) src.agg(count(lit(1)).as(totName))
            else src.groupBy(groupCols.map { case (n, c) => c.as(n) }: _*)
              .agg(count(lit(1)).as(totName))
          } else {
            val perBucket = aggregateAt(src, path, Nil, Nil)
              .where(col("doc_count") >= minDocCount)
            if (groupCols.isEmpty) perBucket.agg(sum(col("doc_count")).as(totName))
            else perBucket.groupBy(groupCols.map(g => col(g._1)): _*)
              .agg(sum(col("doc_count")).as(totName))
          }
        if (groupCols.isEmpty) out.crossJoin(broadcast(totals))
        else out.join(totals, groupCols.map(_._1), "left")
      }
      val hasDeeper = subs.values.exists(n => !n.isInstanceOf[Metric] && !n.isInstanceOf[TopHits]) ||
        subs.values.exists(_.isInstanceOf[TopHits])
      if (!hasDeeper && groupCols.isEmpty) {
        // flat terms: doc_count in `inner` is this level's count, and the
        // metric leaves are present, so a sub-agg order target sorts directly
        attachTotal(inner.where(col("doc_count") >= minDocCount)
          .orderBy(orderCols: _*).limit(size))
      } else {
        // `size` applies PER PARENT BUCKET and min_doc_count to THIS level's
        // counts (term_agg.rs:202-240): rank this level's buckets inside
        // each parent by the requested order (default count desc, key asc)
        // and keep the leaf rows of surviving buckets via a semi join on the
        // path keys. A sub-agg order target needs that metric computed at
        // THIS level, so it rides along in the ranking frame.
        val levelCounts = aggregateAt(src, path, orderMetricCols(order, subs), Nil)
          .where(col("doc_count") >= minDocCount)
        val limited =
          if (groupCols.isEmpty) levelCounts.orderBy(orderCols: _*).limit(size)
          else {
            import org.apache.spark.sql.expressions.Window
            val w = Window.partitionBy(groupCols.map(g => col(g._1)): _*)
              .orderBy(orderCols: _*)
            levelCounts.withColumn("__rn", row_number().over(w))
              .where(col("__rn") <= size).drop("__rn")
          }
        attachTotal(
          inner.join(limited.select(path.map(c => col(c._1)): _*), path.map(_._1), "left_semi"))
      }
    case Histogram(field, interval, offset, subs, extendedBounds, hardBounds, minDocCount, _) =>
      histogramAt(df, name, groupCols, subs, col(field).cast("double"),
        interval, offset, extendedBounds, hardBounds, minDocCount, identity, withTotals)
    case DateHistogram(field, intervalMs, offsetMs, subs, eb, hb, minDocCount, _) =>
      // the reference lowers date_histogram onto the numeric histogram over
      // epoch milliseconds (date_histogram.rs); the key renders back as a
      // millisecond-precision timestamp
      val ms = (unix_micros(col(field).cast("timestamp")) / lit(1000L)).cast("double")
      histogramAt(df, name, groupCols, subs, ms, intervalMs.toDouble, offsetMs.toDouble,
        eb, hb, minDocCount, k => timestamp_millis(k.cast("long")), withTotals)
    case ra @ RangeAgg(field, _, subs, _) =>
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      // date-typed field (range.rs:751-806): values move to the epoch-ms
      // axis (ms, not the reference's nanos — same axis as date_histogram),
      // implicit labels format RFC3339, from/to_as_string render in JSON
      val isDate = df.schema.find(_.name == field).exists(_.dataType == TimestampType)
      val c = if (isDate) (unix_micros(col(field)) / lit(1000L)).cast("double")
        else col(field).cast("double")
      val fmt: Double => String = if (isDate) msRfc3339 else fmtF64
      val withImplicit = rangeDefs(ra)
      val keyName = s"${name}_key"
      val key = withImplicit.foldLeft(lit(null).cast("string")) { case (acc, r) =>
        val cond = (r.from.map(c >= _).getOrElse(lit(true))) && (r.to.map(c < _).getOrElse(lit(true)))
        when(cond, lit(rangeLabel(r, fmt))).otherwise(acc)
      }.as(keyName)
      val out = withSubs(df.where(c.isNotNull), name, groupCols :+ ((keyName, key)), subs,
        withTotals)
      // bucket-definition frame: request order (kept as an internal ord
      // column the renderer sorts by), custom keys, from/to columns, and
      // RFC3339 *_str columns when the field is a date
      val ordName = s"__${name}_ord"
      val strCols =
        if (isDate) Seq(StructField(s"${name}_from_str", StringType),
          StructField(s"${name}_to_str", StringType))
        else Nil
      val schema = StructType(Seq(
        StructField(keyName, StringType), StructField(s"${name}_from", DoubleType),
        StructField(s"${name}_to", DoubleType)) ++ strCols :+
        StructField(ordName, IntegerType, nullable = false))
      val defRows: java.util.List[Row] = new java.util.ArrayList[Row]()
      withImplicit.zipWithIndex.foreach { case (r, i) =>
        val strs = if (isDate) Seq(r.from.map(msRfc3339).orNull, r.to.map(msRfc3339).orNull)
          else Nil
        defRows.add(Row(Seq[Any](rangeLabel(r, fmt), r.from.map(Double.box).orNull,
          r.to.map(Double.box).orNull) ++ strs :+ i: _*))
      }
      val defs = df.sparkSession.createDataFrame(defRows, schema)
      val parents = groupCols.map(_._1)
      val base =
        if (parents.isEmpty) defs
        else out.select(parents.map(col): _*).distinct().crossJoin(defs)
      base.join(out, parents :+ keyName, "left_outer")
        .withColumn("doc_count", coalesce(col("doc_count"), lit(0L)))
        .orderBy(parents.map(col) :+ col(ordName): _*)
    case FilterAgg(pred, subs) =>
      withSubs(df.where(expr(pred)), name, groupCols, subs, withTotals)
    case FilterFnAgg(fn, subs) =>
      withSubs(fn(df), name, groupCols, subs, withTotals)
    case th: TopHits =>
      // root-level top_hits (no bucket parent): one global top-k window —
      // bounded by from+size, so the single-partition window is fine
      topHitsRows(df, groupCols, name, th)
  }

  /** Rust `{}` float formatting for range bucket labels ("0", "0.1", not
    * "0.0"): integral values print without the fraction.
    */
  private def fmtF64(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString

  /** RFC3339 from epoch ms (the reference's `format_date`, date.rs:6-16). */
  private def msRfc3339(ms: Double): String =
    java.time.Instant.ofEpochMilli(ms.toLong).toString

  /** The requested ranges plus the implicit open-ended buckets before the
    * first `to` and after the last `from` (range.rs: "*-x" / "x-*"), kept
    * even when empty — this IS the bucket order of the response.
    */
  private def rangeDefs(ra: RangeAgg): Seq[RangeSpec] =
    (if (ra.ranges.headOption.exists(_.from.isDefined))
      Seq(RangeSpec(None, None, ra.ranges.head.from)) else Nil) ++
      ra.ranges ++
      (if (ra.ranges.lastOption.exists(_.to.isDefined))
        Seq(RangeSpec(None, ra.ranges.last.to, None)) else Nil)

  private def rangeLabel(r: RangeSpec, fmt: Double => String = fmtF64): String =
    r.key.getOrElse(s"${r.from.map(fmt).getOrElse("*")}-${r.to.map(fmt).getOrElse("*")}")

  /** Shared histogram machinery (numeric + date): absolute grid keyed by
    * `floor((v - offset)/interval)*interval + offset`; `hard_bounds` clips
    * values; with min_doc_count == 0 (the default) every grid bucket between
    * the per-parent data min/max — widened by `extended_bounds`, clipped by
    * `hard_bounds` — is materialized with doc_count 0, exactly the
    * reference's bucket fill (`histogram.rs:55-63`). The grid join key is
    * computed through the same `k*interval + offset` float arithmetic on
    * both sides, so double equality is exact.
    */
  private def histogramAt(df: DataFrame, name: String, groupCols: List[(String, Column)],
      subs: Map[String, Node], value: Column, interval: Double, offset: Double,
      extendedBounds: Option[(Double, Double)], hardBounds: Option[(Double, Double)],
      minDocCount: Long, toKey: Column => Column, withTotals: Boolean): DataFrame = {
    require(minDocCount == 0 || extendedBounds.isEmpty,
      "extended_bounds cannot be combined with min_doc_count > 0 (histogram.rs)")
    def keyOf(c: Column): Column = floor((c - offset) / interval) * interval + offset
    val filtered = hardBounds match {
      case Some((lo, hi)) => df.where(value >= lo && value <= hi)
      case None => df
    }
    val keyName = s"${name}_key"
    val rows = filtered.where(value.isNotNull)
    val out = withSubs(rows, name, groupCols :+ ((keyName, keyOf(value).as(keyName))), subs,
      withTotals)
    val parents = groupCols.map(_._1)
    // with a deeper bucket sub, THIS level's count was renamed by withSubs
    // (plain doc_count is then the leaf's) — min_doc_count filters the
    // histogram's own bucket counts
    val levelCount =
      if (out.columns.contains(s"${name}_doc_count")) col(s"${name}_doc_count")
      else col("doc_count")
    val result =
      if (minDocCount > 0) out.where(levelCount >= minDocCount)
      else {
        val withVal = rows.select(
          groupCols.map { case (n, c) => c.as(n) } :+ keyOf(value).as("__k"): _*)
        val span0 = (if (parents.isEmpty) withVal.groupBy() else withVal.groupBy(parents.map(col): _*))
          .agg(min(col("__k")).as("__lo"), max(col("__k")).as("__hi"))
        val span1 = extendedBounds match {
          case Some((lo, hi)) => span0
            .withColumn("__lo", least(col("__lo"), keyOf(lit(lo))))
            .withColumn("__hi", greatest(col("__hi"), keyOf(lit(hi))))
          case None => span0
        }
        val span2 = hardBounds match {
          case Some((lo, hi)) => span1
            .withColumn("__lo", greatest(col("__lo"), keyOf(lit(lo))))
            .withColumn("__hi", least(col("__hi"), keyOf(lit(hi))))
          case None => span1
        }
        val grid = span2
          // hard_bounds can clip the span empty (lo > hi): no buckets, not a
          // descending `sequence`
          .withColumn("__n", round((col("__hi") - col("__lo")) / interval).cast("long"))
          .where(col("__n") >= 0)
          .select(parents.map(col) ++ Seq(col("__lo"),
            explode(sequence(lit(0L), col("__n"))).as("__i")): _*)
          // re-derive the grid index so the key is the SAME `k*interval +
          // offset` expression shape the data rows used (bit-equal join key)
          .select(parents.map(col) :+
            keyOf(col("__lo") + (col("__i") + lit(0.5)) * interval).as(keyName): _*)
        grid.join(out, parents :+ keyName, "left_outer")
          .withColumn("doc_count", coalesce(col("doc_count"), lit(0L)))
      }
    result.withColumn(keyName, toKey(col(keyName)))
      .orderBy(groupCols.map(c => col(c._1)) :+ col(keyName): _*)
  }

  /** Terms order → sort columns over a bucket frame that has `doc_count`,
    * the key column, and (for sub-agg targets) the resolved metric column.
    * Non-key orders tiebreak by key ascending, as ES does.
    */
  private def termsOrder(order: Option[(String, Boolean)], keyName: String,
      subs: Map[String, Node]): Seq[Column] = order match {
    case None | Some(("_count", false)) => Seq(col("doc_count").desc, col(keyName))
    case Some(("_count", true)) => Seq(col("doc_count").asc, col(keyName))
    case Some(("_key", asc)) => Seq(if (asc) col(keyName).asc else col(keyName).desc)
    case Some((target, asc)) =>
      val c = col(metricColName(target, subs))
      Seq(if (asc) c.asc else c.desc, col(keyName))
  }

  /** Resolve `name` / `name.leaf` (e.g. `st.avg`, `pct.50`) to the flattened
    * output column of the metric sub-aggregation.
    */
  private def metricColName(target: String, subs: Map[String, Node]): String = {
    val (base, leafOpt) = target.split("\\.", 2) match {
      case Array(b, l) => (b, Some(l))
      case Array(b) => (b, None)
    }
    subs.get(base) match {
      case Some(Metric(kind, _, _, sketch, _, _, _)) =>
        require(!(kind == "percentiles" && sketch),
          s"order target '$target': ordering by sketch percentiles is unsupported")
        val leaf = leafOpt
          .map(l => if (l.nonEmpty && l.forall(c => c.isDigit || c == '.'))
            pctCol("", l.toDouble).stripPrefix("_") else l)
          .getOrElse(kind match {
            case "value_count" => "count"
            case k @ ("avg" | "min" | "max" | "sum" | "cardinality") => k
            case other => throw new IllegalArgumentException(
              s"order target '$target' must name the metric leaf (e.g. $base.avg) for $other")
          })
        s"${base}_$leaf"
      case _ => throw new IllegalArgumentException(
        s"order target '$target': no such metric sub-aggregation")
    }
  }

  /** The metric columns a sub-agg order target needs in the ranking frame. */
  private def orderMetricCols(order: Option[(String, Boolean)],
      subs: Map[String, Node]): Seq[Column] = order match {
    case Some((t, _)) if t != "_count" && t != "_key" =>
      subs.get(t.split("\\.", 2)(0)) match {
        case Some(m: Metric) => metricColumns(t.split("\\.", 2)(0), m)
        case _ => Nil
      }
    case _ => Nil
  }

  /** Group by the accumulated bucket keys, computing doc_count plus all
    * metric leaves of `subs`; recurse into nested bucket subs.
    */
  /** Flattened-tree semantics: output rows are the DEEPEST level's rows
    * (leaf buckets, or top_hits rows); every shallower level's metrics and
    * doc_count are joined onto them by the bucket-path prefix (named
    * `<ownerName>_doc_count` to keep the leaf's own `doc_count` column).
    * The join keeps THIS level's buckets even when the deeper level has no
    * rows for them (right outer): a parent bucket whose sub-agg is empty
    * renders with an empty `buckets` array, as the reference does, instead
    * of silently vanishing; its padding rows carry a null deeper key, which
    * the renderer drops at the deeper level. One bucket sub-aggregation per
    * level — siblings express as separate root aggs (the output is a
    * rectangle, not a tree).
    */
  private def withSubs(df: DataFrame, ownerName: String,
      groupCols: List[(String, Column)], subs: Map[String, Node],
      withTotals: Boolean): DataFrame = {
    val metricSubs = subs.collect { case (n, m: Metric) => (n, m) }.toSeq.sortBy(_._1)
    val topHitsSubs = subs.collect { case (n, t: TopHits) => (n, t) }.toSeq.sortBy(_._1)
    val bucketSubs = (subs -- metricSubs.map(_._1) -- topHitsSubs.map(_._1)).toSeq.sortBy(_._1)
    require(bucketSubs.size <= 1,
      "flattened output supports one bucket sub-aggregation per level; use sibling root aggs")
    require(topHitsSubs.size <= 1, "one top_hits per level")
    require(bucketSubs.isEmpty || topHitsSubs.isEmpty,
      "top_hits alongside a deeper bucket agg is unsupported in flattened output")

    val metricCols = metricSubs.flatMap { case (n, m) => metricColumns(n, m) }
    def here: DataFrame = expandSketch(
      aggregateAt(df, groupCols, metricCols, groupCols.map(_._1)), metricSubs)

    (bucketSubs.headOption, topHitsSubs.headOption) match {
      case (None, None) => here
      case (Some((subName, subNode)), None) =>
        val deeper = compileOne(df, subName, subNode, groupCols, withTotals)
        // this level's doc_count (and metrics, if any) always join onto the
        // leaf rows — renderJson rebuilds the bucket tree from them. The
        // rename is keyed by the OWNING aggregation's name (a FilterAgg adds
        // no group column, so deriving it from groupCols would collide with
        // the parent level's own rename).
        val hereR = here.withColumnRenamed("doc_count", s"${ownerName}_doc_count")
        if (groupCols.isEmpty) deeper.crossJoin(broadcast(hereR))
        else deeper.join(hereR, groupCols.map(_._1), "right_outer")
      case (None, Some((thName, th))) =>
        val hits = topHitsRows(df, groupCols, thName, th)
        // the BUCKET frame is preserved and hit rows ride along: a bucket
        // whose hits are all cut by `from` (e.g. 1 doc, from=1) must keep
        // its doc_count/metrics row with a null rank (renderNode emits an
        // empty hits array for it) — joining the other way dropped the
        // bucket and grid padding then mis-reported doc_count 0
        // (deep-fuzz seed 53)
        if (groupCols.isEmpty) here.join(broadcast(hits), lit(true), "left")
        else here.join(hits, groupCols.map(_._1), "left")
      case (Some(_), Some(_)) => throw new IllegalStateException("unreachable")
    }
  }

  /** Per-bucket top-`size` rows by the request's sort — declarative window
    * top-k (Catalyst runs per-partition heaps; no global sort).
    */
  private def topHitsRows(df: DataFrame, groupCols: List[(String, Column)],
      name: String, th: TopHits): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withKeys = groupCols.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
    val sortCols = th.sort.map { case (f, asc) => if (asc) col(f).asc else col(f).desc }
    val w = Window.partitionBy(groupCols.map(g => col(g._1)): _*).orderBy(sortCols: _*)
    val fields = expandDocValue(th.source, df.columns.toSeq)
    withKeys.withColumn(s"${name}_rank", row_number().over(w))
      .where(col(s"${name}_rank") > th.from && col(s"${name}_rank") <= th.from + th.size)
      .select(groupCols.map(g => col(g._1)) ++
        (col(s"${name}_rank") +: fields.map(col)): _*)
  }

  /** Split each sketch-percentiles array column into per-percent columns
    * (same output shape as the exact path).
    */
  private def expandSketch(df: DataFrame, metrics: Seq[(String, Metric)]): DataFrame =
    metrics.filter(nm => nm._2.kind == "percentiles" && nm._2.sketch).foldLeft(df) {
      case (d, (n, m)) =>
        m.percents.zipWithIndex.foldLeft(d) { case (dd, (p, i)) =>
          dd.withColumn(pctCol(n, p), col(s"__${n}_pcts")(i))
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
