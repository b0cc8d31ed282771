package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.agg.AggRequest
import graft.agg.AggRequest._

/** Property fuzz for the ES-style aggregation tree: random nested requests
  * (terms / histogram / date_histogram / range / filter buckets × metric
  * leaves × order / size / min_doc_count / missing / bounds / top_hits) run
  * through `AggRequest.runJson` and compared — structurally, with float
  * tolerance — against an INDEPENDENT evaluator written directly over the
  * collected rows (plain Scala groupBy/sort, no Spark). The evaluator
  * implements the reference semantics (`agg_req.rs` tree, `term_agg.rs`
  * per-parent size/order, `histogram.rs` grid fill, `range.rs` implicit
  * buckets, `stats.rs` empty-accumulator conventions), so a pass pins the
  * whole Catalyst lowering, the flattened-frame joins AND the JSON tree
  * rebuild at once.
  */
object AggFuzzSpec {
  /** one fuzz-corpus row (top-level so Spark can derive its encoder) */
  final case class D(id: Long, grp: String, cat: String, v: java.lang.Double,
      n: Long, ts: java.sql.Timestamp)
}

class AggFuzzSpec extends AnyFunSuite {
  import AggFuzzSpec.D
  lazy val spark = TestSpark.spark

  val BaseMs = 1735689600000L // 2025-01-01T00:00:00Z
  val rows: Vector[D] = {
    val rng = new scala.util.Random(42)
    Vector.tabulate(400) { i =>
      val grp = "g" + (if (rng.nextInt(10) < 6) 0 else 1 + rng.nextInt(2))
      val cat = if (rng.nextInt(10) == 0) null else "c" + rng.nextInt(6)
      val v: java.lang.Double =
        if (rng.nextInt(12) == 0) null
        else java.lang.Double.valueOf((rng.nextInt(1000) - 500) / 100.0)
      D(i.toLong, grp, cat, v, rng.nextInt(100).toLong,
        new java.sql.Timestamp(BaseMs + rng.nextInt(4 * 86400).toLong * 1000L))
    }
  }
  lazy val df: DataFrame = {
    import spark.implicits._
    spark.createDataset(rows).toDF().repartition(3)
  }

  // ---- field access ----------------------------------------------------
  private def numField(d: D, f: String): Option[Double] = f match {
    case "v" => Option(d.v).map(_.doubleValue)
    case "n" => Some(d.n.toDouble)
    case "id" => Some(d.id.toDouble)
    case "ts" => Some(d.ts.getTime.toDouble)
    case _ => None
  }
  private def strField(d: D, f: String): String = f match {
    case "grp" => d.grp
    case "cat" => d.cat
    case _ => null
  }

  /** SQL predicate ↔ independent Scala evaluation, paired by construction. */
  val predicates: Seq[(String, D => Boolean)] = Seq(
    ("n % 3 = 0", d => d.n % 3 == 0),
    ("v > 0.5", d => d.v != null && d.v > 0.5),
    ("grp = 'g0'", d => d.grp == "g0"),
    ("n % 2 = 1 OR grp = 'g1'", d => d.n % 2 == 1 || d.grp == "g1"),
    ("v <= -1.25 AND n < 80", d => d.v != null && d.v <= -1.25 && d.n < 80))
  private def predFn(sql: String): D => Boolean =
    predicates.find(_._1 == sql).map(_._2)
      .getOrElse(throw new IllegalArgumentException(sql))

  // ---- request JSON rendering ------------------------------------------
  private def subsReq(subs: Map[String, Node]): List[(String, JValue)] =
    if (subs.isEmpty) Nil
    else List("aggs" -> JObject(subs.toList.sortBy(_._1).map { case (n, s) => n -> nodeReq(s) }))

  private def boundsReq(k: String, b: Option[(Double, Double)]): List[(String, JValue)] =
    b.toList.map { case (lo, hi) =>
      k -> JObject(List("min" -> JDouble(lo), "max" -> JDouble(hi)))
    }

  private def ieReq(k: String, p: Option[Either[String, Seq[String]]]): List[(String, JValue)] =
    p.toList.map {
      case Left(re) => k -> (JString(re): JValue)
      case Right(vs) => k -> (JArray(vs.toList.map(JString(_))): JValue)
    }

  private def nodeReq(n: Node): JObject = n match {
    case Terms(f, size, mdc, subs, missing, order, showErr, include, exclude) =>
      JObject(("terms" -> JObject(List(
        "field" -> JString(f), "size" -> JInt(size), "min_doc_count" -> JInt(mdc)) ++
        missing.map(m => "missing" -> JString(m.toString)).toList ++
        (if (showErr) List("show_term_doc_count_error" -> JBool(true)) else Nil) ++
        ieReq("include", include) ++ ieReq("exclude", exclude) ++
        order.map { case (t, asc) =>
          "order" -> JObject(List(t -> JString(if (asc) "asc" else "desc")))
        }.toList)) :: subsReq(subs))
    case Histogram(f, interval, offset, subs, eb, hb, mdc, keyed) =>
      JObject(("histogram" -> JObject(List(
        "field" -> JString(f), "interval" -> JDouble(interval),
        "offset" -> JDouble(offset), "min_doc_count" -> JInt(mdc),
        "keyed" -> JBool(keyed)) ++
        boundsReq("extended_bounds", eb) ++ boundsReq("hard_bounds", hb))) ::
        subsReq(subs))
    case DateHistogram(f, ivMs, offMs, subs, eb, hb, mdc, keyed) =>
      JObject(("date_histogram" -> JObject(List(
        "field" -> JString(f), "fixed_interval" -> JString(s"${ivMs}ms"),
        "offset" -> JString(s"${offMs}ms"), "min_doc_count" -> JInt(mdc),
        "keyed" -> JBool(keyed)) ++
        boundsReq("extended_bounds", eb) ++ boundsReq("hard_bounds", hb))) ::
        subsReq(subs))
    case RangeAgg(f, ranges, subs, keyed) =>
      JObject(("range" -> JObject(List(
        "field" -> JString(f), "keyed" -> JBool(keyed),
        "ranges" -> JArray(ranges.toList.map(r => JObject(
          r.key.map(k => "key" -> JString(k)).toList ++
            r.from.map(x => "from" -> JDouble(x)).toList ++
            r.to.map(x => "to" -> JDouble(x)).toList)))))) :: subsReq(subs))
    case FilterAgg(pred, subs) =>
      JObject(("filter" -> JObject(List("query_string" -> JString(pred)))) ::
        subsReq(subs))
    case Metric(kind, f, pcts, _, missing, sigma, keyed) =>
      val body = List("field" -> JString(f)) ++
        missing.map(mv => "missing" -> JDouble(mv)).toList ++
        sigma.map(s => "sigma" -> JDouble(s)).toList ++
        (if (!keyed) List("keyed" -> JBool(false)) else Nil) ++
        (if (kind == "percentiles")
          List("percents" -> JArray(pcts.toList.map(p =>
            if (p == math.rint(p)) JInt(p.toInt) else JDouble(p)))) else Nil)
      JObject(List(kind -> JObject(body)))
    case TopHits(size, sort, source, from) =>
      JObject(List("top_hits" -> JObject(List(
        "size" -> JInt(size), "from" -> JInt(from),
        "sort" -> JArray(sort.toList.map { case (f, asc) =>
          JObject(List(f -> JObject(List("order" -> JString(if (asc) "asc" else "desc")))))
        }),
        "docvalue_fields" -> JArray(source.toList.map(JString(_)))))))
  }

  private def reqJson(aggs: Map[String, Node]): String =
    JsonMethods.compact(JsonMethods.render(
      JObject(List("aggs" -> JObject(aggs.toList.sortBy(_._1).map { case (n, s) =>
        n -> nodeReq(s)
      })))))

  // ---- independent evaluator -------------------------------------------
  private def jnum(o: Option[Double]): JValue = o.map(JDouble(_)).getOrElse(JNull)

  /** Spark's exact `percentile`: rank interpolation over the sorted values. */
  private def pctile(sorted: IndexedSeq[Double], p: Double): Double = {
    val pos = (p / 100.0) * (sorted.size - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
  }

  /** `missing` substitutes the value for docs lacking the field — every doc
    * then contributes (the reference's per-metric `missing: Option<f64>`).
    */
  private def metricVals(m: Metric, ds: Seq[D]): Seq[Double] = m.missing match {
    case Some(mv) => ds.map(d => numField(d, m.field).getOrElse(mv))
    case None => ds.flatMap(numField(_, m.field))
  }

  private def metricEval(m: Metric, ds: Seq[D]): JValue = {
    val vals = metricVals(m, ds)
    def opt[A](f: => A): Option[Double] =
      if (vals.isEmpty) None else Some(f.asInstanceOf[Number].doubleValue)
    m.kind match {
      case "avg" => JObject(List("value" -> jnum(opt(vals.sum / vals.size))))
      case "min" => JObject(List("value" -> jnum(opt(vals.min))))
      case "max" => JObject(List("value" -> jnum(opt(vals.max))))
      case "sum" => JObject(List("value" -> JDouble(vals.sum)))
      case "value_count" => JObject(List("value" -> JInt(vals.size)))
      case "stats" => JObject(List(
        "count" -> JInt(vals.size), "min" -> jnum(opt(vals.min)),
        "max" -> jnum(opt(vals.max)), "avg" -> jnum(opt(vals.sum / vals.size)),
        "sum" -> JDouble(vals.sum)))
      case "extended_stats" =>
        // extended_stats.rs finalize: variance family None for count <= 1,
        // sum_of_squares None for count == 0, bounds = avg ± sigma·std
        val mean = if (vals.isEmpty) 0.0 else vals.sum / vals.size
        val m2 = vals.map(x => (x - mean) * (x - mean)).sum
        val varp = if (vals.size > 1) Some(m2 / vals.size) else None
        val vars = if (vals.size > 1) Some(m2 / (vals.size - 1)) else None
        val sd = varp.map(math.sqrt); val sds = vars.map(math.sqrt)
        val sig = m.sigma.getOrElse(2.0)
        val bounds: JValue = (sd, sds) match {
          case (Some(d), Some(ds)) => JObject(List(
            "upper" -> JDouble(mean + d * sig), "lower" -> JDouble(mean - d * sig),
            "upper_sampling" -> JDouble(mean + ds * sig),
            "lower_sampling" -> JDouble(mean - ds * sig),
            "upper_population" -> JDouble(mean + d * sig),
            "lower_population" -> JDouble(mean - d * sig)))
          case _ => JNull
        }
        JObject(List(
          "count" -> JInt(vals.size), "min" -> jnum(opt(vals.min)),
          "max" -> jnum(opt(vals.max)), "avg" -> jnum(opt(vals.sum / vals.size)),
          "sum" -> JDouble(vals.sum),
          "sum_of_squares" -> jnum(opt(vals.map(x => x * x).sum)),
          "variance" -> jnum(varp), "variance_population" -> jnum(varp),
          "variance_sampling" -> jnum(vars),
          "std_deviation" -> jnum(sd), "std_deviation_population" -> jnum(sd),
          "std_deviation_sampling" -> jnum(sds),
          "std_deviation_bounds" -> bounds))
      case "percentiles" =>
        val sorted = vals.sorted.toIndexedSeq
        def v(p: Double): JValue =
          if (sorted.isEmpty) JNull else JDouble(pctile(sorted, p))
        JObject(List("values" ->
          (if (m.keyed) JObject(m.percents.toList.map(p => p.toString -> v(p)))
          else JArray(m.percents.toList.map(p =>
            JObject(List("key" -> JDouble(p), "value" -> v(p))))))))
      case other => throw new IllegalArgumentException(other)
    }
  }

  /** The Spark COLUMN value an order target resolves to for one bucket
    * (null when the aggregate is null — sum/avg/min/max over no values).
    */
  private def orderMetricVal(target: String, subs: Map[String, Node], ds: Seq[D]): Option[Double] = {
    val (base, leafOpt) = target.split("\\.", 2) match {
      case Array(b, l) => (b, Some(l))
      case Array(b) => (b, None)
    }
    val m = subs(base).asInstanceOf[Metric]
    val vals = metricVals(m, ds)
    val leaf = leafOpt.getOrElse(m.kind match {
      case "value_count" => "count"
      case k => k
    })
    leaf match {
      case "count" => Some(vals.size.toDouble)
      case "sum" => if (vals.isEmpty) None else Some(vals.sum)
      case "avg" => if (vals.isEmpty) None else Some(vals.sum / vals.size)
      case "min" => if (vals.isEmpty) None else Some(vals.min)
      case "max" => if (vals.isEmpty) None else Some(vals.max)
      case p if p.forall(_.isDigit) =>
        val sorted = vals.sorted.toIndexedSeq
        if (sorted.isEmpty) None else Some(pctile(sorted, p.toDouble))
      case other => throw new IllegalArgumentException(s"order leaf $other")
    }
  }

  /** `atRoot` tracks "no KEYED ancestor": a filter adds no group columns, so
    * range/histogram below a root-level filter still compile with an empty
    * parent path and materialize their bucket definitions unconditionally.
    */
  private def subsEval(subs: Map[String, Node], ds: Seq[D],
      atRoot: Boolean = false): List[(String, JValue)] =
    subs.toList.sortBy(_._1).map { case (n, s) => n -> evalNamed(n, s, ds, atRoot) }

  private def termsEval(t: Terms, ds: Seq[D]): JValue = {
    // include/exclude filter real terms pre-collection (full-match regex
    // semantics via String.matches); missing-bucket docs bypass the filter
    def allowed(raw: String): Boolean =
      t.include.forall {
        case Left(re) => raw.matches(re); case Right(vs) => vs.contains(raw)
      } && t.exclude.forall {
        case Left(re) => !raw.matches(re); case Right(vs) => !vs.contains(raw)
      }
    val entries: Seq[(String, D)] = ds.flatMap { d =>
      val raw = strField(d, t.field)
      if (raw != null) { if (allowed(raw)) Some((raw, d)) else None }
      else t.missing.map(mv => (mv.toString, d))
    }
    val counted: Seq[(String, Seq[D])] = entries.groupBy(_._1).view
      .mapValues(_.map(_._2)).toSeq
      .filter(_._2.size >= t.minDocCount)
    // SELECTION — replicates the plan-side orderBy/row_number (Spark null
    // ordering: asc → nulls first, desc → nulls last; key-asc tiebreak)
    val selected: Seq[(String, Seq[D])] = t.order match {
      case None | Some(("_count", false)) =>
        counted.sortBy { case (k, b) => (-b.size, k) }.take(t.size)
      case Some(("_count", true)) =>
        counted.sortBy { case (k, b) => (b.size, k) }.take(t.size)
      case Some(("_key", asc)) =>
        val s = counted.sortBy(_._1)
        (if (asc) s else s.reverse).take(t.size)
      case Some((target, asc)) =>
        counted.map { case (k, b) => (k, b, orderMetricVal(target, t.subs, b)) }
          .sortWith { (a, b) =>
            val c = (a._3, b._3) match {
              case (None, None) => 0
              case (None, _) => if (asc) -1 else 1
              case (_, None) => if (asc) 1 else -1
              case (Some(x), Some(y)) =>
                if (asc) java.lang.Double.compare(x, y) else java.lang.Double.compare(y, x)
            }
            if (c != 0) c < 0 else a._1 < b._1
          }
          .take(t.size).map(x => (x._1, x._2))
    }
    // PRESENTATION — replicates the renderer's bucketSort (numOf: null/
    // non-numeric → NaN under the total ordering; desc = full reverse)
    val presented: Seq[(String, Seq[D])] = t.order match {
      case Some(("_key", asc)) =>
        val s = selected.sortBy { case (k, _) => (Double.NaN, k) }
        if (asc) s else s.reverse
      case Some((target, asc)) if target != "_count" =>
        val s = selected.sortBy { case (k, b) =>
          (orderMetricVal(target, t.subs, b).getOrElse(Double.NaN), k)
        }
        if (asc) s else s.reverse
      case Some(("_count", true)) => selected.sortBy { case (k, b) => (b.size, k) }
      case _ => selected.sortBy { case (k, b) => (-b.size, k) }
    }
    // sum_other_doc_count: docs in buckets past min_doc_count that fell
    // beyond `size` (reference cut_off_buckets); error bound is exact-0
    val sumOther = counted.map(_._2.size.toLong).sum - selected.map(_._2.size.toLong).sum
    JObject(List("buckets" -> JArray(presented.toList.map { case (k, b) =>
      JObject(List("key" -> JString(k), "doc_count" -> JInt(b.size)) ++
        subsEval(t.subs, b))
    }), "sum_other_doc_count" -> JInt(BigInt(sumOther))) ++
      (if (t.showDocCountError)
        List("doc_count_error_upper_bound" -> JInt(0)) else Nil))
  }

  /** Spark's `round(double)` (BigDecimal HALF_UP), which differs from
    * `math.round` on negative halves.
    */
  private def sparkRound(x: Double): Long =
    new java.math.BigDecimal(x).setScale(0, java.math.RoundingMode.HALF_UP).longValue

  /** Rust `{}` float format — the keyed-bucket map key for numeric keys. */
  private def fmtF64(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString

  private def histEval(field: String, interval: Double, offset: Double,
      subs: Map[String, Node], eb: Option[(Double, Double)],
      hb: Option[(Double, Double)], mdc: Long, ds: Seq[D], atRoot: Boolean,
      isDate: Boolean, keyed: Boolean): JValue = {
    def keyOf(x: Double): Double = math.floor((x - offset) / interval) * interval + offset
    val valued: Seq[(Double, D)] = ds.flatMap(d => numField(d, field).map(v => (v, d)))
      .filter { case (x, _) => hb.forall { case (lo, hi) => x >= lo && x <= hi } }
    val byKey: Map[Double, Seq[D]] =
      valued.groupBy { case (x, _) => keyOf(x) }.view.mapValues(_.map(_._2)).toMap
    val buckets: Seq[(Double, Seq[D])] =
      if (mdc > 0) byKey.toSeq.filter(_._2.size >= mdc).sortBy(_._1)
      else if (!atRoot && valued.isEmpty) Nil // no span row for this parent
      else {
        // span = data key min/max, widened by extended_bounds, clipped by
        // hard_bounds — least/greatest skip the null side, like Spark's
        var lo = byKey.keys.minOption
        var hi = byKey.keys.maxOption
        eb.foreach { case (l, h) =>
          lo = Some(lo.fold(keyOf(l))(math.min(_, keyOf(l))))
          hi = Some(hi.fold(keyOf(h))(math.max(_, keyOf(h))))
        }
        hb.foreach { case (l, h) =>
          lo = lo.map(math.max(_, keyOf(l))).orElse(Some(keyOf(l)))
          hi = hi.map(math.min(_, keyOf(h))).orElse(Some(keyOf(h)))
        }
        (lo, hi) match {
          case (Some(l), Some(h)) =>
            val n = sparkRound((h - l) / interval)
            if (n < 0) Nil
            else (0L to n).map { i =>
              val k = keyOf(l + (i + 0.5) * interval)
              (k, byKey.getOrElse(k, Nil))
            }
          case _ => Nil
        }
      }
    val objs: List[(String, JObject)] = buckets.toList.map { case (k, b) =>
      val keyFields =
        if (isDate) List("key" -> JInt(BigInt(k.toLong)), "key_as_string" ->
          JString(java.time.Instant.ofEpochMilli(k.toLong).toString))
        else List("key" -> JDouble(k))
      fmtF64(k) -> JObject(keyFields ++ List("doc_count" -> JInt(b.size)) ++ subsEval(subs, b))
    }
    JObject(List("buckets" ->
      (if (keyed) JObject(objs.map { case (k, o) => k -> (o: JValue) })
      else JArray(objs.map(_._2)))))
  }

  private def rangeEval(ra: RangeAgg, ds: Seq[D], atRoot: Boolean): JValue = {
    // the implicit *-x / x-* buckets, replicated from the request shape
    val defs =
      (if (ra.ranges.headOption.exists(_.from.isDefined))
        Seq(RangeSpec(None, None, ra.ranges.head.from)) else Nil) ++
        ra.ranges ++
        (if (ra.ranges.lastOption.exists(_.to.isDefined))
          Seq(RangeSpec(None, ra.ranges.last.to, None)) else Nil)
    // date-typed field → RFC3339 implicit labels + from/to_as_string
    val isDate = ra.field == "ts"
    def fmt(d: Double): String =
      if (isDate) java.time.Instant.ofEpochMilli(d.toLong).toString
      else if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
      else d.toString
    def label(r: RangeSpec): String =
      r.key.getOrElse(s"${r.from.map(fmt).getOrElse("*")}-${r.to.map(fmt).getOrElse("*")}")
    def asStrings(r: RangeSpec): List[(String, JValue)] =
      if (!isDate) Nil
      else r.from.map(x => "from_as_string" -> (JString(fmt(x)): JValue)).toList ++
        r.to.map(x => "to_as_string" -> (JString(fmt(x)): JValue)).toList
    val valued = ds.flatMap(d => numField(d, ra.field).map(v => (v, d)))
    def wrap(objs: List[(String, JObject)]): JValue =
      JObject(List("buckets" ->
        (if (ra.keyed) JObject(objs.map { case (k, o) => k -> (o: JValue) })
        else JArray(objs.map(_._2)))))
    // under a parent the bucket definitions materialize only when the parent
    // has ≥1 non-null value (the plan derives parents from the data rows)
    if (!atRoot && valued.isEmpty) wrap(Nil)
    else wrap(defs.toList.map { r =>
      val b = valued.filter { case (x, _) =>
        r.from.forall(x >= _) && r.to.forall(x < _)
      }.map(_._2)
      label(r) -> JObject(List("key" -> JString(label(r))) ++
        r.from.map(x => "from" -> JDouble(x)).toList ++
        r.to.map(x => "to" -> JDouble(x)).toList ++
        asStrings(r) ++
        List("doc_count" -> JInt(b.size)) ++ subsEval(ra.subs, b))
    })
  }

  private def topHitsEval(name: String, th: TopHits, ds: Seq[D]): JValue = {
    val sorted = th.sort.foldRight(ds) { case ((f, asc), acc) =>
      val s = acc.sortBy(d => numField(d, f).getOrElse(Double.NaN))
      if (asc) s else s.reverse
    }.slice(th.from, th.from + th.size)
    JObject(List("hits" -> JArray(sorted.toList.zipWithIndex.map { case (d, i) =>
      JObject((s"${name}_rank" -> JInt(th.from + i + 1)) :: th.source.toList.map {
        case "id" => "id" -> JInt(BigInt(d.id))
        case "grp" => "grp" -> JString(d.grp)
        case "n" => "n" -> JInt(BigInt(d.n))
        case other => throw new IllegalArgumentException(other)
      })
    })))
  }

  private def evalNode(node: Node, ds: Seq[D], atRoot: Boolean): JValue = node match {
    case m: Metric => metricEval(m, ds)
    case t: Terms => termsEval(t, ds)
    case Histogram(f, iv, off, subs, eb, hb, mdc, keyed) =>
      histEval(f, iv, off, subs, eb, hb, mdc, ds, atRoot, isDate = false, keyed = keyed)
    case DateHistogram(f, ivMs, offMs, subs, eb, hb, mdc, keyed) =>
      histEval(f, ivMs.toDouble, offMs.toDouble, subs, eb, hb, mdc, ds, atRoot,
        isDate = true, keyed = keyed)
    case ra: RangeAgg => rangeEval(ra, ds, atRoot)
    case _: FilterAgg | _: TopHits =>
      throw new IllegalStateException("routed via evalNamed") // needs name/atRoot
  }

  /** top_hits needs its own name for the rank column; filter propagates
    * `atRoot` (it adds no parent key).
    */
  private def evalNamed(name: String, node: Node, ds: Seq[D], atRoot: Boolean): JValue =
    node match {
      case th: TopHits => topHitsEval(name, th, ds)
      case FilterAgg(pred, subs) =>
        val b = ds.filter(predFn(pred))
        JObject(("doc_count" -> JInt(b.size)) :: subsEval(subs, b, atRoot))
      case other => evalNode(other, ds, atRoot)
    }

  private def expectedJson(aggs: Map[String, Node], ds: Seq[D]): JValue =
    JObject(aggs.toList.sortBy(_._1).map { case (n, s) => n -> evalNamed(n, s, ds, atRoot = true) })

  // ---- structural compare with numeric tolerance ------------------------
  private def numOfJ(j: JValue): Option[Double] = j match {
    case JInt(i) => Some(i.toDouble)
    case JLong(l) => Some(l.toDouble)
    case JDouble(d) => Some(d)
    case JDecimal(d) => Some(d.toDouble)
    case _ => None
  }

  private def diffs(a: JValue, b: JValue, path: String, out: scala.collection.mutable.Buffer[String]): Unit =
    (numOfJ(a), numOfJ(b)) match {
      case (Some(x), Some(y)) =>
        if (math.abs(x - y) > 1e-6 + 1e-6 * math.max(math.abs(x), math.abs(y)))
          out += s"$path: $x != $y"
      case _ => (a, b) match {
        case (JObject(fa), JObject(fb)) =>
          val ma = fa.toMap; val mb = fb.toMap
          (ma.keySet ++ mb.keySet).toSeq.sorted.foreach { k =>
            (ma.get(k), mb.get(k)) match {
              case (Some(x), Some(y)) => diffs(x, y, s"$path.$k", out)
              case (x, y) => out += s"$path.$k: present ${x.isDefined} vs ${y.isDefined}"
            }
          }
        case (JArray(xa), JArray(xb)) =>
          if (xa.size != xb.size) out += s"$path: array size ${xa.size} != ${xb.size}"
          else xa.zip(xb).zipWithIndex.foreach { case ((x, y), i) => diffs(x, y, s"$path[$i]", out) }
        case (JString(x), JString(y)) => if (x != y) out += s"$path: '$x' != '$y'"
        case (JNull, JNull) | (JNothing, JNothing) => ()
        case (JBool(x), JBool(y)) => if (x != y) out += s"$path: $x != $y"
        case (x, y) => out += s"$path: ${x.getClass.getSimpleName}($x) != ${y.getClass.getSimpleName}($y)"
      }
    }

  private def check(aggs: Map[String, Node], data: Vector[D], frame: DataFrame,
      label: String): Unit = {
    val req = reqJson(aggs)
    val got = JsonMethods.parse(AggRequest.runJson(frame, req))
    val want = expectedJson(aggs, data)
    val out = scala.collection.mutable.Buffer.empty[String]
    diffs(got, want, "$", out)
    assert(out.isEmpty,
      s"\n[$label] request: $req\nmismatches:\n  ${out.take(12).mkString("\n  ")}\n" +
        s"got:  ${JsonMethods.compact(JsonMethods.render(got)).take(1500)}\n" +
        s"want: ${JsonMethods.compact(JsonMethods.render(want)).take(1500)}")
  }

  // ---- random request generator ----------------------------------------
  private final class Gen(seed: Int) {
    val rng = new scala.util.Random(seed)
    private var counter = 0
    def name(): String = { counter += 1; s"a$counter" }

    def metric(): (String, Metric) = {
      val kind = pick(Seq("avg", "min", "max", "sum", "value_count", "stats",
        "extended_stats", "percentiles"))
      val field = pick(Seq("v", "n"))
      (name(), Metric(kind, field,
        if (kind == "percentiles")
          (if (rng.nextInt(3) == 0) Seq(25.0, 50.0, 99.9) else Seq(25.0, 50.0, 95.0))
        else Nil,
        missing = if (field == "v" && rng.nextInt(4) == 0)
          Some((rng.nextInt(21) - 10).toDouble) else None,
        sigma = if (kind == "extended_stats" && rng.nextInt(3) == 0)
          Some(pick(Seq(1.0, 2.5, 3.0))) else None,
        keyed = kind != "percentiles" || rng.nextInt(3) != 0))
    }

    def pick[A](xs: Seq[A]): A = xs(rng.nextInt(xs.size))

    def orderFor(metrics: Seq[(String, Metric)]): Option[(String, Boolean)] = {
      if (rng.nextInt(2) == 0) return None
      val asc = rng.nextBoolean()
      val metricTargets = metrics.flatMap { case (n, m) => m.kind match {
        case "avg" | "min" | "max" | "sum" | "value_count" => Some(n)
        case "stats" | "extended_stats" => Some(s"$n.avg")
        case "percentiles" => Some(s"$n.50")
        case _ => None
      } }
      pick(Seq("_key", "_count") ++ metricTargets) match {
        case t => Some((t, asc))
      }
    }

    def bucket(depth: Int): (String, Node) = {
      val metrics = Seq.fill(rng.nextInt(3))(metric())
      val deeper: Seq[(String, Node)] =
        if (depth < 3 && rng.nextInt(100) < 55) Seq(bucket(depth + 1))
        else if (rng.nextInt(100) < 25)
          Seq((name(), TopHits(1 + rng.nextInt(3),
            Seq(("id", rng.nextBoolean())), Seq("id", "grp"),
            from = if (rng.nextInt(3) == 0) 1 + rng.nextInt(2) else 0)))
        else Nil
      val subs: Map[String, Node] = (metrics ++ deeper).toMap
      val n = name()
      val node = pick(Seq("terms", "terms", "hist", "date", "range", "range", "filter")) match {
        case "terms" =>
          Terms(pick(Seq("cat", "cat", "grp")), 1 + rng.nextInt(4),
            rng.nextInt(3).toLong, subs,
            missing = if (rng.nextInt(4) == 0) Some("(none)") else None,
            order = orderFor(metrics),
            showDocCountError = rng.nextInt(4) == 0,
            include = if (rng.nextInt(5) == 0)
              Some(pick(Seq(Left("[cg][0-3]"), Right(Seq("c0", "c1", "g0", "g1")))))
            else None,
            exclude = if (rng.nextInt(5) == 0)
              Some(pick(Seq(Left("c2|g1"), Right(Seq("c3", "g2")))))
            else None)
        case "hist" =>
          val mdc = if (rng.nextInt(3) == 0) 1L + rng.nextInt(2) else 0L
          val eb = if (mdc == 0 && rng.nextInt(3) == 0)
            Some((-8.0 + rng.nextInt(4), 5.0 + rng.nextInt(4))) else None
          val hb = if (rng.nextInt(4) == 0)
            Some((-4.0 + rng.nextInt(3), 1.0 + rng.nextInt(4))) else None
          Histogram("v", pick(Seq(1.0, 2.5, 5.0)), pick(Seq(0.0, 0.1)), subs,
            extendedBounds = eb, hardBounds = hb, minDocCount = mdc,
            keyed = rng.nextInt(4) == 0)
        case "date" =>
          val mdc = if (rng.nextInt(3) == 0) 1L else 0L
          val eb = if (mdc == 0 && rng.nextInt(4) == 0)
            Some((BaseMs.toDouble - 86400000.0, BaseMs.toDouble + 5 * 86400000.0)) else None
          DateHistogram("ts", pick(Seq(21600000L, 43200000L, 86400000L)),
            pick(Seq(0L, 1800000L)), subs, extendedBounds = eb, minDocCount = mdc,
            keyed = rng.nextInt(4) == 0)
        case "range" =>
          val field = pick(Seq("v", "n", "ts"))
          val cuts = (if (field == "v") Seq(-3.0, -1.25, 0.0, 1.5, 3.0)
            else if (field == "ts") Seq(0, 1, 2, 3).map(k => BaseMs + k * 86400000.0)
            else Seq(10.0, 25.0, 50.0, 75.0)).filter(_ => rng.nextBoolean()).sorted
          val cs =
            if (cuts.size >= 2) cuts
            else if (field == "v") Seq(-1.0, 2.0)
            else if (field == "ts") Seq(BaseMs + 86400000.0, BaseMs + 3 * 86400000.0)
            else Seq(20.0, 60.0)
          val openLo = rng.nextBoolean(); val openHi = rng.nextBoolean()
          val bounds = cs.sliding(2).map(w =>
            RangeSpec(if (rng.nextInt(4) == 0) Some(s"k${w.head}") else None,
              Some(w.head), Some(w.last))).toSeq
          val specs =
            (if (openLo) Seq(RangeSpec(None, None, Some(cs.head))) else Nil) ++ bounds ++
              (if (openHi) Seq(RangeSpec(None, Some(cs.last), None)) else Nil)
          RangeAgg(field, specs, subs, keyed = rng.nextInt(4) == 0)
        case "filter" => FilterAgg(pick(predicates.map(_._1)), subs)
      }
      (n, node)
    }

    def request(): Map[String, Node] =
      Seq.fill(1 + rng.nextInt(2))(bucket(1)).toMap
  }

  // ---- directed cases ----------------------------------------------------
  test("terms without `missing` drops docs lacking the field (no null bucket)") {
    check(Map("t" -> Terms("cat", 10, 0L, Map("m" -> Metric("avg", "v", Nil)))),
      rows, df, "directed-null-bucket")
  }

  test("filter root with deeper terms reports the filter's own doc_count") {
    check(Map("f" -> FilterAgg("v <= -1.25 AND n < 80",
      Map("t" -> Terms("grp", 5, 0L, Map("m" -> Metric("sum", "n", Nil)))))),
      rows, df, "directed-filter-count")
  }

  test("parent bucket with empty sub-aggregation renders, with empty buckets") {
    import spark.implicits._
    // g1's v is entirely null → its histogram/terms sub-trees are empty
    val tiny = Vector.tabulate(12) { i =>
      D(i.toLong, if (i % 3 == 0) "g1" else "g0",
        if (i % 3 == 0) null else "c" + (i % 2),
        if (i % 3 == 0) null else java.lang.Double.valueOf(i / 4.0),
        i.toLong, new java.sql.Timestamp(BaseMs + i * 1000L))
    }
    val tdf = spark.createDataset(tiny).toDF()
    check(Map("t" -> Terms("grp", 5, 0L, Map(
      "h" -> Histogram("v", 1.0, 0.0, Map("m" -> Metric("stats", "v", Nil)))))),
      tiny, tdf, "directed-empty-parent-hist")
    check(Map("t" -> Terms("grp", 5, 0L, Map(
      "c" -> Terms("cat", 3, 0L, Map("m" -> Metric("sum", "v", Nil)))))),
      tiny, tdf, "directed-empty-parent-terms")
    check(Map("t" -> Terms("grp", 5, 0L, Map(
      "r" -> RangeAgg("v", Seq(RangeSpec(None, Some(0.0), Some(2.0))), Map.empty)))),
      tiny, tdf, "directed-empty-parent-range")
  }

  test("nested range buckets keep request order; zero-grid top_hits are empty") {
    check(Map("t" -> Terms("grp", 3, 0L, Map(
      "r" -> RangeAgg("v", Seq(
        RangeSpec(Some("mid"), Some(-1.0), Some(1.0)),
        RangeSpec(None, Some(1.0), Some(9.0))),
        Map("m" -> Metric("value_count", "v", Nil)))))),
      rows, df, "directed-nested-range-order")
    check(Map("h" -> Histogram("v", 2.5, 0.0, Map(
      "th" -> TopHits(2, Seq(("id", true)), Seq("id", "grp"))),
      extendedBounds = Some((-10.0, 10.0)))),
      rows, df, "directed-zero-bucket-tophits")
  }

  test("top_hits `from` >= a bucket's doc_count keeps the bucket (seed-53 regression)") {
    import spark.implicits._
    // one bucket with a single doc: from=1 cuts every hit, but the bucket
    // row (doc_count 1, sibling metrics) must survive — the old hits-side
    // left join dropped it and grid padding mis-reported doc_count 0
    val tiny = Vector.tabulate(7) { i =>
      D(i.toLong, "g0", "c" + (i % 2),
        java.lang.Double.valueOf(if (i == 0) -4.99 else 2.0 + i / 10.0),
        i.toLong, new java.sql.Timestamp(BaseMs + i * 1000L))
    }
    val tdf = spark.createDataset(tiny).toDF()
    check(Map("h" -> Histogram("v", 5.0, 0.1, Map(
      "m" -> Metric("max", "v", Nil),
      "th" -> TopHits(2, Seq(("id", false)), Seq("id", "grp"), from = 1)),
      extendedBounds = Some((-7.0, 5.0)))),
      tiny, tdf, "directed-tophits-from-singleton")
    // root-level: from beyond the corpus size keeps the root aggs
    check(Map("th" -> TopHits(3, Seq(("id", true)), Seq("id"), from = 7),
      "m" -> Metric("sum", "n", Nil)),
      tiny, tdf, "directed-tophits-from-root-overrun")
  }

  // ---- the fuzz ----------------------------------------------------------
  test("random nested agg trees match the independent evaluator") {
    val trials = Integer.getInteger("graft.aggfuzz.trials", 48).intValue
    var done = 0
    (0 until trials).foreach { seed =>
      val gen = new Gen(1000 + seed)
      val req = gen.request()
      check(req, rows, df, s"fuzz-seed-$seed")
      done += 1
    }
    info(s"$done random agg trees matched")
  }
}
