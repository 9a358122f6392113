package graft.api

import scala.collection.mutable.ArrayBuffer

import graft.observe.Metrics

/** The per-pipeline metrics query layer behind
  * `GET /api/v1/pipelines/:id/metrics` and `/:id/metrics/history`
  * (ref internal/api/services/metrics.go:38-377, handlers/metrics.go).
  *
  * The reference answers these routes by sending PromQL to an external
  * Prometheus that scraped its process counters. This engine keeps the
  * same two-layer shape with the pieces it already has: pipelines write
  * into scoped [[Metrics.Registry]] instances (the exposition the
  * `/metrics` route serves), and a [[MetricsHub.Sampler]] tick copies
  * each registry snapshot into an in-process [[MetricsHub.Store]] —
  * the stand-in for Prometheus's sample log. The store then evaluates
  * exactly the query shapes the reference issues: instant sum/max over
  * a source's series, `rate(...[1m])`, per-table instant reads, and a
  * ~100-point range evaluation for the history route.
  *
  * Scale note: the store holds ONE process's pipeline metrics at
  * sample-per-tick granularity with bounded retention — O(pipelines ×
  * metrics × samples) driver-side memory, the same budget the
  * reference delegates to its Prometheus. Nothing here touches the
  * data plane.
  */
object MetricsHub {

  /** Parsed history window (ref services/metrics.go ParseTimeRange):
    * `stepMs` targets ~100 data points, floored at one second. */
  final case class TimeRange(startMs: Long, endMs: Long, stepMs: Long)

  /** Named ranges first (15m/1h/6h/24h/7d), then a Go-style duration
    * literal (`90s`, `1h30m`, `1.5h`, `300ms`) — the same fallback
    * order as the reference's time.ParseDuration branch. Returns Left
    * for anything unparsable (the handler's 400). */
  def parseTimeRange(rangeStr: String, nowMs: Long): Either[String, TimeRange] = {
    val named: Map[String, Long] = Map(
      "15m" -> 15L * 60 * 1000, "1h" -> 3600L * 1000,
      "6h" -> 6L * 3600 * 1000, "24h" -> 24L * 3600 * 1000,
      "7d" -> 7L * 24 * 3600 * 1000)
    val durMs = named.get(rangeStr).map(Right(_))
      .getOrElse(parseGoDurationMs(rangeStr))
    durMs.map { d =>
      TimeRange(nowMs - d, nowMs, math.max(1000L, d / 100))
    }
  }

  /** Subset of Go `time.ParseDuration`: one or more `<decimal><unit>`
    * terms, units h/m/s/ms (sub-millisecond units parse but round into
    * the ms total). Negative/zero/empty are invalid for a range. */
  private[api] def parseGoDurationMs(s: String): Either[String, Long] = {
    val term = """([0-9]+(?:\.[0-9]+)?)(h|m(?!s)|s|ms|us|ns)""".r
    val terms = term.findAllMatchIn(s).toSeq
    val consumed = terms.map(_.matched).mkString
    if (terms.isEmpty || consumed != s)
      Left(s"invalid time range: $s")
    else {
      val unitMs: Map[String, Double] = Map(
        "h" -> 3600000.0, "m" -> 60000.0, "s" -> 1000.0,
        "ms" -> 1.0, "us" -> 0.001, "ns" -> 0.000001)
      val total = terms.map(m => m.group(1).toDouble * unitMs(m.group(2))).sum
      val ms = math.round(total)
      if (ms <= 0) Left(s"invalid time range: $s") else Right(ms)
    }
  }

  /** `formatDurationMetrics` (ref services/metrics.go:385-400):
    * `2h3m4s` / `3m4s` / `4s`. */
  def formatUptime(ms: Long): String = {
    val totalSec = math.max(0L, (ms + 500) / 1000)
    val h = totalSec / 3600
    val m = (totalSec % 3600) / 60
    val s = totalSec % 60
    if (h > 0) s"${h}h${m}m${s}s" else if (m > 0) s"${m}m${s}s" else s"${s}s"
  }

  /** Series identity: metric name (full `philotes_*` exposition name),
    * `source` label (pipeline name, as the reference labels it), and
    * optional `table` label ("" = the unlabelled process-total series). */
  private final case class Key(metric: String, source: String, table: String)

  /** In-process sample log + the four PromQL evaluation shapes the
    * metrics service issues. Thread-safe: buffers are locked per
    * series, the map is concurrent. Injected clock for specs. */
  final class Store(val clock: () => Long = () => System.currentTimeMillis(),
                    retentionMs: Long = 7L * 24 * 3600 * 1000,
                    stalenessMs: Long = 5L * 60 * 1000) {

    private val series =
      scala.collection.concurrent.TrieMap.empty[Key, ArrayBuffer[(Long, Double)]]

    def nowMs: Long = clock()

    def record(metric: String, source: String, table: String,
               value: Double, tsMs: Long): Unit = {
      val buf = series.getOrElseUpdate(Key(metric, source, table),
        ArrayBuffer.empty[(Long, Double)])
      buf.synchronized {
        // append-only in time: an out-of-order sample (two samplers, a
        // clock step) is dropped rather than corrupting binary search
        if (buf.isEmpty || buf.last._1 <= tsMs) {
          buf += ((tsMs, value))
          val cutoff = tsMs - retentionMs
          val drop = buf.indexWhere(_._1 >= cutoff) match {
            case -1 => buf.size - 1 // keep at least the newest
            case i  => i
          }
          if (drop > 0) buf.remove(0, drop)
        }
      }
    }

    /** Copy one registry snapshot in, attributed to `source`. Counter
      * names may carry an exposition-style `{table="..."}` suffix (the
      * per-table series the batch processor writes); everything else
      * lands as the unlabelled process-total series. */
    def recordRegistry(source: String, reg: Metrics.Registry,
                       tsMs: Long): Unit = {
      val labelled = """(.+)\{table="(.*)"\}""".r
      reg.snapshot().foreach {
        case (labelled(metric, table), v) => record(metric, source, table, v, tsMs)
        case (metric, v)                  => record(metric, source, "", v, tsMs)
      }
    }

    /** Prometheus instant semantics: the newest sample at-or-before `t`,
      * absent once staleness lapses. */
    private def valueAt(buf: ArrayBuffer[(Long, Double)], t: Long): Option[Double] =
      buf.synchronized {
        // linear from the tail: samples arrive in order and queries ask
        // near now; range evals walk backward through recent history
        var i = buf.size - 1
        while (i >= 0 && buf(i)._1 > t) i -= 1
        if (i >= 0 && buf(i)._1 > t - stalenessMs) Some(buf(i)._2) else None
      }

    /** A source can carry BOTH an unlabelled process-total series (the
      * loop/listener counter) and its per-table decomposition (the batch
      * processor's labelled counters); summing both would double-count.
      * Prometheus never faces this (its series all carry the table
      * label), so the aggregation rule is: when labelled series exist,
      * they ARE the total — the unlabelled series only stands in when
      * no decomposition was recorded. */
    private def sourceSeries(metric: String, source: String) = {
      val all = series.filter { case (k, _) =>
        k.metric == metric && k.source == source }
      val labelled = all.filter { case (k, _) => k.table.nonEmpty }
      if (labelled.nonEmpty) labelled else all
    }

    /** `sum(metric{source=})` at `t` — None when no series has data. */
    def sumInstant(metric: String, source: String, t: Long): Option[Double] = {
      val vs = sourceSeries(metric, source).values.flatMap(valueAt(_, t))
      if (vs.isEmpty) None else Some(vs.sum)
    }

    /** `max(metric{source=})` at `t`. */
    def maxInstant(metric: String, source: String, t: Long): Option[Double] = {
      val vs = sourceSeries(metric, source).values.flatMap(valueAt(_, t))
      if (vs.isEmpty) None else Some(vs.max)
    }

    /** `metric{source=,table=}` at `t` (per-table instant read). */
    def tableInstant(metric: String, source: String, table: String,
                     t: Long): Option[Double] =
      series.get(Key(metric, source, table)).flatMap(valueAt(_, t))

    /** `sum(rate(metric{source=}[window]))` at `t`: per series, the
      * counter delta between the first and last samples inside
      * `(t-window, t]` over their actual span — Prometheus's rate
      * without extrapolation. A counter reset (decrease) clamps to 0
      * rather than reporting a negative rate. */
    def ratePerSec(metric: String, source: String, t: Long,
                   windowMs: Long = 60000L): Option[Double] = {
      val rates = sourceSeries(metric, source).values.flatMap { buf =>
        buf.synchronized {
          val in = buf.filter(s => s._1 > t - windowMs && s._1 <= t)
          if (in.size < 2) None
          else {
            val dt = (in.last._1 - in.head._1) / 1000.0
            if (dt <= 0) None
            else Some(math.max(0.0, in.last._2 - in.head._2) / dt)
          }
        }
      }
      if (rates.isEmpty) None else Some(rates.sum)
    }

    /** Range evaluation grid: `start, start+step, ..., <= end` (the
      * ~100 aligned instants both engines' range queries share). */
    def grid(tr: TimeRange): Seq[Long] =
      (tr.startMs to tr.endMs by tr.stepMs)
  }

  /** The scrape loop (the reference's Prometheus scraper): every
    * `intervalMs`, snapshot each live (pipelineName, registry) pair
    * into the store. `providers` is consulted per tick so pipelines
    * can come and go. */
  final class Sampler(store: Store,
                      providers: () => Seq[(String, Metrics.Registry)],
                      intervalMs: Long = 5000L)
    extends AutoCloseable {
    private val ticker =
      new TickerDaemon("graft-metrics-sampler", intervalMs, () => tickNow())
    def start(): this.type = { ticker.start(); this }
    /** One synchronous scrape — the spec/deterministic-drive entry. */
    def tickNow(): Unit = {
      val ts = store.nowMs
      providers().foreach { case (name, reg) => store.recordRegistry(name, reg, ts) }
    }
    override def close(): Unit = ticker.close()
  }
}
