package graft.api

import org.scalatest.funsuite.AnyFunSuite

import graft.observe.Metrics

/** [[MetricsHub]] semantics under an injected clock: range parsing,
  * uptime formatting, instant/rate/staleness evaluation, the
  * labelled-series aggregation rule, and the sampler's registry copy.
  * No SparkSession — the hub is pure JVM. */
class MetricsHubSpec extends AnyFunSuite {

  private val Ev = "philotes_cdc_events_total"

  private def storeAt(t0: Long): (MetricsHub.Store, java.util.concurrent.atomic.AtomicLong) = {
    val clock = new java.util.concurrent.atomic.AtomicLong(t0)
    (new MetricsHub.Store(clock = () => clock.get()), clock)
  }

  test("parseTimeRange: named ranges, Go durations, ~100-point step") {
    def tr(s: String) = MetricsHub.parseTimeRange(s, 1000000000L)
    assert(tr("1h") === Right(MetricsHub.TimeRange(
      1000000000L - 3600000, 1000000000L, 36000)))
    assert(tr("15m").map(_.stepMs) === Right(9000L))
    assert(tr("7d").map(_.stepMs) === Right(7L * 24 * 3600 * 1000 / 100))
    // Go-duration fallback: compound terms, fractions, sub-second floor
    assert(tr("1h30m").map(t => t.endMs - t.startMs) === Right(5400000L))
    assert(tr("1.5h").map(t => t.endMs - t.startMs) === Right(5400000L))
    assert(tr("90s").map(_.stepMs) === Right(1000L)) // floor at 1 s
    assert(tr("300ms").isLeft === false)
    // rejects: junk, empty, trailing garbage, zero
    assert(tr("bogus").isLeft)
    assert(tr("").isLeft)
    assert(tr("1hx").isLeft)
    assert(tr("0s").isLeft)
  }

  test("formatUptime matches the reference's h/m/s rendering") {
    assert(MetricsHub.formatUptime(4000) === "4s")
    assert(MetricsHub.formatUptime(3 * 60000 + 4000) === "3m4s")
    assert(MetricsHub.formatUptime(2 * 3600000 + 3 * 60000 + 4000) === "2h3m4s")
    assert(MetricsHub.formatUptime(3600000) === "1h0m0s")
    assert(MetricsHub.formatUptime(0) === "0s")
  }

  test("instant reads: newest at-or-before t, absent after staleness") {
    val (st, _) = storeAt(1000000L)
    st.record(Ev, "p", "", 5.0, 1000000L)
    st.record(Ev, "p", "", 9.0, 1060000L)
    assert(st.sumInstant(Ev, "p", 1060000L) === Some(9.0))
    assert(st.sumInstant(Ev, "p", 1059999L) === Some(5.0))
    assert(st.sumInstant(Ev, "p", 999999L) === None) // before first sample
    // staleness: 5 min after the newest sample, the series goes absent
    assert(st.sumInstant(Ev, "p", 1060000L + 299999L) === Some(9.0))
    assert(st.sumInstant(Ev, "p", 1060000L + 300001L) === None)
    // source isolation
    assert(st.sumInstant(Ev, "other", 1060000L) === None)
  }

  test("rate: counter delta over actual span, reset clamps to zero") {
    val (st, _) = storeAt(0L)
    st.record(Ev, "p", "", 100.0, 100000L)
    st.record(Ev, "p", "", 400.0, 130000L)
    // (400-100) / 30 s
    assert(st.ratePerSec(Ev, "p", 130000L) === Some(10.0))
    // one sample in window -> no rate
    assert(st.ratePerSec(Ev, "p", 100000L) === None)
    // counter reset: decrease reports 0, never negative
    st.record(Ev, "p", "", 50.0, 160000L)
    assert(st.ratePerSec(Ev, "p", 160000L, windowMs = 31000L) === Some(0.0))
  }

  test("labelled series are the total; unlabelled only stands in alone") {
    val (st, _) = storeAt(0L)
    st.record(Ev, "p", "", 999.0, 1000L) // process-total (loop counter)
    st.record(Ev, "p", "users", 30.0, 1000L)
    st.record(Ev, "p", "orders", 12.0, 1000L)
    // with a decomposition present, the unlabelled series must NOT be
    // added on top (it double-counts the same events)
    assert(st.sumInstant(Ev, "p", 1000L) === Some(42.0))
    assert(st.tableInstant(Ev, "p", "users", 1000L) === Some(30.0))
    // a metric with only the unlabelled series still answers
    st.record("philotes_buffer_depth", "p", "", 7.0, 1000L)
    assert(st.sumInstant("philotes_buffer_depth", "p", 1000L) === Some(7.0))
  }

  test("sampler copies a registry snapshot with label parsing") {
    val (st, clock) = storeAt(500000L)
    val reg = new Metrics.Registry
    reg.inc("cdc", "events_total", 10L)
    reg.inc("cdc", """events_total{table="users"}""", 6L)
    reg.inc("cdc", """events_total{table="orders"}""", 4L)
    reg.setGauge("cdc", "lag_seconds", 2.5)
    val sampler = new MetricsHub.Sampler(st, () => Seq(("p", reg)))
    sampler.tickNow()
    assert(st.sumInstant(Ev, "p", 500000L) === Some(10.0)) // labelled sum
    assert(st.tableInstant(Ev, "p", "orders", 500000L) === Some(4.0))
    assert(st.maxInstant("philotes_cdc_lag_seconds", "p", 500000L) === Some(2.5))
    // second tick 30 s later gives the 1m rate its two samples
    reg.inc("cdc", """events_total{table="users"}""", 90L)
    clock.addAndGet(30000L)
    sampler.tickNow()
    assert(st.ratePerSec(Ev, "p", 530000L) === Some(3.0)) // 90 / 30 s
    sampler.close()
  }

  test("out-of-order samples are dropped, retention trims the head") {
    val (st, _) = storeAt(0L)
    val day = 24L * 3600 * 1000
    st.record(Ev, "p", "", 1.0, 1000L)
    st.record(Ev, "p", "", 99.0, 500L) // out of order: dropped
    assert(st.sumInstant(Ev, "p", 2000L) === Some(1.0))
    // a sample 8 days later trims the 7-day retention window's head
    st.record(Ev, "p", "", 5.0, 8 * day)
    assert(st.sumInstant(Ev, "p", 1500L) === None)
    assert(st.sumInstant(Ev, "p", 8 * day) === Some(5.0))
  }

  test("grid covers start..end inclusive at step") {
    val st = new MetricsHub.Store()
    val g = st.grid(MetricsHub.TimeRange(0L, 900000L, 9000L))
    assert(g.size === 101)
    assert(g.head === 0L && g.last === 900000L)
  }
}
