package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec

/** Stateful rate-spike detection: closing rule, factor edge, state
  * carry-over across micro-batches.
  */
class RateSpikeSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600000L
  private def ev(id: Long, user: Long, hour: Long, off: Long = 0L) =
    EventsStream.Event(id, new Timestamp(hour * H + off * 60000L), user, "c", 1.0)

  private def spikes(events: Seq[EventsStream.Event], factor: Long = 3L) =
    EventsStream.rateSpikes(events.toDS(), factor).collect()
      .map(s => (s.user_id, s.hour_start.getTime / H, s.n, s.prev_n)).toSeq

  test("a closing bucket exceeding factor x previous emits exactly once") {
    // hour 0: 1 event; hour 1: 4 events; hour 2: closes hour 1
    val es = Seq(ev(1, 7, 0),
      ev(2, 7, 1, 1), ev(3, 7, 1, 2), ev(4, 7, 1, 3), ev(5, 7, 1, 4),
      ev(6, 7, 2))
    assert(spikes(es) == Seq((7L, 1L, 4L, 1L)))
  }

  test("n == factor x prev is NOT a spike (strict >)") {
    val es = Seq(ev(1, 7, 0),
      ev(2, 7, 1, 1), ev(3, 7, 1, 2), ev(4, 7, 1, 3),
      ev(5, 7, 2))
    assert(spikes(es) == Nil)
  }

  test("the final bucket never closes, so it never emits") {
    // hour 1 has the spike volume but nothing after it closes it
    val es = Seq(ev(1, 7, 0), ev(2, 7, 1, 1), ev(3, 7, 1, 2),
      ev(4, 7, 1, 3), ev(5, 7, 1, 4))
    assert(spikes(es) == Nil)
  }

  test("first closed bucket has no reference and cannot spike") {
    val es = Seq(ev(1, 7, 0, 1), ev(2, 7, 0, 2), ev(3, 7, 0, 3),
      ev(4, 7, 1))
    assert(spikes(es) == Nil)
  }

  test("users are independent; arrival order inside a batch is irrelevant") {
    val a = Seq(ev(1, 1, 0), ev(2, 1, 1, 1), ev(3, 1, 1, 2), ev(4, 1, 1, 3),
      ev(5, 1, 2), ev(6, 2, 0), ev(7, 2, 1))
    assert(spikes(a, factor = 2L) == spikes(a.reverse, factor = 2L))
    assert(spikes(a, factor = 2L) == Seq((1L, 1L, 3L, 1L)))
  }
}
