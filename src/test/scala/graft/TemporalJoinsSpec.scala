package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins

class TemporalJoinsSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf: picks latest at-or-before per key, null when none") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L), // after two clicks
      (1L, ts("2024-01-01 08:00:00"), 101L), // before any click → null
      (2L, ts("2024-01-01 10:00:00"), 102L)) // other key
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 7L),
      (1L, ts("2024-01-01 09:30:00"), 8L),
      (1L, ts("2024-01-01 11:00:00"), 9L), // after left → ignored
      (2L, ts("2024-01-01 10:00:00"), 10L)) // simultaneous → matches
      .toDF("user_id", "ts", "event_id")

    val out = TemporalJoins.asOf(left, Seq("event_id"), right, Seq("event_id"),
        "user_id", "ts", "r_")
      .select($"event_id", $"r_event_id", $"r_ts")
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap

    assert(out(100L)._1.contains(8L)) // latest of the two priors
    assert(out(101L)._1.isEmpty && out(101L)._2.isEmpty)
    assert(out(102L)._1.contains(10L)) // at-or-before includes equal ts
  }

  test("asOf: deterministic tie pick when right has duplicate timestamps") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 100L)).toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 7L),
      (1L, ts("2024-01-01 09:00:00"), 8L)) // same ts — pick max id
      .toDF("user_id", "ts", "event_id")
    val out = TemporalJoins.asOf(left, Seq("event_id"), right, Seq("event_id"),
        "user_id", "ts")
      .select("asof_event_id").collect().head.getLong(0)
    assert(out == 8L)
  }

  test("rangeJoin matches rows to containing intervals inclusively") {
    import spark.implicits._
    val intervals = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("iv_id", "start", "end")
    val events = Seq(
      ts("2024-01-01 10:00:00"), // at start → in
      ts("2024-01-01 11:00:00"), // at end → in
      ts("2024-01-01 11:00:01")) // out
      .toDF("ts")
    val n = TemporalJoins.rangeJoin(events, "ts", intervals, "start", "end").count()
    assert(n == 2)
  }

  test("binned range join equals the nested-loop range join") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val base = ts("2024-01-01 00:00:00").getTime
    val intervals = (1 to 80).map { i =>
      val s = base + rnd.nextInt(14 * 86400) * 1000L
      (i.toLong, new Timestamp(s), new Timestamp(s + rnd.nextInt(6 * 3600) * 1000L))
    }.toDF("iv_id", "start", "end")
    val events = (1 to 500)
      .map(_ => new Timestamp(base + rnd.nextInt(14 * 86400) * 1000L))
      .toDF("ts")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("iv_id", "ts").as[(Long, Timestamp)].collect().toSet
    val simple = pairs(TemporalJoins.rangeJoin(events, "ts", intervals, "start", "end"))
    val binned = pairs(TemporalJoins.rangeJoinBinned(
      events, "ts", intervals, "start", "end", binSeconds = 3600L))
    assert(binned == simple)
    assert(simple.nonEmpty)
  }
}
