package graft

import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.TimestampNTZType

/** Zone-independence of the events loader (ADVICE r6): the naive-micros and
  * epoch-long generator shapes of `events.ts` must yield the SAME epoch
  * instants whatever the session zone, anchored at naive-wall-clock = UTC.
  */
class TablesEventsSpec extends SparkSpec {

  private def instants(zone: String, dir: String): Seq[Long] = {
    // newSession shares the context but has its own SQLConf — exactly the
    // "user brings their own session zone" scenario from the advice.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", zone)
    Tables.events(s2, dir)
      .select(unix_micros(col("ts")))
      .collect().map(_.getLong(0)).toSeq.sorted
  }

  test("naive-micros shape reads as NTZ without a session-wide flag") {
    val raw = spark.read.parquet(s"$sf0001/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType,
      "stock inferTimestampNTZ should be in effect (no session-wide override)")
  }

  test("events instants agree across session zones (naive-micros shape)") {
    val utc = instants("UTC", sf0001)
    assert(utc.nonEmpty)
    assert(instants("Asia/Tokyo", sf0001) == utc)
    assert(instants("America/New_York", sf0001) == utc)
  }

  test("DST-ambiguous naive times still anchor to unique UTC instants") {
    // 2025-11-02 01:30 naive is AMBIGUOUS as a New York wall-clock (the
    // fall-back hour repeats); any loader path that routes through a DST
    // zone's wall-clock would shift it. The anchored instants must be the
    // plain naive-as-UTC micros in every session zone.
    import org.apache.spark.sql.functions.{lit, to_timestamp_ntz}
    val dir = java.nio.file.Files.createTempDirectory("graft-events-dst").toString
    val times = Seq("2025-11-02 01:30:00", "2025-11-02 06:30:00",
      "2025-03-09 02:30:00") // third: nonexistent local time (spring-forward gap)
    import spark.implicits._
    times.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("event_id", "raw")
      .select(col("event_id"), to_timestamp_ntz(col("raw")).as("ts"),
        lit(0L).as("user_id"), lit("x").as("event_type"),
        lit(0.0).as("value"), lit("").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val expected = times.map(t =>
      java.time.LocalDateTime.parse(t.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L).sorted
    assert(instants("UTC", dir) == expected)
    assert(instants("America/New_York", dir) == expected)
    assert(instants("Australia/Lord_Howe", dir) == expected) // 30-min DST zone
  }

  test("epoch-long (nanos) shape matches the naive-micros shape, any zone") {
    val dir = java.nio.file.Files.createTempDirectory("graft-events-long").toString
    // TIMESTAMP(NANOS) reads as LongType under nanosAsLong; a plain long
    // column takes the identical branch in Tables.events.
    Tables.events(spark, sf0001)
      .selectExpr("event_id", "unix_micros(ts) * 1000 AS ts",
        "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val utcNaive = instants("UTC", sf0001)
    assert(instants("UTC", dir) == utcNaive)
    assert(instants("Asia/Tokyo", dir) == utcNaive)
  }
}
