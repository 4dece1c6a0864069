package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion-drift guard for the events loader (round-6 lesson).
  *
  * The corpus stores `events.ts` as parquet INT64 TIMESTAMP(NANOS), and
  * how Spark's reader surfaces that type has CHANGED across versions:
  * ≤4.0 needs `spark.sql.legacy.parquet.nanosAsLong=true` and yields a
  * raw long of nanos; 4.1+ ignores that conf and yields timestamp_ntz
  * (already micros-truncated). Round 6 lost 51 queries, 61 tests, and
  * the whole benchmark to exactly this drift, silently.
  *
  * This spec pins `Tables.events`/`normalizeTs` under BOTH reader
  * behaviors by writing two value-identical fixtures — one with `ts` as
  * raw long nanos, one as timestamp_ntz micros — and asserting both
  * normalize to the same session-zoned TimestampType values. It also
  * pins the real corpus read end-to-end, so the next reader-behavior
  * change fails HERE on day one, not in the driver's correctness gate.
  */
class TablesSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  // one value exactly on a micro boundary, one with sub-micro nanos that
  // must truncate (floor) away, matching DuckDB's TIMESTAMP_NS→TIMESTAMP
  // cast on the oracle side
  private val nanos = Seq(1704067798778549000L, 1704100000123456789L)
  private val wantMicros = Seq(1704067798778549L, 1704100000123456L)

  private val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  test("normalizeTs: long-nanos fixture → TimestampType micros (legacy reader shape)") {
    val dir = java.nio.file.Files.createTempDirectory("tables_long").toString
    nanos.map(n => (1L, n, 7L, "click", 1.5, "{}"))
      .toDF(cols: _*).write.parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType === TimestampType)
    assert(got.select(unix_micros(col("ts"))).orderBy("ts")
      .collect().map(_.getLong(0)).toSeq === wantMicros)
  }

  test("normalizeTs: timestamp_ntz fixture → TimestampType micros (Spark 4.1+ reader shape)") {
    val dir = java.nio.file.Files.createTempDirectory("tables_ntz").toString
    wantMicros.map { us =>
      val ldt = java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC)
      (1L, ldt, 7L, "click", 1.5, "{}")
    }.toDF(cols: _*).write.parquet(s"$dir/events.parquet")
    // LocalDateTime encodes as timestamp_ntz; reads back as TimestampNTZType
    assert(spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType === TimestampNTZType)
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType === TimestampType)
    assert(got.select(unix_micros(col("ts"))).orderBy("ts")
      .collect().map(_.getLong(0)).toSeq === wantMicros)
  }

  test("normalizeTs: already-normalized TimestampType passes through unchanged") {
    val df = wantMicros
      .map(us => (1L, java.time.Instant.EPOCH.plusNanos(us * 1000L), 7L))
      .toDF("event_id", "ts", "user_id")
    assert(df.schema("ts").dataType === TimestampType)
    assert(Tables.normalizeTs(df).select(unix_micros(col("ts"))).orderBy("ts")
      .collect().map(_.getLong(0)).toSeq === wantMicros)
  }

  test("normalizeTs: an unexpected ts type fails loudly, not downstream") {
    val df = Seq((1L, "not-a-time")).toDF("event_id", "ts")
    val e = intercept[IllegalStateException](Tables.normalizeTs(df))
    assert(e.getMessage.contains("events.ts"))
  }

  test("real corpus: events loads as TimestampType with sane UTC range") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType === TimestampType)
    val r = ev.agg(
      min(unix_micros(col("ts"))), max(unix_micros(col("ts"))), count(lit(1))).head()
    assert(r.getLong(2) > 0)
    // corpus is generated inside 2024 (TESTDATA.md); a zone/unit slip
    // (nanos-as-micros, off-by-1000, local-zone shift) lands far outside
    val lo = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli * 1000L
    val hi = java.time.Instant.parse("2025-01-01T00:00:00Z").toEpochMilli * 1000L
    assert(r.getLong(0) >= lo && r.getLong(1) < hi,
      s"events ts range [${r.getLong(0)}, ${r.getLong(1)}] outside 2024 UTC")
  }
}
