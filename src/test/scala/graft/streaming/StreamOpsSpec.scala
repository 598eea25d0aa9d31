package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Micro-batch semantics of the streaming operators via MemoryStream:
  * dedup drops repeats within the watermark, windowed metrics emit final
  * counts only after the watermark passes, late rows are discarded.
  */
class StreamOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]").appName("stream-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  final case class UrlEvent(url_hash: Long, event_ts: Timestamp)
  final case class FetchEvent(host: String, status: Int, event_ts: Timestamp)

  test("streaming URL dedup: state keyed by url_hash ALONE — the same URL " +
    "at a different timestamp is still a dup within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UrlEvent]
    val q = StreamOps.streamingUrlDedup(input.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(
        UrlEvent(1L, ts(0)), UrlEvent(1L, ts(0)), // exact dup
        UrlEvent(2L, ts(1)))
      q.processAllAvailable()
      input.addData(
        UrlEvent(1L, ts(0)), // dup across batches, in watermark
        UrlEvent(1L, ts(3)), // same URL, NEW timestamp — still a dup
        UrlEvent(2L, ts(4))) // same URL, new ts — still a dup
      q.processAllAvailable()
      val rows = spark.table("dedup_out").collect()
      assert(rows.length == 2)
      assert(rows.map(_.getLong(0)).toSet == Set(1L, 2L))
    } finally q.stop()
  }

  test("windowed fetch metrics: append mode emits a window only after the " +
    "watermark passes; late rows are dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FetchEvent]
    val q = StreamOps.windowedFetchMetrics(input.toDF())
      .writeStream.format("memory").queryName("metrics_out")
      .outputMode("append").start()
    try {
      input.addData(
        FetchEvent("h1", 200, ts(0)),
        FetchEvent("h1", 200, ts(0)),
        FetchEvent("h1", 503, ts(0)))
      q.processAllAvailable()
      // watermark still at 10:00 − 2 min → nothing final yet
      assert(spark.table("metrics_out").count() == 0)
      // advance event time past window end + watermark
      input.addData(FetchEvent("h2", 200, ts(5)))
      q.processAllAvailable()
      input.addData(FetchEvent("h2", 200, ts(9)))
      q.processAllAvailable()
      val rows = spark.table("metrics_out").collect()
        .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2))).toSet
      assert(rows.contains((ts(0), 200, 2L)))
      assert(rows.contains((ts(0), 503, 1L)))
      // a straggler older than the watermark is discarded silently
      input.addData(FetchEvent("h1", 200, ts(0)))
      q.processAllAvailable()
      val again = spark.table("metrics_out").collect()
        .filter(r => r.getTimestamp(0) == ts(0) && r.getInt(1) == 200)
      assert(again.map(_.getLong(2)).toSeq == Seq(2L))
    } finally q.stop()
  }

  test("host budget accounting tracks per-host per-window fetch counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FetchEvent]
    val q = StreamOps.hostBudgetAccounting(input.toDF())
      .writeStream.format("memory").queryName("budget_out")
      .outputMode("append").start()
    try {
      input.addData(
        FetchEvent("h1", 200, ts(0)), FetchEvent("h1", 200, ts(0)),
        FetchEvent("h2", 200, ts(0)))
      q.processAllAvailable()
      input.addData(FetchEvent("h1", 200, ts(10))) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("budget_out").collect()
        .map(r => (r.getString(0), r.getLong(2))).toSet
      assert(rows.contains(("h1", 2L)) && rows.contains(("h2", 1L)))
    } finally q.stop()
  }
}
