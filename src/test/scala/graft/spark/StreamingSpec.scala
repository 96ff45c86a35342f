package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Structured-Streaming path: the geo expressions inside micro-batch plans,
  * watermarked windows, and mapGroupsWithState sessions — all driven with
  * MemoryStream for determinism. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("geo expressions run inside streaming micro-batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(String, Double, Double)]
    // streaming frame shaped like enriched docs (anchor already parsed)
    val enriched = in.toDF().toDF("doc_id", "lon", "lat")
      .withColumn("cell", GeoFunctions.s2Cell($"lon", $"lat", lit(10)))
      .withColumn("tile", GeoFunctions.tileKey($"lon", $"lat", lit(8)))
      .withColumn("utm", ProjFunctions.utmNative($"lon", $"lat"))
    val q = enriched.writeStream.format("memory").queryName("geo_stream")
      .outputMode(OutputMode.Append).start()
    in.addData(("a", 12.5, 55.25), ("b", -74.0, 40.7))
    q.processAllAvailable()
    val rows = spark.table("geo_stream").collect()
    q.stop()
    assert(rows.length == 2)
    val a = rows.find(_.getString(0) == "a").get
    assert(a.getAs[Long]("cell") == graft.index.S2CellId.cellId(12.5, 55.25, 10))
    assert(a.getAs[org.apache.spark.sql.Row]("utm").getAs[Int]("zone") == 33)
  }

  test("hex binning streams: per-batch global hex cells match the batch path") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(String, Double, Double)]
    val hexed = in.toDF().toDF("doc_id", "lon", "lat")
      .withColumn("hex", GeoFunctions.globalHexCell($"lon", $"lat", lit(100000.0)))
      .select($"doc_id", $"hex.q".as("q"), $"hex.r".as("r"))
    val q = hexed.writeStream.format("memory").queryName("hex_stream")
      .outputMode(OutputMode.Append).start()
    in.addData(("tokyo", 139.69, 35.69), ("lagos", 3.38, 6.52))
    q.processAllAvailable()
    val got = spark.table("hex_stream").collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
    q.stop()
    val want = Seq(("tokyo", 139.69, 35.69), ("lagos", 3.38, 6.52)).toDF("doc_id", "lon", "lat")
      .withColumn("hex", GeoFunctions.globalHexCell($"lon", $"lat", lit(100000.0)))
      .collect().map(r => r.getString(0) ->
        (r.getStruct(3).getInt(0), r.getStruct(3).getInt(1))).toMap
    assert(got == want)
    assert(got("tokyo") != got("lagos"))
  }

  test("watermarked windowed cell counts over a simulated span feed") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Double, Double)]
    val enriched = in.toDF().toDF("ts", "lon", "lat")
      .withColumn("cell", GeoFunctions.s2Cell($"lon", $"lat", lit(6)))
    val counts = StreamingOps.windowedCellCounts(enriched, "ts",
      watermark = "1 minute", window = "1 minute")
    val q = counts.writeStream.format("memory").queryName("cell_counts")
      .outputMode(OutputMode.Complete).start()
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:30")
    in.addData((t(0), 10.0, 50.0), (t(0), 10.01, 50.01), (t(1), 10.0, 50.0),
      (t(0), -70.0, -30.0))
    q.processAllAvailable()
    val rows = spark.table("cell_counts")
      .select($"window.start", $"cell", $"n").collect()
    q.stop()
    // two points share the minute-0 window and cell; one in minute 1; one far cell
    assert(rows.map(_.getLong(2)).sum == 4)
    assert(rows.exists(_.getLong(2) == 2), s"rows: ${rows.mkString(", ")}")
  }

  test("dropDuplicatesWithinWatermark dedups a doc feed with bounded state") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val deduped = StreamingOps.dedupStream(
      in.toDF().toDF("ts", "doc_id", "text"), "ts", watermark = "1 minute")
    val q = deduped.writeStream.format("memory").queryName("dedup_feed")
      .outputMode(OutputMode.Append).start()
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:30")
    // two exact dups (after normalization) within the watermark + 1 unique
    in.addData((t(0), 1L, "Alpha  Beta"), (t(0), 2L, "alpha beta"),
      (t(0), 3L, "unrelated text"))
    q.processAllAvailable()
    // advance the watermark far past the first window, then repeat the text:
    // the state for the old fingerprint is evicted, so it emits again
    in.addData((t(10), 4L, "advance watermark"))
    q.processAllAvailable()
    in.addData((t(11), 5L, "alpha beta"))
    q.processAllAvailable()
    val rows = spark.table("dedup_feed").select($"doc_id").collect().map(_.getLong(0))
    q.stop()
    assert(rows.toSet.intersect(Set(1L, 2L)).size == 1, s"rows: ${rows.mkString(",")}")
    assert(rows.contains(3L) && rows.contains(4L))
    assert(rows.contains(5L), "re-emission after watermark eviction expected")
  }

  test("mapGroupsWithState sessions accumulate per-user cell transitions") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[StreamingOps.SpanEvent]
    val sessions = StreamingOps.sessionize(in.toDS())
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Update).start()
    def ev(u: Long, c: Long, s: Int) =
      StreamingOps.SpanEvent(u, c, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$s%02d"))
    in.addData(ev(1, 100, 1), ev(1, 100, 2), ev(1, 200, 3), ev(2, 300, 1))
    q.processAllAvailable()
    in.addData(ev(1, 200, 10), ev(1, 400, 11)) // state carries across batches
    q.processAllAvailable()
    val last = spark.table("sessions").groupBy($"user")
      .agg(max(struct($"nEvents", $"nCells", $"lastCell")).as("s")).collect()
    q.stop()
    val u1 = last.find(_.getLong(0) == 1).get.getStruct(1)
    assert(u1.getLong(0) == 5, s"events: $u1") // 5 events total
    assert(u1.getLong(1) == 3, s"cells: $u1") // 100 -> 200 -> (200) -> 400
    assert(u1.getLong(2) == 400)
    assert(last.find(_.getLong(0) == 2).get.getStruct(1).getLong(0) == 1)
  }
}
