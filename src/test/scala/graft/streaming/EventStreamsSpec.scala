package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.EventStreams._

/** Structured Streaming specs driven by MemoryStream (SURVEY.md §2.9). */
class EventStreamsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("watermarked tumbling-window counts aggregate incrementally") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[Evt]
    val q = hourlyCounts(input.toDF()).writeStream
      .format("memory").queryName("hourly").outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        Evt(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
        Evt(2, ts("2024-01-01 10:45:00"), 2, "click", 2.0),
        Evt(3, ts("2024-01-01 11:05:00"), 1, "view", 3.0))
      q.processAllAvailable()
      val rows = sp.sql("SELECT event_type, n, sum_v FROM hourly ORDER BY hour, event_type")
        .collect().map(_.toSeq)
      assert(rows.toSeq === Seq(Seq("click", 2L, 3.0), Seq("view", 1L, 3.0)))
      // late-but-within-watermark event updates the 10:00 window
      input.addData(Evt(4, ts("2024-01-01 10:59:00"), 3, "click", 4.0))
      q.processAllAvailable()
      val upd = sp.sql("SELECT n FROM hourly WHERE event_type='click' ORDER BY n DESC")
        .collect().map(_.getLong(0))
      assert(upd.contains(3L))
    } finally q.stop()
  }

  test("stateful dropDuplicates dedups within the watermark") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[Evt]
    val q = dedupEvents(input.toDF()).writeStream
      .format("memory").queryName("dedup").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Evt(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Evt(1, ts("2024-01-01 10:00:01"), 1, "click", 1.0),
        Evt(2, ts("2024-01-01 10:00:02"), 1, "view", 1.0))
      q.processAllAvailable()
      input.addData(Evt(1, ts("2024-01-01 10:10:00"), 1, "click", 1.0))
      q.processAllAvailable()
      assert(sp.sql("SELECT count(*) FROM dedup").collect()(0).getLong(0) === 2L)
    } finally q.stop()
  }

  test("stateful sessionization counts per-user events") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[Evt]
    val q = sessionize(input.toDS()).writeStream
      .format("memory").queryName("sessions").outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        Evt(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
        Evt(2, ts("2024-01-01 10:01:00"), 7, "view", 1.0),
        Evt(3, ts("2024-01-01 10:02:00"), 8, "click", 1.0))
      q.processAllAvailable()
      val rows = sp.sql("SELECT user_id, n_events, closed FROM sessions ORDER BY user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      assert(rows.toSeq === Seq((7L, 2L, false), (8L, 1L, false)))
    } finally q.stop()
  }

  test("a session that opens AND closes within one batch still reports its count") {
    // the mapGroupsWithState version emitted exactly one row per user per
    // trigger, so a session fully contained between two triggers lost its
    // count unrecoverably — flatMapGroupsWithState must emit the closed
    // session's final count alongside the new session's running count
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[Evt]
    val q = sessionize(input.toDS()).writeStream
      .format("memory").queryName("sessions_close").outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        Evt(1, ts("2024-01-01 10:00:00"), 9, "click", 1.0),
        Evt(2, ts("2024-01-01 10:01:00"), 9, "view", 1.0),
        Evt(3, ts("2024-01-01 10:02:00"), 9, "view", 1.0),
        // 2 h gap: the 3-event session closes INSIDE this batch
        Evt(4, ts("2024-01-01 12:02:00"), 9, "click", 1.0))
      q.processAllAvailable()
      val rows = sp.sql(
        "SELECT n_events, closed FROM sessions_close WHERE user_id = 9 ORDER BY closed")
        .collect().map(r => (r.getLong(0), r.getBoolean(1)))
      assert(rows.toSeq === Seq((1L, false), (3L, true)),
        "closed session's final count lost or running count wrong")
      // and a later batch closing the open session reports ITS final count
      input.addData(Evt(5, ts("2024-01-01 15:00:00"), 9, "click", 1.0))
      q.processAllAvailable()
      val after = sp.sql(
        "SELECT n_events FROM sessions_close WHERE user_id = 9 AND closed ORDER BY n_events")
        .collect().map(_.getLong(0))
      assert(after.toSeq === Seq(1L, 3L), "cross-batch session close lost")
    } finally q.stop()
  }

  test("built-in session_window closes the same sessions as flatMapGroupsWithState") {
    // the two sessionization APIs differ in WHEN a session can close
    // (per-user next event vs global watermark) but must agree on WHAT
    // closed: same (user, final count) sessions from the same stream.
    // Times are chosen so every fMGWS-closed session also has its end
    // passed by the final watermark (11:15, zero delay), while the
    // trailing one-event sessions (ends 11:30/11:32/11:45) stay open in
    // BOTH formulations.
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val batch1 = Seq(
      Evt(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
      Evt(2, ts("2024-01-01 10:01:00"), 7, "view", 1.0),
      Evt(3, ts("2024-01-01 10:02:00"), 8, "click", 1.0))
    val batch2 = Seq(
      Evt(4, ts("2024-01-01 11:00:00"), 7, "click", 1.0), // closes u7's pair
      Evt(5, ts("2024-01-01 11:02:00"), 8, "click", 1.0), // closes u8's single
      Evt(6, ts("2024-01-01 11:15:00"), 99, "probe", 1.0)) // watermark push
    val inA = MemoryStream[Evt]
    val inB = MemoryStream[Evt]
    val qA = sessionize(inA.toDS()).writeStream
      .format("memory").queryName("sess_fmgws").outputMode(OutputMode.Update()).start()
    val qB = sessionizeBuiltin(inB.toDF(), watermark = "0 seconds").writeStream
      .format("memory").queryName("sess_builtin").outputMode(OutputMode.Append()).start()
    try {
      for (b <- Seq(batch1, batch2)) {
        inA.addData(b); qA.processAllAvailable()
        inB.addData(b); qB.processAllAvailable()
      }
      val closedA = sp.sql(
        "SELECT user_id, n_events FROM sess_fmgws WHERE closed")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val closedB = sp.sql(
        "SELECT user_id, n_events FROM sess_builtin")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(closedA === Set((7L, 2L), (8L, 1L)), s"fMGWS closed $closedA")
      assert(closedB === closedA,
        s"session_window closed $closedB != flatMapGroupsWithState $closedA")
      // and the built-in window's bounds are the session's actual extent:
      // first event to last event + gap
      val bounds = sp.sql(
        "SELECT user_id, CAST(s_start AS STRING), CAST(s_end AS STRING) FROM sess_builtin ORDER BY user_id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      assert(bounds.toSeq === Seq(
        (7L, "2024-01-01 10:00:00", "2024-01-01 10:31:00"),
        (8L, "2024-01-01 10:02:00", "2024-01-01 10:32:00")))
    } finally { qA.stop(); qB.stop() }
  }

  test("file-based streaming source reads the events table incrementally") {
    val sp = spark
    // batch-equivalence check: streaming over the parquet dir produces the
    // same per-type counts as the batch read
    // the file source wants a directory; stage the table into one
    val staged = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      staged.resolve("events.parquet"))
    val dir = "/root/testdata/sf0.001"
    val schema = sp.read.parquet(s"$dir/events.parquet").schema
    val stream = sp.readStream.schema(schema).parquet(staged.toString)
    assert(stream.isStreaming)
    val q = stream.groupBy("event_type").count()
      .writeStream.format("memory").queryName("filestream")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val streamed = sp.sql("SELECT event_type, count FROM filestream").collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      val batch = sp.read.parquet(s"$dir/events.parquet")
        .groupBy("event_type").count().collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(streamed === batch)
    } finally q.stop()
  }
}
