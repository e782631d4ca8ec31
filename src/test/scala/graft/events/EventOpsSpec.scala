package graft.events

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .getOrCreate()

  private def ts(s: String) = Timestamp.valueOf(s)

  // trades (left) matched as-of quotes (right), the canonical shape
  private def quotes() = {
    import spark.implicits._
    Seq(
      // key, ts, quote_id, px
      ("A", ts("2024-01-01 10:00:00"), 1L, 100.0),
      ("A", ts("2024-01-01 10:00:05"), 2L, 101.0),
      ("A", ts("2024-01-01 10:00:05"), 3L, 102.0), // same-ts tie: id 3 wins
      ("A", ts("2024-01-01 10:05:00"), 4L, 103.0),
      ("B", ts("2024-01-01 09:00:00"), 5L, 50.0)
    ).toDF("k", "qts", "quote_id", "px")
  }

  private def trades() = {
    import spark.implicits._
    Seq(
      ("A", ts("2024-01-01 10:00:05"), 10L), // exactly at quote 2/3 → 3
      ("A", ts("2024-01-01 10:00:06"), 11L), // just after      → 3
      ("A", ts("2024-01-01 10:09:00"), 12L), // later           → 4
      ("A", ts("2024-01-01 09:59:59"), 13L), // before any      → null
      ("B", ts("2024-01-01 09:00:01"), 14L), // other key       → 5
      ("C", ts("2024-01-01 12:00:00"), 15L)  // unseen key      → null
    ).toDF("k", "tts", "trade_id")
  }

  private def joined(tolerance: Option[String] = None) =
    EventOps.asOfJoin(trades(), quotes(), Seq("k"), "tts", "qts",
        rightPayload = Seq("quote_id", "px"), rightTieBreak = "quote_id",
        tolerance = tolerance.map(expr))
      .collect()
      .map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Long]("quote_id")).map(_.toLong))
      .toMap

  test("as-of join picks latest right row at-or-before left ts") {
    val m = joined()
    assert(m(10L).contains(3L), "same-ts quote eligible, highest tie wins")
    assert(m(11L).contains(3L))
    assert(m(12L).contains(4L))
    assert(m(13L).isEmpty, "no quote before the first")
    assert(m(14L).contains(5L))
    assert(m(15L).isEmpty, "key with no right rows")
  }

  test("as-of join tolerance nulls out stale matches") {
    val m = joined(Some("INTERVAL 1 MINUTE"))
    assert(m(12L).isEmpty, "quote 4 is 4 min old — outside 1-min lookback")
    assert(m(11L).contains(3L), "1 s old — inside")
  }

  test("as-of join keeps every left row and its columns") {
    val out = EventOps.asOfJoin(trades(), quotes(), Seq("k"), "tts", "qts",
      Seq("quote_id", "px"), "quote_id")
    assert(out.count() == 6)
    assert(out.columns.toSeq ==
      Seq("k", "tts", "trade_id", "quote_id", "px", "matched_ts"))
  }

  test("sessionize splits on gap boundary and aggregates per session") {
    import spark.implicits._
    val ev = Seq(
      // user 1: 3 events in one session, then a 2h+ gap, then 1 more
      (1L, ts("2024-01-01 10:00:00"), 5.0),
      (1L, ts("2024-01-01 10:30:00"), 7.0),
      (1L, ts("2024-01-01 11:00:00"), 1.0),
      (1L, ts("2024-01-01 13:00:01"), 2.0), // gap > 2h → NEW session
      (2L, ts("2024-01-01 00:00:00"), 9.0)
    ).toDF("user_id", "ts", "value")
    val out = EventOps.sessionize(ev, Seq("user_id"), "ts", "2 hours",
        Seq(sum(col("value")).as("total")))
      .orderBy("user_id", "session_start")
      .collect()
    assert(out.length == 3)
    val s1 = out(0)
    assert(s1.getAs[Long]("n_events") == 3)
    assert(s1.getAs[Timestamp]("session_start") == ts("2024-01-01 10:00:00"))
    assert(s1.getAs[Timestamp]("session_end") == ts("2024-01-01 11:00:00"))
    assert(s1.getAs[Double]("total") == 13.0)
    assert(out(1).getAs[Long]("n_events") == 1, "gap > 2h starts a session")
    assert(out(2).getAs[Long]("n_events") == 1)
  }

  test("sessionize merges at a gap of exactly the gap duration") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 12:00:00"), 1.0) // exactly 2h → same session
    ).toDF("user_id", "ts", "value")
    val out = EventOps.sessionize(ev, Seq("user_id"), "ts", "2 hours", Nil)
      .collect()
    assert(out.length == 1 && out(0).getAs[Long]("n_events") == 2)
  }

  test("as-of join equals brute force on 600 random timeline rows") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // ~20 keys, colliding timestamps on purpose (nextInt(500) over 300
    // rows/side forces same-second ties both within and across sides)
    val lrows = (0 until 300).map { i =>
      (rnd.nextInt(20).toLong, 1700000000L + rnd.nextInt(500), i.toLong) }
    val rrows = (0 until 300).map { i =>
      (rnd.nextInt(20).toLong, 1700000000L + rnd.nextInt(500), (1000 + i).toLong) }
    val left = lrows.toDF("k", "sec", "lid")
      .withColumn("lts", timestamp_seconds(col("sec")))
    val right = rrows.toDF("k", "rsec", "rid")
      .withColumn("rts", timestamp_seconds(col("rsec")))
    val out = EventOps.asOfJoin(left, right, Seq("k"), "lts", "rts",
        rightPayload = Seq("rid"), rightTieBreak = "rid")
      .collect()
      .map(r => r.getAs[Long]("lid") ->
        Option(r.getAs[java.lang.Long]("rid")).map(_.toLong))
      .toMap
    val rByK = rrows.groupBy(_._1)
    lrows.foreach { case (k, sec, lid) =>
      val expected = rByK.getOrElse(k, Nil)
        .filter(_._2 <= sec)
        .sortBy(r => (r._2, r._3))
        .lastOption.map(_._3)
      assert(out(lid) == expected,
        s"lid=$lid k=$k sec=$sec: got ${out(lid)}, want $expected")
    }
  }

  test("sessionize equals brute-force gap splitting on random events") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map { i =>
      (rnd.nextInt(10).toLong, 1700000000L + rnd.nextInt(20000).toLong) }
    val ev = rows.toDF("user_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val gapSec = 600L
    val got = EventOps.sessionize(ev, Seq("user_id"), "ts", "10 minutes", Nil)
      .collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("session_start").getTime / 1000,
        r.getAs[java.sql.Timestamp]("session_end").getTime / 1000,
        r.getAs[Long]("n_events")))
      .toSet
    // brute force: sort each user's seconds, split where gap EXCEEDS 600
    val expected = rows.groupBy(_._1).flatMap { case (u, rs) =>
      val secs = rs.map(_._2).sorted
      val sessions = secs.tail.foldLeft(List(List(secs.head))) {
        case (acc @ cur :: rest, s) =>
          if (s - cur.head > gapSec) List(s) :: acc
          else (s :: cur) :: rest
        case (Nil, s) => List(List(s))
      }
      sessions.map(ss => (u, ss.min, ss.max, ss.size.toLong))
    }.toSet
    assert(got == expected,
      s"diff: got-only=${got -- expected}, want-only=${expected -- got}")
  }

  test("as-of join plans one exchange on the key (no range-join blowup)") {
    val plan = EventOps.asOfJoin(trades(), quotes(), Seq("k"), "tts", "qts",
      Seq("quote_id"), "quote_id").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of join must not plan a product join:\n$plan")
  }
}
