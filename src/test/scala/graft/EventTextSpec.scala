package graft

import graft.operators.{Multimodal, TextAnalytics}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Boundary semantics for event-time windows, text metrics on known strings,
  * and the multimodal stub plumbing. */
class EventTextSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  test("naive-Bayes classifier learns planted class vocabularies perfectly") {
    // Two classes with disjoint vocabularies; even ids train, odd ids eval.
    // Eval docs reuse their class's vocabulary, so a learned model must
    // classify them perfectly — q30's fixed marker lists know nothing about
    // these tokens, which is exactly what separates the trained operator.
    val d = Seq(
      (0L, "aa", "foo bar foo baz"), (2L, "aa", "bar foo baz foo"),
      (4L, "bb", "qux quux corge qux"), (6L, "bb", "quux qux corge corge"),
      (1L, "aa", "foo baz bar"), (3L, "bb", "qux corge quux"),
      (5L, "aa", "baz foo foo"), (7L, "bb", "corge quux qux"))
      .toDF("doc_id", "lang", "text")
    val out = TextAnalytics.nbLangIdFrom(d).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(4)))).toMap
    out.keySet shouldBe Set(1L, 3L, 5L, 7L) // held-out slice only
    out.values.foreach { case (truth, pred, correct) =>
      pred shouldBe truth
      correct shouldBe 1L
    }
    // scores are log-probabilities: strictly negative
    TextAnalytics.nbLangIdFrom(d).collect().foreach(_.getDouble(3) should be < 0.0)
  }

  test("session window: gap-boundary event merges; beyond the gap opens a new session") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00"), // s1
      (1L, "2024-01-01 00:05:00"), // s1 (gap 5m < 10m)
      (1L, "2024-01-01 00:15:00"), // s1: exactly prev+10m — touching windows merge
      (1L, "2024-01-01 00:25:01"), // s2: 1s beyond the gap
      (1L, "2024-01-01 01:00:00")  // s3
    ).toDF("user_id", "t").select($"user_id", $"t".cast("timestamp").as("ts"))
    val sessions = df
      .groupBy(session_window($"ts", "10 minutes"), $"user_id")
      .agg(count(lit(1)).as("n"))
      .select($"session_window.start".cast("long").as("start"), $"n")
      .orderBy($"start").collect()
    sessions.map(_.getLong(1)).toSeq shouldBe Seq(3L, 1L, 1L)
  }

  test("tumbling window counts partition the input exactly") {
    val df = Seq.tabulate(100)(i => (i.toLong, s"2024-01-01 0${i % 6}:3${i % 10}:00"))
      .toDF("event_id", "t").select($"event_id", $"t".cast("timestamp").as("ts"))
    val total = df.groupBy(window($"ts", "1 hour")).count()
      .agg(sum("count")).head().getLong(0)
    total shouldBe 100L
  }

  test("volume anomaly: a planted spike is flagged with the exact z-score; flat types are excluded") {
    // 'spiky': hourly counts 10,10,10,10,30 → mean 14, var 64, z(30) = 2.0,
    // z(10) = -0.5; 'steady': constant 7/hour → zero variance, no scale
    val rows =
      (for {
        (cnt, h) <- Seq(10, 10, 10, 10, 30).zipWithIndex
        i <- 0 until cnt
      } yield (f"2024-01-01 0$h%d:00:${i % 60}%02d", "spiky")) ++
      (for { h <- 0 until 5; i <- 0 until 7 } yield (s"2024-01-01 0$h:10:0$i", "steady"))
    val ev = rows.toDF("t", "event_type")
      .select($"t".cast("timestamp").as("ts"), $"event_type")
    val out = graft.operators.EventAnalytics.volumeAnomalies(ev).collect()
    out.length shouldBe 1
    out.head.getString(0) shouldBe "spiky"
    out.head.getLong(2) shouldBe 30L
    out.head.getDouble(3) shouldBe 2.0
  }

  test("as-of join: most recent prior marker wins; same-instant resolves by event order") {
    val df = Seq(
      (0L, "2024-01-01 00:00:00", 1L, "view"),
      (1L, "2024-01-01 00:05:00", 1L, "view"),     // superseded by later purchase's view? no - this IS the latest view
      (2L, "2024-01-01 00:10:00", 1L, "purchase"), // attributed to 00:05 view
      (3L, "2024-01-01 00:20:00", 1L, "purchase"), // still the 00:05 view
      (4L, "2024-01-01 00:20:00", 2L, "view"),     // same instant as purchase 5, smaller event_id
      (5L, "2024-01-01 00:20:00", 2L, "purchase"), // attributed to the same-instant view
      (6L, "2024-01-01 00:30:00", 3L, "purchase")  // no view at all -> null
    ).toDF("event_id", "t", "user_id", "event_type")
      .select($"event_id", $"t".cast("timestamp").as("ts"), $"user_id", $"event_type")
    val got = graft.operators.AsOf.asofLast(df, $"user_id", Seq($"ts", $"event_id"),
        $"event_type" === "view", $"ts", "last_view")
      .filter($"event_type" === "purchase")
      .select($"event_id", $"last_view".cast("long"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val base = 1704067200L
    got(2L) shouldBe base + 300L
    got(3L) shouldBe base + 300L
    got(5L) shouldBe base + 1200L // same-instant view, earlier event_id
    got(6L) shouldBe -1L          // never saw a view
  }

  test("q124 whole-row as-of: three legs collapse to one window pass, no join") {
    val df = SparkEntry.queries("q124_asof_attribution")(spark, TestSpark.sf0001)
    val p = df.queryExecution.executedPlan.toString
    // the three asofLast legs share one window spec — Catalyst must plan a
    // single WindowExec (one shuffle + one sort), and an as-of expressed as
    // a window pass must never degrade into any join
    "Window \\[".r.findAllIn(p).size shouldBe 1
    p should not include "Join"
    p should not include "CartesianProduct"
    // the legs null out together: every attributed row carries a full touch
    val rows = df.collect()
    rows.foreach { r =>
      r.isNullAt(3) shouldBe r.isNullAt(4) // touch_event_id <=> touch_type
      r.isNullAt(3) shouldBe r.isNullAt(5) // touch_event_id <=> touch_gap_s
      if (!r.isNullAt(5)) r.getLong(5) should be >= 0L
    }
  }

  test("token metrics on known strings") {
    val df = Seq((1L, "one two  three"), (2L, "a.b,c!")).toDF("doc_id", "text")
    val m = df.select($"doc_id",
      TextAnalytics.nTokens($"text").as("nt"),
      TextAnalytics.nBpeTokens($"text").as("nb")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // "one two  three": double space -> split yields an empty token too (4);
    // BPE-ish: 3 letter-runs
    m(1L)._2 shouldBe 3L
    // "a.b,c!": 3 letter runs + 3 punct glyphs
    m(2L)._2 shouldBe 6L
  }

  test("token entropy: zero for constant docs, log2(n) for all-distinct docs") {
    val d = Seq(
      (1L, "a a a a a a a a"),          // constant: H = 0, TTR = 1/8
      (2L, "a b c d e f g h"),          // uniform distinct: H = log2(8) = 3
      (3L, "a a a a b b c d"))          // mixed: H = 1.75 exactly
      .toDF("doc_id", "text")
    val out = TextAnalytics.tokenEntropyFrom(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    out(1L) shouldBe ((8L, 1L, 0.125, 0.0))
    out(2L) shouldBe ((8L, 8L, 1.0, 3.0))
    // H = log2(8) - (4·log2 4 + 2·log2 2)/8 = 3 - 10/8 = 1.75
    out(3L) shouldBe ((8L, 4L, 0.5, 1.75))
  }

  test("q105/q106 fixture invariants: fences bracket the median; paths cap at 5 steps") {
    val outl = SparkEntry.queries("q105_value_outliers")(TestSpark.spark, TestSpark.sf0001).collect()
    outl should not be empty
    outl.foreach { r =>
      val (n, q1, q3, nOut) = (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
      q1 should be <= q3
      nOut should be <= n
      // Tukey fences keep at least the inter-quartile half of the data
      nOut.toDouble / n should be <= 0.5
    }
    val paths = SparkEntry.queries("q106_session_paths")(TestSpark.spark, TestSpark.sf0001).collect()
    paths should not be empty
    paths.length should be <= 20
    paths.foreach { r =>
      r.getString(0).split(">").length should be <= 5
      r.getLong(1) should be >= 1L
    }
    // ranked by n_users desc, path asc
    paths.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(1) > b.getLong(1) ||
          (a.getLong(1) == b.getLong(1) && a.getString(0) < b.getString(0)))
      case _ => ()
    }
  }

  test("fingerprint is invariant to case and whitespace runs") {
    val df = Seq((1L, "Foo  Bar"), (2L, "foo bar"), (3L, " FOO\tBAR ")).toDF("doc_id", "text")
    val fps = df.select(TextAnalytics.fingerprint($"text")).collect().map(_.getString(0))
    fps.distinct.length shouldBe 1
  }

  test("multimodal stub decode is deterministic and reflects payload bytes") {
    val r = Multimodal.MediaRecord(7L, "abc".getBytes("UTF-8"), 64, 48, 3)
    val f1 = Multimodal.MultimodalStub.decodeImageStub(r)
    val f2 = Multimodal.MultimodalStub.decodeImageStub(r)
    f1 shouldBe f2
    f1.byte_len shouldBe 3L
    f1.first_byte shouldBe 'a'.toInt
    f1.mean_byte shouldBe (('a' + 'b' + 'c').toDouble / 3)
    // empty payload edge
    val e = Multimodal.MultimodalStub.decodeImageStub(Multimodal.MediaRecord(8L, Array.empty, 1, 1, 3))
    e.byte_len shouldBe 0L
    e.first_byte shouldBe -1
  }

  test("deadline funnel: in-window converts; pre-view clicks and late clicks do not") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    // u1: clean conversion inside both windows
    // u2: their only click PRECEDES the first view (global-first-click trap)
    // u3: click arrives 2h after the view — past the deadline
    // u4: converts the click but purchases past the click deadline
    val rows = Seq(
      (1L, "view", 1000L), (1L, "click", 1500L), (1L, "purchase", 2000L),
      (2L, "click", 500L), (2L, "view", 1000L),
      (3L, "view", 1000L), (3L, "click", 1000L + 7200L),
      (4L, "view", 1000L), (4L, "click", 1500L), (4L, "purchase", 1500L + 7200L)
    ).map { case (u, et, t) => (u, et, ts(t)) }
    import org.apache.spark.sql.functions.lit
    val events = spark.createDataFrame(rows).toDF("user_id", "event_type", "ts")
      .withColumn("event_id", lit(0L)).withColumn("value", lit(1.0))
    val r = graft.operators.EventAnalytics.deadlineFunnel(events).head()
    r.getLong(0) shouldBe 4L   // all four viewed
    r.getLong(1) shouldBe 2L   // only u1 and u4 clicked in-window
    r.getLong(2) shouldBe 1L   // only u1 purchased in-window
  }
}
