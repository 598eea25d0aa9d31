package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Byte-format tests for the sink formatters (SURVEY.md K1-K5) against
  * hand-executed reference semantics.
  */
class SinksSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]").appName("sinks-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("K1 csv line: clean (strip, newline→space) then QUOTE_MINIMAL") {
    import spark.implicits._
    val df = Seq(
      ("  plain  ", "with,comma", "with\nnewline", "has\"quote"),
      ("a", "b", "c", "d")
    ).toDF("c1", "c2", "c3", "c4")
    val lines = df.select(Sinks.csvLine(Seq($"c1", $"c2", $"c3", $"c4"))
      .as("l")).as[String].collect()
    // python: csv.writer quotes fields containing , or "; \n was cleaned
    assert(lines(0) == "plain,\"with,comma\",with newline,\"has\"\"quote\"")
    assert(lines(1) == "a,b,c,d")
  }

  test("K2 naive join: no quoting, no cleaning") {
    import spark.implicits._
    val df = Seq(("x,y", "z")).toDF("a", "b")
    val l = df.select(Sinks.naiveCsvLine(Seq($"a", $"b")).as("l"))
      .as[String].collect()(0)
    assert(l == "x,y,z") // commas pass through, exactly like ','.join
  }

  test("K3 ordered digest: blocks concatenated in rank order per key") {
    import spark.implicits._
    val df = Seq(
      ("s1", 3L, "C"), ("s1", 1L, "A"), ("s1", 2L, "B"),
      ("s2", 1L, "X")
    ).toDF("subject", "rank", "block")
    val out = Sinks.orderedDigest(df, $"subject", $"rank", $"block")
      .orderBy("key").as[(String, String)].collect()
    assert(out.toSeq == Seq(("s1", "ABC"), ("s2", "X")))
  }

  test("K4 counts row: fixed subject order, zero-filled, date-prefixed") {
    import spark.implicits._
    val df = Seq(
      ("2024-01-01", "cs.CV"), ("2024-01-01", "cs.CV"),
      ("2024-01-01", "cs.AI"), ("2024-01-02", "cs.RO")
    ).toDF("date", "subject")
    val out = Sinks.countsRow(df, $"date", $"subject",
      Seq("cs.CV", "cs.AI", "cs.RO"))
      .orderBy("date").select("line").as[String].collect()
    assert(out.toSeq == Seq("2024-01-01,2,1,0", "2024-01-02,0,0,1"))
  }

  test("K5 artifact layout: label dir + url basename file name") {
    import spark.implicits._
    val df = Seq(("cs.CV", "https://h/pdf/2401.123v2", Array[Byte](1, 2)))
      .toDF("label", "url", "bytes")
    val out = Sinks.artifactLayout(df, $"label", $"url", $"bytes").collect()(0)
    assert(out.getString(0) == "cs.CV")
    assert(out.getString(1) == "2401.123v2")
  }

  test("K6 process-sink command generation: byte-exact git-clone and " +
    "yt-dlp lines (getrepository.py:178, youtube.py:74)") {
    import spark.implicits._
    val repos = Seq(("page_0", "https://github.com/alice/proj", "proj_alice"))
      .toDF("page", "url", "name")
    val git = Sinks.gitCloneCommands(repos, lit("out"), $"page", $"url",
      $"name").as[String].collect()
    assert(git.toSeq == Seq(
      "cd out/page_0 && git clone --recursive " +
        "https://github.com/alice/proj proj_alice&"))
    val vids = Seq("dQw4w9WgXcQ").toDF("video_id")
    val yt = Sinks.ytDlpCommands(vids, lit("videos"), $"video_id")
      .as[String].collect()
    assert(yt.toSeq == Seq(
      "yt-dlp https://www.youtube.com/watch?v=dQw4w9WgXcQ " +
        "-o videos/dQw4w9WgXcQ.mp4"))
  }

  test("K7 timestamped XML dump: strftime name with the trailing space " +
    "before .xml; append mode accumulates within the same second") {
    val dir = java.nio.file.Files.createTempDirectory("k7").toString
    val clock = () => 1700000000000L // 2023-11-14 22:13:20 UTC
    val utc = java.util.TimeZone.getTimeZone("UTC")
    val f1 = Sinks.tsXmlDump(dir, "<r>a</r>\n", clock, utc)
    assert(f1.getFileName.toString == "20231114-221320 .xml")
    val f2 = Sinks.tsXmlDump(dir, "<r>b</r>\n", clock, utc)
    assert(f1 == f2) // same second → same file, appended (open 'a+')
    assert(java.nio.file.Files.readString(f1) == "<r>a</r>\n<r>b</r>\n")
  }
}
