package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.extract.Compat

/** Salted aggregation equivalence + reference-bug compat fixtures. */
class SkewCompatSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]").appName("skew-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("salted two-phase aggregation == direct aggregation (hot-key-safe)") {
    import spark.implicits._
    // zipf-ish: host h0 owns ~60% of rows (the hot-host shape)
    val rows = (1 to 10000).map { i =>
      val host = if (i % 5 != 0) "h0" else s"h${i % 37}"
      (host, s"https://$host/p$i", (i % 13).toLong)
    }
    val df = rows.toDF("host", "url", "bytes")
    val direct = df.groupBy(col("host").as("key"))
      .agg(count(lit(1)).as("n"), sum("bytes").as("b"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(df, col("host"), col("url"), 16,
      Seq("n" -> count(lit(1)), "b" -> sum("bytes")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("salt is deterministic — same input, same partial split") {
    import spark.implicits._
    val df = (1 to 100).map(i => ("k", s"u$i", 1L)).toDF("host", "url", "v")
    val a = Skew.saltedAgg(df, col("host"), col("url"), 8,
      Seq("n" -> count(lit(1)))).collect()(0).getLong(1)
    val b = Skew.saltedAgg(df, col("host"), col("url"), 8,
      Seq("n" -> count(lit(1)))).collect()(0).getLong(1)
    assert(a == 100L && b == 100L)
  }

  test("GraftExtensions.install registers SQL functions on a plain session") {
    graft.functions.GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT url_hash64('https://A.example.org/x/../y') AS h, " +
        "url_canon('HTTP://E.org:80/a%2fb') AS c").collect()(0)
    assert(r.getLong(0) == graft.crawl.CrawlLoop.hash64(
      graft.url.UrlCanon.canonicalize("https://A.example.org/x/../y")))
    assert(r.getString(1) ==
      graft.url.UrlCanon.canonicalize("HTTP://E.org:80/a%2fb"))
  }

  test("compat bug 1 (search_pdf.py:64): strict stride is 201*i") {
    assert(Compat.pageStartOffsets(4, strictCompat = true) ==
      Vector(0L, 201L, 402L, 603L))
    assert(Compat.pageStartOffsets(4, strictCompat = false) ==
      Vector(0L, 200L, 400L, 600L))
  }

  test("compat bug 4 (new.py:79-82): strict counts file leads with \\n") {
    val rows = Seq("2024-01-01,2,1", "2024-01-02,0,3")
    assert(Compat.countsFileBody(rows, strictCompat = true) ==
      "\n2024-01-01,2,1\n2024-01-02,0,3")
    assert(Compat.countsFileBody(rows, strictCompat = false) ==
      "2024-01-01,2,1\n2024-01-02,0,3\n")
  }
}
