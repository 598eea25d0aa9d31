package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.col
import graft.crawl.CrawlLoop
import graft.url.UrlCanon

/** The native expressions must agree bit-for-bit with the row-side
  * functions, survive nulls, stay inside whole-stage codegen, and be
  * reachable from SQL via the extensions hook.
  */
class UrlExpressionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]").appName("urlexpr-spec")
    .withExtensions(new GraftExtensions)
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  val urls = Seq(
    "HTTPS://Example.ORG:443/a/../b?q=1#frag",
    "http://h.example.org/path with space",
    "https://arxiv.org/abs/2401.00001",
    null)

  test("expression results == row-side functions, nulls pass through") {
    import spark.implicits._
    val df = urls.toDF("url")
      .selectExpr("url", "url_canon(url) AS c", "url_hash64(url) AS h")
    val rows = df.collect()
    rows.foreach { r =>
      Option(r.getString(0)) match {
        case None =>
          assert(r.isNullAt(1) && r.isNullAt(2))
        case Some(u) =>
          assert(r.getString(1) == UrlCanon.canonicalize(u))
          assert(r.getLong(2) == CrawlLoop.hash64(UrlCanon.canonicalize(u)))
      }
    }
  }

  test("url_path (pathCol) == pathOf on adversarial inputs — uppercase " +
    "scheme, embedded newline, scheme-less '://', so map- and join-side " +
    "robots admission cannot diverge") {
    import spark.implicits._
    val adversarial = Seq(
      "https://h.example.org/disallowed/x",
      "HTTPS://h.example.org/disallowed/x", // uppercase scheme
      "https://h.example.org/a\nb/c", // embedded newline
      "weird://inside/path", // unusual scheme
      "no-scheme-but-has://slash/later", // '://' in a non-scheme position
      "h.example.org/rootless",
      "just-a-token",
      "")
    val rows = adversarial.toDF("url")
      .select(col("url"), UrlCanon.pathCol(col("url")).as("p"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(1) == UrlCanon.pathOf(r.getString(0)),
        s"pathCol diverges from pathOf for '${r.getString(0)}'")
    }
  }

  test("expressions run inside whole-stage codegen (no UDF bridge)") {
    // derive urls from range so the projection cannot constant-fold into
    // a LocalTableScan — the expression must run in generated code
    val df = spark.range(1000)
      .selectExpr("concat('https://h', id % 7, '.example.org/p', id) AS url")
      .selectExpr("url_hash64(url) AS h")
      .filter(col("h") =!= 0L)
    assert(df.count() == 1000)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no codegen span:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"UDF bridge present:\n$plan")
  }

  test("SQL surface via extensions: url_hash64 usable in a query") {
    import spark.implicits._
    Seq("https://a.example.org/x", "https://b.example.org/y")
      .toDF("url").createOrReplaceTempView("urls_v")
    val n = spark.sql(
      "SELECT count(DISTINCT url_hash64(url)) FROM urls_v").collect()(0).getLong(0)
    assert(n == 2L)
  }
}
