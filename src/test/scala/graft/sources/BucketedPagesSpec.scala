package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.fixtures.SyntheticWeb

/** The bucketed fetch join must (a) return the same rows as the plain
  * join and (b) show NO Exchange on the pages side — the scale guarantee
  * that html bytes never shuffle.
  */
class BucketedPagesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val warehouse =
    java.nio.file.Files.createTempDirectory("bucket-wh").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]").appName("bucket-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    .config("spark.ui.enabled", "false").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  val cfg = SyntheticWeb.Config(nHosts = 2, pagesPerHost = 2, itemsPerPage = 3)

  test("bucketed fetch join: no Exchange under the bucketed pages scan; " +
    "results equal the plain join") {
    val pages = SyntheticWeb.pages(spark, cfg)
    BucketedPages.write(spark, pages, "pages_bucketed", nBuckets = 8)

    val hashUdf = udf((u: String) => graft.crawl.CrawlLoop.hash64(
      graft.url.UrlCanon.canonicalize(u)))
    val frontier = pages.select(col("url").as("f_url"))
      .withColumn("url_hash", hashUdf(col("f_url")))

    val joined = BucketedPages.fetchJoin(spark, frontier, "pages_bucketed")
      .select("url_hash", "f_url", "url")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString

    // look only at the executed (final) AQE plan, not the printed initial
    val finalPlan = plan.split("== Initial Plan ==")(0)
    // the bucketed side: scan carries bucket info; exactly one Exchange
    // total (the frontier side) — html bytes never shuffle
    assert(finalPlan.contains("Bucketed: true"),
      s"pages scan not bucketed:\n$finalPlan")
    assert(finalPlan.contains("SortMergeJoin"),
      s"expected sort-merge join:\n$finalPlan")
    val exchanges = "Exchange".r.findAllIn(finalPlan).length
    assert(exchanges == 1,
      s"expected 1 exchange (frontier side), plan:\n$finalPlan")

    // row equivalence vs the plain (shuffling) join
    val plainPages = pages.withColumn("url_hash", hashUdf(col("url")))
    val plain = frontier.join(plainPages, Seq("url_hash"), "left")
      .select("url_hash", "f_url", "url")
    assert(joined.collect().map(_.toString).sorted.toSeq ==
      plain.collect().map(_.toString).sorted.toSeq)
  }

  test("CrawlLoop's fetch-join shape (struct entry, top-level url_hash) " +
    "keeps the bucketed side exchange-free") {
    import spark.implicits._
    val pages = SyntheticWeb.pages(spark, cfg)
    BucketedPages.write(spark, pages, "pages_bucketed2", nBuckets = 8)
    // the exact frame shape CrawlLoop.run builds from the scheduler output
    val sched = pages.select(col("url")).as[String]
      .map(u => graft.frontier.Scheduled(
        graft.crawl.CrawlLoop.entryOf(u, "paper", 0, 0, 0, 0), 0, 0L))
    val fetched = sched.toDF()
      .withColumn("url_hash", col("entry.urlHash"))
      .join(spark.table("pages_bucketed2").select(col("url_hash"), col("html")),
        Seq("url_hash"), "left")
      .select(col("entry"), col("html"))
    fetched.collect()
    val finalPlan = fetched.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(finalPlan.contains("Bucketed: true"), s"not bucketed:\n$finalPlan")
    assert("Exchange".r.findAllIn(finalPlan).length == 1,
      s"html payload shuffled — expected 1 exchange (frontier side):\n$finalPlan")
  }

  test("register() re-attaches the written files to a fresh catalog with " +
    "the bucket spec intact") {
    val pages = SyntheticWeb.pages(spark, cfg)
    val loc = java.nio.file.Files.createTempDirectory("bucket-ext").toString +
      "/pages"
    BucketedPages.write(spark, pages, "pages_ext", nBuckets = 8,
      path = Some(loc))
    // simulate a fresh session's catalog: drop and re-register from files
    spark.sql("DROP TABLE pages_ext")
    BucketedPages.register(spark, "pages_ext", loc, nBuckets = 8)

    val hashUdf = udf((u: String) => graft.crawl.CrawlLoop.hash64(
      graft.url.UrlCanon.canonicalize(u)))
    val frontier = pages.select(col("url").as("f_url"))
      .withColumn("url_hash", hashUdf(col("f_url")))
    val joined = BucketedPages.fetchJoin(spark, frontier, "pages_ext")
      .select("url_hash", "f_url", "url")
    assert(joined.count() == pages.count())
    val finalPlan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(finalPlan.contains("Bucketed: true"),
      s"re-registered table lost bucketing:\n$finalPlan")
    assert("Exchange".r.findAllIn(finalPlan).length == 1,
      s"expected 1 exchange after register():\n$finalPlan")
  }
}
