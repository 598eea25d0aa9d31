package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed storage for the pages table: co-locates rows by `url_hash`
  * so the per-wave fetch join (frontier ⋈ pages) needs NO shuffle of the
  * pages side — only the frontier (a few dozen bytes/row) moves, never
  * the html payload (KBs–MBs/row). At 100 TB this is the difference
  * between shuffling the corpus every wave and shuffling only the wave's
  * URL list.
  *
  * Mechanics: `bucketBy(n, url_hash).sortBy(url_hash)` Parquet via
  * `saveAsTable` (works on the in-memory catalog — no Hive metastore
  * needed). The sort-merge join then reads each bucket file as a
  * pre-partitioned, pre-sorted input: the bucketed side shows no
  * Exchange and no Sort in the physical plan (BucketedPagesSpec pins
  * this), while the frontier side exchanges into the same bucketing.
  *
  * This is the Iceberg-analogue layout choice (hash bucket partitioning
  * on the identity column); the SnapshotStore manifests would record
  * bucket spec per table in a production catalog.
  */
object BucketedPages {

  /** Write pages keyed and bucketed by url_hash. */
  def write(spark: SparkSession, pages: DataFrame, table: String,
      nBuckets: Int = 32): Unit = {
    val hashUdf = udf((u: String) => graft.crawl.CrawlLoop.hash64(
      graft.url.UrlCanon.canonicalize(u)))
    pages
      .withColumn("url_hash", hashUdf(col("url")))
      .write
      .bucketBy(nBuckets, "url_hash")
      .sortBy("url_hash")
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Fetch join against the bucketed table: pages side is read in place
    * (no Exchange); only `frontier` (with a `url_hash` column) shuffles.
    */
  def fetchJoin(spark: SparkSession, frontier: DataFrame,
      table: String): DataFrame = {
    val pages = spark.table(table)
    frontier.join(pages, Seq("url_hash"), "left")
  }
}
