package graft.crawl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.fixtures.SyntheticWeb.{Robots, Seed}
import graft.frontier.{FrontierEntry, PoliteScheduler, Scheduled}
import graft.seen.UrlSeen
import graft.store.SnapshotStore
import graft.url.UrlCanon

/** The generic crawl wave loop (SURVEY.md R5/§7.6):
  *
  *   while frontier nonempty:
  *     wave    = politeness-schedule(frontier)          — typed Aggregator
  *     fetched = wave ⋈ pages on url_hash               — the table IS the web
  *     records ∪= extract(fetched); links = outlinks(fetched)
  *     retries = failed rows, attempts+1, dropped at max (→ fetch_log)
  *     frontier = (frontier ∖ wave) ∪ retries ∪ (links ∖ seen)
  *     snapshot(frontier, seen, records Δ, fetch_log Δ) — resumable
  *
  * Scale notes (the 10^10-URL design point):
  *   - every wave's state round-trips through the snapshot store — this is
  *     simultaneously the resumability contract (north_rule) AND the
  *     lineage truncation that keeps plan depth constant across hundreds
  *     of waves (no ever-growing DAG, no driver OOM);
  *   - frontier⋈pages is an equi-join on a well-mixed 64-bit key: AQE
  *     handles hot-host skew (`skewJoin`), and the politeness budget
  *     itself bounds any host to `hostBudget` rows per wave;
  *   - the seen check is Bloom-prefilter → exact left-anti (UrlSeen):
  *     the definite-unseen majority of candidate links never enters the
  *     anti-join shuffle;
  *   - records/fetch_log are written as per-wave immutable deltas (append
  *     pattern) — nothing is rewritten; reading the result is a union of
  *     deltas listed by the manifests.
  *
  * Robots gating (absent in the reference, required by north_rule) is an
  * ADMISSION filter: a disallowed URL never enters the frontier (otherwise
  * it would sit there unscheduled forever); crawl delays come from the
  * robots table at schedule time.
  */
object CrawlLoop extends Serializable {

  final case class Config(
      scheduler: PoliteScheduler.Config = PoliteScheduler.Config(),
      seenCfg: UrlSeen.Config = UrlSeen.Config(),
      maxAttempts: Int = 3, // R2: drop after 3 tries
      maxWaves: Int = 64,
      useBloom: Boolean = true,
      // below this seen-set size the bloom build costs more than the
      // anti-join it accelerates — skip it (the exact join is always the
      // authority, so this is purely a cost knob)
      bloomMinSeen: Long = 4096L,
      // "agg" = typed Aggregator (map-side bounded top-k; default),
      // "sql" = window-function twin (Tungsten-only, for huge waves).
      // SchedulerSpec proves the two produce identical waves.
      schedulerImpl: String = "agg"
  )

  final case class FetchLogRow(url_hash: Long, host: String, wave: Int,
      attempt: Int, status: Int, slot: Int, not_before: Long,
      partition_id: Int)

  final case class Result(records: DataFrame, fetchLog: DataFrame,
      seen: DataFrame, waves: Int)

  /** Host-salted 64-bit xxHash of the canonical URL (north_rule identity);
    * row-side twin of the columnar `xxhash64(host, canon_url)`.
    */
  def hash64(canonUrl: String): Long = {
    val host = UrlCanon.hostOf(canonUrl)
    val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      host.getBytes("UTF-8"), org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
      host.getBytes("UTF-8").length, 42L)
    val b = canonUrl.getBytes("UTF-8")
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, h)
  }

  def entryOf(url: String, kind: String, seed: Int, depth: Int, pageIdx: Int,
      posInPage: Int, attempts: Int = 0): FrontierEntry = {
    val canon = UrlCanon.canonicalize(url)
    FrontierEntry(canon, hash64(canon), UrlCanon.hostOf(canon), kind,
      seed, depth, pageIdx, posInPage, attempts)
  }

  def pathOf(url: String): String = {
    val i = url.indexOf("://")
    val rest = if (i >= 0) url.substring(i + 3) else url
    val j = rest.indexOf('/')
    if (j >= 0) rest.substring(j) else "/"
  }

  /** Run the crawl from seeds to empty frontier (or maxWaves). `pages` must
    * be the input_hint-shaped table; it is hashed once and cached.
    */
  def run(spark: SparkSession, pages: DataFrame, seeds: Dataset[Seed],
      robots: Dataset[Robots], store: SnapshotStore,
      cfg: Config = Config()): Result = {
    import spark.implicits._

    val robotsMap: Map[String, (Seq[String], Long)] =
      robots.collect().map(r => r.host -> ((r.disallow_prefixes, r.crawl_delay_ms))).toMap
    val bcRobots = spark.sparkContext.broadcast(robotsMap)
    def allowed(e: FrontierEntry): Boolean =
      bcRobots.value.get(e.host) match {
        case Some((prefixes, _)) =>
          val p = pathOf(e.url); !prefixes.exists(p.startsWith)
        case None => true
      }

    // native codegen expression (graft.functions.UrlHash64), not a UDF —
    // this runs once per page per crawl, the widest map in the engine
    val pagesKeyed = pages
      .select(graft.url.UrlCols.urlHash64(col("url")).as("url_hash"),
        col("html"))
      .cache()

    // resume (north_rule): pick up from the last committed snapshot
    val (startWave, frontier0, seen0) = store.head match {
      case Some(snap) =>
        (snap.wave + 1,
          store.table(snap, "frontier").get.as[FrontierEntry],
          store.table(snap, "seen").get)
      case None =>
        val f = seeds.map(s =>
          entryOf(s.url, s.site, s.seed_id, 0, 0, 0)).filter(allowed _)
        (0, f, f.select(col("urlHash").as("url_hash")).distinct().toDF())
    }

    var frontier = frontier0
    var seen = seen0
    var wave = startWave
    var frontierCount = frontier.count()
    var seenCount = seen.count()

    while (frontierCount > 0 && wave < cfg.maxWaves) {
      val waveStart = wave.toLong * 1000000L
      val sched: Dataset[Scheduled] =
        if (cfg.schedulerImpl == "sql")
          PoliteScheduler.scheduleSql(frontier, robots, waveStart, cfg.scheduler)
        else
          PoliteScheduler.scheduleWithMap(frontier, robotsMap, waveStart,
            cfg.scheduler)

      // fetch = equi-join against the pages table (left: missing ⇒ 404)
      val fetched = sched
        .joinWith(pagesKeyed, $"entry.urlHash" === pagesKeyed("url_hash"),
          "left_outer")
        .map { case (s, page) =>
          val html = Option(page)
            .map(p => new String(p.getAs[Array[Byte]]("html"), "UTF-8"))
          val status = PageParsers.fetchStatus(html, s.entry.attempts)
          (s, status, if (status == 200) html.get else "")
        }
        .toDF("sched", "status", "html")
        .cache()

      val parsed = fetched.filter(col("status") === 200)
        .select(col("sched.entry").as("_1"), col("html").as("_2"))
        .as[(FrontierEntry, String)]
        .map { case (e, html) => PageParsers.parse(e, html) }
        .cache()

      val recordsDelta = parsed.flatMap(_.records).toDF()

      // out-links: canonicalize, in-batch dedup keeping min crawl order,
      // robots admission filter, then seen-filter (bloom + exact anti)
      val links = parsed
        .flatMap(_.links.map(l =>
          entryOf(l.url, l.kind, l.seed, l.depth, l.pageIdx, l.posInPage)))
        .filter(allowed _)
        .toDF()
      val dedupedLinks = links
        .withColumn("rn", row_number().over(
          Window.partitionBy("urlHash")
            .orderBy("seed", "depth", "pageIdx", "posInPage")))
        .filter(col("rn") === 1).drop("rn")
      val candidates = dedupedLinks.withColumnRenamed("urlHash", "url_hash")
      val segments =
        if (cfg.useBloom && seenCount >= cfg.bloomMinSeen)
          Some(UrlSeen.buildSegments(seen, cfg.seenCfg))
        else None
      val newEntries = UrlSeen
        .filterUnseen(candidates, seen, segments, cfg.seenCfg)
        .withColumnRenamed("url_hash", "urlHash")
        .select("url", "urlHash", "host", "kind", "seed", "depth", "pageIdx",
          "posInPage", "attempts")
        .as[FrontierEntry]

      // retries: transient failures re-enter with attempts+1 (R2);
      // exhausted rows drop (their fetch_log row keeps the final attempt)
      val retries = fetched.filter(col("status") === 503)
        .select(col("sched.entry").as("e")).select("e.*")
        .as[FrontierEntry]
        .filter((e: FrontierEntry) => e.attempts + 1 < cfg.maxAttempts)
        .map(e => e.copy(attempts = e.attempts + 1))

      val fetchLogDelta = fetched
        .select(col("sched").as("_1"), col("status").as("_2"))
        .as[(Scheduled, Int)]
        .mapPartitions { it =>
          val pid = org.apache.spark.TaskContext.getPartitionId()
          it.map { case (s, status) =>
            FetchLogRow(s.entry.urlHash, s.entry.host, 0, s.entry.attempts,
              status, s.slot, s.notBefore, pid)
          }
        }.toDF()
        .withColumn("wave", lit(wave))

      // frontier' = (frontier ∖ scheduled) ∪ retries ∪ new links
      val schedHashes = sched.select(col("entry.urlHash").as("sched_hash"))
      val remaining = frontier
        .join(schedHashes, frontier("urlHash") === schedHashes("sched_hash"),
          "left_anti").as[FrontierEntry]
      // seen stays distinct by construction: newEntries passed the unseen
      // filter and are in-wave deduped, so a plain append suffices — no
      // per-wave distinct() shuffle over the whole seen set.
      val nextFrontier = remaining.union(retries).union(newEntries)
      val nextSeen = seen
        .union(newEntries.select(col("urlHash").as("url_hash")).toDF())

      val metrics = Map(
        "scheduled" -> sched.count(),
        "fetched_ok" -> parsed.count(),
        "records" -> recordsDelta.count(),
        "new_links" -> newEntries.count(),
        "retries" -> retries.count()
      )

      val snap = store.commit(wave, Map(
        "frontier" -> nextFrontier.toDF(),
        "seen" -> nextSeen,
        s"records_w$wave" -> recordsDelta,
        s"fetch_log_w$wave" -> fetchLogDelta
      ), metrics)

      // reload state from the committed snapshot: truncates lineage so
      // wave N+1's plan is independent of wave N's
      frontier = store.table(snap, "frontier").get.as[FrontierEntry]
      seen = store.table(snap, "seen").get
      frontierCount = metrics("new_links") + metrics("retries") +
        (frontierCount - metrics("scheduled"))
      seenCount += metrics("new_links")
      fetched.unpersist()
      parsed.unpersist()
      wave += 1
    }

    pagesKeyed.unpersist()
    Result(readDeltas(spark, store, "records_w"),
      readDeltas(spark, store, "fetch_log_w"), seen, wave)
  }

  /** Union all per-wave delta tables recorded across snapshots. */
  private def readDeltas(spark: SparkSession, store: SnapshotStore,
      prefix: String): DataFrame = {
    val paths = store.snapshots.flatMap { id =>
      val snap = store.readManifest(id)
      snap.tables.collect { case (name, path) if name.startsWith(prefix) => path }
    }.distinct
    paths.map(spark.read.parquet(_)).reduceOption(_ unionByName _)
      .getOrElse(spark.emptyDataFrame)
  }
}
