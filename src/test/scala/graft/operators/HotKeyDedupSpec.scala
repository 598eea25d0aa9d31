package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession

/** Planted hot-KEY corpora for the dedup family — the web-scale failure
  * mode the two-phase caps exist for: one boilerplate shingle / one clump
  * of byte-identical documents whose uncapped posting list or LSH bucket
  * would be a single-task p² blowup (q21: a ~10^8-element collect_list
  * buffer in one aggregation task; q22/q23: p² candidate rows out of one
  * band/chunk bucket). At test scale the blowup can't literally OOM, so
  * these specs pin the SEMANTICS of the caps at their exact boundaries
  * (df = cap kept, df = cap+1 dropped) and prove the hot corpora run in
  * bounded time with the output the capped algebra predicts; the plan
  * STRUCTURE (count-aggregate + anti-join strictly before any buffer or
  * self-join) is pinned by PlanSpec.
  */
class HotKeyDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("hotkey-dedup-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def writeDocs(texts: Seq[String]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("hotkey-fix").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "src1", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(4)
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("q21 planted hot shingle: one shingle shared by 50k docs is df-" +
    "capped away BEFORE any posting list exists — zero pairs, bounded run") {
    // every doc: the hot 3-gram + a unique tail ⇒ the only shared shingle
    // has df = 50 000 ≫ DfCap; the uncapped formulation would materialize
    // a 50 000-element collect_list buffer in ONE task (at 10^8 docs, an
    // ~800 MB buffer → executor OOM) before discarding it
    val n = 50000
    val dir = writeDocs((0 until n).map(i =>
      s"hot shot gun uniq${i}a uniq${i}b uniq${i}c"))
    val rows = DedupQueries.ngramJaccard(spark, dir).collect()
    assert(rows.isEmpty,
      s"hot-shingle-only corpus must yield no pairs, got ${rows.length}")
  }

  test("q21 df-cap boundary: a shingle in exactly DfCap docs is KEPT " +
    "(full pair set), in DfCap+1 docs it is DROPPED (no pairs)") {
    val cap = DedupQueries.DfCap
    // 4-word docs ⇒ 2 shingles: the shared head (df = n) + a unique tail;
    // kept ⇒ jaccard = 1/(2+2−1) = 33% ≥ 15 ⇒ all n(n−1)/2 pairs
    def corpus(n: Int) =
      writeDocs((0 until n).map(i => s"alpha beta gamma uniq$i"))
    val kept = DedupQueries.ngramJaccard(spark, corpus(cap)).collect()
    assert(kept.length == cap * (cap - 1) / 2,
      s"df=cap must keep the shingle: ${kept.length} pairs")
    assert(kept.forall(_.getLong(2) == 33L))
    val dropped = DedupQueries.ngramJaccard(spark, corpus(cap + 1)).collect()
    assert(dropped.isEmpty,
      s"df=cap+1 must drop the shingle, got ${dropped.length} pairs")
  }

  test("q22 planted identical-doc clump: 10k byte-identical docs share " +
    "ALL band buckets — the bucket cap drops them before the self-join " +
    "(no p² candidates); a clump under the cap still pairs at jaccard 100") {
    val clump = "the quick brown fox jumps over the lazy dog tonight"
    // 10 000 identical docs: uncapped, EVERY band bucket yields
    // 10k·(10k−1)/2 ≈ 5·10^7 candidate rows × 8 bands ≈ 4·10^8 join rows;
    // capped, the whole clump vanishes (exact dups are q20's job)
    val hotDir = writeDocs(Seq.fill(10000)(clump))
    assert(DedupQueries.minhashLsh(spark, hotDir).count() == 0L)
    // a 10-doc clump (≤ BucketCap) keeps its full pair set, verified exact
    val okDir = writeDocs(Seq.fill(10)(clump) ++
      Seq("completely different filler text body entirely unrelated words"))
    val pairs = DedupQueries.minhashLsh(spark, okDir).collect()
    assert(pairs.length == 10 * 9 / 2)
    assert(pairs.forall(_.getLong(2) == 100L))
  }

  test("q53/q63 planted hot identical text: 50k byte-identical docs " +
    "(the '404 not found' web-corpus mode) flow through the funnel's " +
    "dedup_keep as a partial aggregate + join-back — bounded run, " +
    "exactly one keeper, and no Window node in the plan") {
    // uncapped-window formulation: all 50k copies land in ONE window
    // partition sorting full text payloads in a single task; the
    // dedupReps aggregate combines map-side (4 partitions → 4 partial
    // rows for the hot text) and the join-back is AQE-splittable
    val n = 50000
    val dir = writeDocs(Seq.tabulate(n)(i =>
      if (i % 2 == 0) "404 not found error page"
      else s"unique page body number $i with distinct content"))
    val funnel = TextQueries.corpusFunnel(spark, dir)
    val plan = funnel.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"funnel must not window over text:\n$plan")
    val keep = funnel.select("doc_id", "dedup_keep").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keep(0L) == 1L, "first copy of the hot text is the keeper")
    assert(keep(2L) == 0L && keep(n.toLong - 2) == 0L,
      "later copies of the hot text are dropped")
    assert(keep(1L) == 1L && keep(3L) == 1L, "unique docs all kept")
    assert(keep.count(_._2 == 1L) == n / 2 + 1)
  }

  test("q23 pigeonhole saturation boundary: a bucket space too small for " +
    "the corpus caps EVERY bucket away and silently drops a planted pair " +
    "— widening the chunks (or switching to chunk-pair keys) finds it " +
    "again with the same plan") {
    // scaled-down analogy of 2^16 buckets at 10^10 docs: 2^4 buckets at
    // 2k docs puts ~125 docs in every bucket, all over the cap of 64 —
    // the capped operator returns nothing, including the planted
    // identical pair (hamming 0)
    val n = 2000
    val texts = (0 until n).map(i =>
      s"uniq${i}a uniq${i}b uniq${i}c uniq${i}d uniq${i}e uniq${i}f") :+
      s"uniq42a uniq42b uniq42c uniq42d uniq42e uniq42f" // dup of doc 42
    val docs = spark.read.parquet(s"${writeDocs(texts)}/documents.parquet")
    val planted = (42L, n.toLong)

    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val saturated = pairsOf(
      DedupQueries.simhashPairsWith(docs, nChunks = 4, chunkBits = 4))
    assert(!saturated.contains(planted),
      "saturated bucket space should have capped the planted pair away")

    // the default 4×16 scheme: 2^16 buckets per chunk index is roomy at
    // this corpus size — the planted pair survives the cap
    val widened = pairsOf(DedupQueries.simhashPairsWith(docs))
    assert(widened.contains(planted), s"widened scheme lost the pair")

    // chunk-PAIR keys: 6×10-bit chunks joined on C(6,2)=15 pair keys —
    // 2^20 bucket values per key index from the same 64-bit hash; the
    // pigeonhole still guarantees hamming ≤ 3 (≤ 6−2) and finds the pair
    val paired = pairsOf(DedupQueries.simhashPairsWith(docs,
      nChunks = 6, chunkBits = 10, pairKeys = true))
    assert(paired.contains(planted), s"pair-key scheme lost the pair")
  }

  test("q23 pigeonhole parameter guard: schemes that cannot guarantee " +
    "the hamming radius are rejected, not silently lossy") {
    val docs = spark.read.parquet(
      s"${writeDocs(Seq("a b c", "d e f"))}/documents.parquet")
    intercept[IllegalArgumentException] {
      DedupQueries.simhashPairsWith(docs, nChunks = 3, maxHamming = 3)
    }
    intercept[IllegalArgumentException] {
      DedupQueries.simhashPairsWith(docs, nChunks = 4, pairKeys = true,
        maxHamming = 3)
    }
    intercept[IllegalArgumentException] {
      DedupQueries.simhashPairsWith(docs, nChunks = 5, chunkBits = 16)
    }
  }

  test("q23 planted identical-doc clump: 10k identical simhashes share " +
    "all four chunks — capped away; a clump under the cap pairs at " +
    "hamming 0") {
    val clump = "pack my box with five dozen liquor jugs again and again"
    val hotDir = writeDocs(Seq.fill(10000)(clump))
    assert(DedupQueries.simhashPairs(spark, hotDir).count() == 0L)
    val okDir = writeDocs(Seq.fill(8)(clump))
    val pairs = DedupQueries.simhashPairs(spark, okDir).collect()
    assert(pairs.length == 8 * 7 / 2)
    assert(pairs.forall(_.getInt(2) == 0))
  }
}
