package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for a webtext training-data pipeline over the
  * `documents` table: exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design (100 TB / 10^10 docs):
  *   - exact dedup is one hash-aggregate on the content hash — never a
  *     sort, never a pairwise compare;
  *   - the quadratic near-dup problem is always BLOCKED before any pair is
  *     materialized: shingle inverted-index join (n-gram Jaccard), banded
  *     signature buckets (MinHash-LSH), chunk pigeonhole buckets (SimHash
  *     hamming ≤ k). Within-bucket candidate pairs are then verified
  *     exactly. The all-pairs cross join never appears in any plan;
  *   - everything below is Spark built-ins (codegen'd); the only lambda
  *     expressions are `transform`/`aggregate` higher-order functions,
  *     which Catalyst also codegens.
  */
object DedupQueries {
  import CoreQueries.t

  /** Word 3-gram shingle set (lowercased) as an array column; empty for
    * docs shorter than n words (Spark `sequence` would otherwise count
    * DOWN for a negative stop and blow up `slice`).
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val words = split(trim(lower(text)), "\\s+")
    when(size(words) >= n,
      array_distinct(
        transform(sequence(lit(0), size(words) - n),
          i => concat_ws(" ", slice(words, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact dedup (hash-groupBy): duplicate groups keyed by full content,
    * deterministic representative = min doc_id. At scale the groupBy key
    * is xxhash64(text) (fixed-width shuffle key), with the full text only
    * compared inside each tiny hash bucket; here text is the key directly
    * so the DuckDB oracle can replicate it.
    */
  def exactDedup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(col("text"))
      .agg(min("doc_id").as("keep_doc"), count(lit(1)).as("n_copies"))
      .select(col("keep_doc"), col("n_copies"))
      .orderBy("keep_doc")

  /** N-gram Jaccard near-dup pairs via shingle inverted index:
    * explode shingles → self-join on shingle (only docs SHARING a shingle
    * ever meet) → per-pair intersection count → Jaccard from per-doc set
    * sizes. Threshold low enough to yield rows on the synthetic corpus;
    * jaccard reported as integer percent for exact oracle compare.
    */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), shingles(col("text")).as("sh"))
    val sizes = docs.select(col("doc_id"), size(col("sh")).as("sz"))
    val inv = docs.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val a = inv.toDF("doc_a", "shingle")
    val b = inv.toDF("doc_b", "shingle")
    val inter = a.join(b, "shingle")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.toDF("doc_a", "sz_a")), "doc_a")
      .join(broadcast(sizes.toDF("doc_b", "sz_b")), "doc_b")
      .withColumn("jaccard_pct",
        floor(col("inter") * 100 / (col("sz_a") + col("sz_b") - col("inter")))
          .cast("long"))
      .filter(col("jaccard_pct") >= 15)
      .select("doc_a", "doc_b", "jaccard_pct")
      .orderBy("doc_a", "doc_b")
  }

  val MinhashK = 32 // signature length
  val LshBands = 8 // bands of 4 rows each

  /** MinHash signature: for each of k salted hash functions, the min
    * xxhash64(salt, shingle) over the doc's shingle set — all built-ins,
    * no UDF, one pass.
    */
  def minhashSignature(sh: Column, k: Int = MinhashK): Column =
    transform(sequence(lit(0), lit(k - 1)),
      j => array_min(transform(sh, sg => xxhash64(j, sg))))

  /** MinHash+LSH near-dup candidates, verified: shingle → signature →
    * banded buckets (band hash of r consecutive signature slots) →
    * same-bucket candidate pairs → exact Jaccard verification on the
    * candidates only. This is THE near-dup scale path: cost is
    * O(docs × bands) + O(candidate pairs), not O(docs²).
    */
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    val r = MinhashK / LshBands
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val sig = docs.select(col("doc_id"), col("sh"),
      minhashSignature(col("sh")).as("sig"))
    val banded = sig.select(col("doc_id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(LshBands - 1)),
        b => xxhash64(b, concat_ws(",", slice(col("sig"), b * r + 1, lit(r))))))
        .as(Seq("band", "band_hash")))
    val left = banded.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
      col("band"), col("band_hash"))
    val right = banded.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
      col("band"), col("band_hash"))
    val cands = left.join(right, Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b")
      .dropDuplicates("doc_a", "doc_b")
    cands
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard_pct",
        floor(col("inter") * 100 /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter"))).cast("long"))
      .filter(col("jaccard_pct") >= 50)
      .select("doc_a", "doc_b", "jaccard_pct")
      .orderBy("doc_a", "doc_b")
  }

  /** 64-bit SimHash: per bit, vote by the sign sum over token hashes.
    * Implemented as ONE deterministic single-pass Scala UDF — the built-in
    * alternative needs 64 `aggregate` passes over the token array (shift
    * amounts must be literals), which is strictly worse than the udf even
    * without codegen. At 100 TB this is the spot for a custom codegen
    * `Expression`; the hash itself (xxHash64 per token, seed 42) matches
    * Spark's `xxhash64` bit-for-bit so signatures are engine-portable.
    */
  val simhashUdf = udf { (text: String) =>
    val votes = new Array[Int](64)
    if (text != null) {
      val toks = text.trim.toLowerCase.split("\\s+")
      var t = 0
      while (t < toks.length) {
        val bytes = org.apache.spark.unsafe.types.UTF8String
          .fromString(toks(t))
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(bytes.getBaseObject, bytes.getBaseOffset,
            bytes.numBytes, 42L)
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
        t += 1
      }
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  def simhashCol(text: Column): Column = simhashUdf(text)

  /** SimHash near-dup pairs with hamming distance ≤ 3, blocked by the
    * 4-chunk pigeonhole: two hashes within hamming 3 must agree on at
    * least one of four 16-bit chunks, so candidates come from equi-joins
    * on chunks — never an all-pairs scan.
    */
  def simhashPairs(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), simhashCol(col("text")).as("simhash"))
    val chunked = docs.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("chunk_idx", "chunk")))
    val a = chunked.toDF("doc_a", "sim_a", "chunk_idx", "chunk")
    val b = chunked.toDF("doc_b", "sim_b", "chunk_idx", "chunk")
    val hamming = {
      val x = col("sim_a").bitwiseXOR(col("sim_b"))
      bit_count(x)
    }
    a.join(b, Seq("chunk_idx", "chunk"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", hamming.cast("int"))
      .filter(col("hamming") <= 3)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }
}
