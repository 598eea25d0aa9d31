package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling (north_rule: "host-key skew is handled via
  * salted repartitioning and AQE").
  *
  * AQE's skew-join splitting covers joins; SALTED TWO-PHASE AGGREGATION
  * covers the groupBy side: a hot key (one host owning 30% of a crawl's
  * URLs) would otherwise funnel into a single reducer. Phase 1 groups by
  * (key, salt) — the hot key's rows spread over `saltBuckets` reducers
  * and partially aggregate; phase 2 re-aggregates the ≤ saltBuckets
  * partials per key. Results are identical to the direct aggregation for
  * any commutative+associative aggregate (SkewSpec proves equality);
  * only the shuffle shape changes.
  *
  * The salt is `pmod(xxhash64(rowSeed), saltBuckets)` — deterministic per
  * row (no rand(), which would break retry/replay determinism).
  */
object Skew {

  /** Two-phase salted sum/count aggregation.
    *
    * @param df         input
    * @param key        grouping column
    * @param rowSeed    any column varying within a key (e.g. url, id) —
    *                   drives the deterministic salt
    * @param aggs       (name → phase-1 aggregate) pairs; each must be
    *                   re-aggregable by SUM in phase 2 (sum, count)
    */
  def saltedAgg(df: DataFrame, key: Column, rowSeed: Column,
      saltBuckets: Int, aggs: Seq[(String, Column)]): DataFrame = {
    val phase1 = df
      .withColumn("__salt", pmod(xxhash64(rowSeed), lit(saltBuckets.toLong)))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }: _*)
    phase1
      .groupBy(col("__key"))
      .agg(sum(aggs.head._1).as(aggs.head._1),
        aggs.tail.map { case (n, _) => sum(n).as(n) }: _*)
      .withColumnRenamed("__key", "key")
  }
}
