package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.DedupQueries

/** The text kernels must match their HOF/UDF twins (shingle semantics are
  * mirrored in the q21 DuckDB oracle; simhash64 supersedes a Scala UDF
  * with pinned-identical output), survive nulls/empties, and stay inside
  * whole-stage codegen.
  */
class TextExpressionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]").appName("textexpr-spec")
    .withExtensions(new GraftExtensions)
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  val texts = Seq(
    "The quick brown fox jumps over the lazy dog",
    "the quick  brown\tfox", // collapse runs, case fold
    " leading and trailing  ",
    "one two", // shorter than n=3 → empty
    "dup trigram dup trigram dup trigram dup", // repeated shingles distinct
    "",
    null)

  /** The HOF pipeline word_shingles replaced (kept here as the semantic
    * twin the kernel is pinned against).
    */
  private def hofShingles(c: org.apache.spark.sql.Column, n: Int = 3) = {
    val words = split(trim(lower(c)), "\\s+")
    when(size(words) >= n,
      array_distinct(
        transform(sequence(lit(0), size(words) - n),
          i => concat_ws(" ", slice(words, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  test("word_shingles == the HOF pipeline it replaces, incl. empties/nulls") {
    import spark.implicits._
    val rows = texts.toDF("text")
      .select(DedupQueries.shingles(col("text")).as("kern"),
        hofShingles(col("text")).as("hof"), col("text"))
      .collect()
    rows.foreach { r =>
      if (r.get(2) == null) assert(r.isNullAt(0))
      else assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"mismatch for '${r.get(2)}'")
    }
  }

  test("simhash64 expression == the Scala UDF it supersedes") {
    import spark.implicits._
    val rows = texts.toDF("text")
      .select(DedupQueries.simhashCol(col("text")).as("kern"),
        DedupQueries.simhashUdf(col("text")).as("udf"), col("text"))
      .collect()
    rows.foreach { r =>
      if (r.get(2) == null) assert(r.isNullAt(0))
      else assert(r.getLong(0) == r.getLong(1), s"mismatch for '${r.get(2)}'")
    }
  }

  test("minhash_bands: equal shingle sets collide on every band; the band " +
    "count and determinism hold") {
    import spark.implicits._
    val df = Seq(
      "alpha beta gamma delta epsilon zeta",
      "alpha beta gamma delta epsilon zeta", // identical
      "totally different words in this one here").toDF("text")
      .select(DedupQueries.minhashBandHashes(
        DedupQueries.shingles(col("text"))).as("bands"))
    val rows = df.collect().map(_.getSeq[Long](0))
    assert(rows.forall(_.length == DedupQueries.LshBands))
    assert(rows(0) == rows(1)) // same set → same signature → same bands
    assert(rows(0) != rows(2))
  }

  test("kernels run inside whole-stage codegen (no UDF bridge)") {
    val df = spark.range(1000)
      .selectExpr("concat('w', id % 7, ' x', id % 5, ' y', id % 3, ' z', id) AS t")
      .selectExpr("simhash64(t) AS h", "word_shingles(t) AS sh",
        "minhash_bands(word_shingles(t)) AS mb")
      .filter(col("h") =!= 0L)
    assert(df.count() == 1000)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no codegen span:\n$plan")
    assert(!plan.contains("ScalaUDF"), s"UDF bridge present:\n$plan")
  }
}
