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
        "minhash_bands(word_shingles(t)) AS mb",
        "word_grams(t) AS wg", "gopher_stats(t) AS gs")
      .filter(col("h") =!= 0L)
    assert(df.count() == 1000)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no codegen span:\n$plan")
    assert(!plan.contains("ScalaUDF"), s"UDF bridge present:\n$plan")
  }

  /** The HOF twin of word_grams — identical to [[hofShingles]] minus the
    * array_distinct (grams are ordered and NON-distinct).
    */
  private def hofGrams(c: org.apache.spark.sql.Column, n: Int = 3) = {
    val words = split(trim(lower(c)), "\\s+")
    when(size(words) >= n,
      transform(sequence(lit(0), size(words) - n),
        i => concat_ws(" ", slice(words, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  test("word_grams == the ordered non-distinct HOF twin, incl. empties/" +
    "nulls; repeats preserved at their positions") {
    import spark.implicits._
    val rows = texts.toDF("text")
      .select(DedupQueries.wordGrams(col("text"), 3).as("kern"),
        hofGrams(col("text")).as("hof"), col("text"))
      .collect()
    rows.foreach { r =>
      if (r.get(2) == null) assert(r.isNullAt(0))
      else assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"mismatch for '${r.get(2)}'")
    }
    // repeated grams PRESERVED positionally — the property that makes
    // posexplode(word_grams(..)) a span-coverage input and distinguishes
    // it from word_shingles
    val rep = Seq("a b a b a b a").toDF("text")
      .select(DedupQueries.wordGrams(col("text"), 2)).collect()(0)
      .getSeq[String](0)
    assert(rep == Seq("a b", "b a", "a b", "b a", "a b", "b a"))
  }

  /** Transparent driver-side recomputation of gopher_stats via idiomatic
    * collections — deliberately a different code path from the kernel's
    * one-pass HashMap loops.
    */
  private def gopherRef(text: String): (Long, Long, Long, Long) = {
    val t = text.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    val ws = t.toLowerCase(java.util.Locale.ROOT).split("\\s+").toVector
    val n = ws.length
    val tokC = ws.groupBy(identity).map { case (k, v) => k -> v.size }
    val dupTok = ws.count(w => tokC(w) >= 2).toLong
    val bis = ws.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toVector
    val topBi = if (bis.isEmpty) 0L else bis.groupBy(identity).map {
      case (g, occ) => occ.size.toLong * g.codePointCount(0, g.length)
    }.max
    val tris = ws.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toVector
    val triC = tris.groupBy(identity).map { case (k, v) => k -> v.size }
    val cov = tris.zipWithIndex
      .collect { case (g, i) if triC(g) >= 2 => Seq(i, i + 1, i + 2) }
      .flatten.distinct.size.toLong
    (n.toLong, dupTok, topBi, cov)
  }

  test("gopher_stats == a transparent collections recomputation on every " +
    "sample text; astral-plane bigrams score in CODEPOINTS") {
    import spark.implicits._
    val rows = texts.toDF("text")
      .select(col("text"),
        graft.operators.TextQueries.gopherCol(col("text")).as("g"))
      .collect()
    rows.foreach { r =>
      if (r.get(0) == null) assert(r.isNullAt(1))
      else {
        val g = r.getStruct(1)
        val exp = gopherRef(r.getString(0))
        assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3)) == exp,
          s"mismatch for '${r.get(0)}'")
      }
    }
    // "𝕏a 𝕏a b": top bigram "𝕏a 𝕏a" scores 1 × 5 codepoints — a UTF-16
    // unit count would say 7 (𝕏 is a surrogate pair) and diverge from
    // both Spark length() and the DuckDB oracle
    val astral = Seq("𝕏a 𝕏a b").toDF("text")
      .selectExpr("gopher_stats(text) AS g").collect()(0).getStruct(0)
    assert(astral.getLong(0) == 3 && astral.getLong(1) == 2)
    assert(astral.getLong(2) == 5 && astral.getLong(3) == 0)
  }

  test("gopher_stats + word_grams on a 100-doc seeded random corpus " +
    "(small vocab → dense dup-token/bigram/trigram branches) == twins") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "cc", "dd", "the", "of", "x1", "y2", "zz",
      "word")
    val docs = (1 to 100).map { _ =>
      val n = rnd.nextInt(30)
      (1 to n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val rows = docs.toDF("text")
      .select(col("text"),
        graft.operators.TextQueries.gopherCol(col("text")).as("g"),
        DedupQueries.wordGrams(col("text"), 3).as("w"),
        hofGrams(col("text")).as("h"))
      .collect()
    rows.foreach { r =>
      val exp = gopherRef(r.getString(0))
      val g = r.getStruct(1)
      assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3)) == exp,
        s"gopher mismatch for '${r.getString(0)}'")
      assert(r.getSeq[String](2) == r.getSeq[String](3),
        s"grams mismatch for '${r.getString(0)}'")
    }
  }

  test("word_grams / gopher_stats builders: arity and n >= 1 validated at " +
    "analysis time — and the correct arity works") {
    import spark.implicits._
    Seq("a b c").toDF("t").createOrReplaceTempView("wg")
    val ok = spark.sql(
      "SELECT word_grams(t, 2) AS g, gopher_stats(t).n_tokens AS n FROM wg")
      .collect()(0)
    assert(ok.getSeq[String](0) == Seq("a b", "b c") && ok.getLong(1) == 3L)
    intercept[Exception] {
      spark.sql("SELECT word_grams(t, 0) FROM wg").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT word_grams(t, 1.5) FROM wg").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT gopher_stats(t, 2) FROM wg").collect()
    }
  }
}
