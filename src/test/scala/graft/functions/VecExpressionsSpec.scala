package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SimilarityQueries

/** The vector kernels must be bit-identical to the interpreted HOF twins
  * they replace (the q24/q25 DuckDB oracles mirror the HOF fold order),
  * survive nulls, and run inside whole-stage codegen.
  */
class VecExpressionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]").appName("vecexpr-spec")
    .withExtensions(new GraftExtensions)
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  val dir = "/root/testdata/sf0.001"
  def emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("cosine_e4 kernel == floor(HOF cosine * 1e4) on every (vec, query) " +
    "pair — bit-identical fold order") {
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("q"))
    val rows = emb.crossJoin(broadcast(q))
      .select(col("vec_id"),
        SimilarityQueries.cosE4(col("embedding"), col("q")).as("kern"),
        floor(SimilarityQueries.cosine(col("embedding"), col("q")) * 10000)
          .cast("long").as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"cosine mismatch for vec ${r.get(0)}: kern=${r.get(1)} hof=${r.get(2)}"))
  }

  test("cosine_e4 kernel == HOF on within-label pairs (the q24 shape)") {
    val a = emb.select(col("label"), col("vec_id").as("va"),
      col("embedding").as("ea"))
    val b = emb.select(col("label"), col("vec_id").as("vb"),
      col("embedding").as("eb"))
    val rows = a.join(b, "label").filter(col("va") < col("vb")).limit(2000)
      .select(
        SimilarityQueries.cosE4(col("ea"), col("eb")).as("kern"),
        floor(SimilarityQueries.cosine(col("ea"), col("eb")) * 10000)
          .cast("long").as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("rhp_sig64 kernel == the xxhash64-derived HOF signature, all vectors") {
    val rows = emb.select(
        SimilarityQueries.rhpSigCol(col("embedding")).as("kern"),
        SimilarityQueries.rhpSignature(col("embedding")).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("edge shapes match the HOF twins: ragged pair and null ELEMENT → " +
    "null cosine; short vector / null element → signature 0") {
    import spark.implicits._
    val pairs = Seq(
      (1, Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f)), // ragged
      (2, Array(1.0f, 2.0f), Array(1.0f, 2.0f))) // clean
      .toDF("id", "a", "b").repartition(2)
    val r = pairs
      .select(col("id"), SimilarityQueries.cosE4(col("a"), col("b")).as("k"),
        floor(SimilarityQueries.cosine(col("a"), col("b")) * 10000)
          .cast("long").as("h"))
      .orderBy("id").collect()
    assert(r(0).isNullAt(1) && r(0).isNullAt(2)) // ragged: both null
    assert(!r(1).isNullAt(1) && r(1).getLong(1) == r(1).getLong(2))

    // null ELEMENT: HOF nulls the fold → kernel must too
    val withNullElem = spark.sql(
      """SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS a,
        |       array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)) AS b""".stripMargin)
    val rn = withNullElem
      .select(SimilarityQueries.cosE4(col("a"), col("b")).as("k"),
        floor(SimilarityQueries.cosine(col("a"), col("b")) * 10000)
          .cast("long").as("h")).collect()(0)
    assert(rn.isNullAt(0) && rn.isNullAt(1))

    // rhp: a vector shorter than 64 lanes nulls every HOF fold →
    // when(null > 0).otherwise(0) → signature 0; kernel must agree
    val short = Seq((1, Array(1.0f, -2.0f))).toDF("id", "v").repartition(2)
    val rs = short.select(
      SimilarityQueries.rhpSigCol(col("v")).as("k"),
      SimilarityQueries.rhpSignature(col("v")).as("h")).collect()(0)
    assert(rs.getLong(0) == 0L && rs.getLong(0) == rs.getLong(1))
  }

  /** Transparent driver-side PQ encode: idiomatic minBy over the public
    * exact-rational codebook — a different code path from the kernel's
    * packed while-loops.
    */
  private def pqRef(v: Seq[Float], cb: Array[Double]): Long = {
    import VecKernels.{PqSubDim, PqK}
    (0 until VecKernels.PqSubs).map { s =>
      val code = (0 until PqK).minBy { k =>
        // minBy keeps the FIRST minimum — the kernel's d < bestD tiebreak
        var d = 0.0
        (0 until PqSubDim).foreach { i =>
          val x = v(s * PqSubDim + i).toDouble -
            cb((s * PqK + k) * PqSubDim + i)
          d += x * x
        }
        d
      }
      code.toLong << (4 * s)
    }.reduce(_ | _)
  }

  /** Reconstruction cosine twin via the flattened codebook + the cosineE4
    * fold discipline.
    */
  private def pqCosRef(codes: Long, q: Seq[Float], cb: Array[Double]): Long = {
    import VecKernels.{PqSubDim, PqK}
    var dot = 0.0; var na = 0.0; var nb = 0.0
    (0 until 64).foreach { i =>
      val s = i / PqSubDim
      val k = ((codes >> (4 * s)) & 15L).toInt
      val c = cb((s * PqK + k) * PqSubDim + i % PqSubDim)
      val y = q(i).toDouble
      dot += c * y; na += c * c; nb += y * y
    }
    math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 10000.0).toLong
  }

  test("pq_codes / pq_cos_e4 == transparent driver recomputation on every " +
    "real vector, for the init codebook AND an arbitrary custom one " +
    "(the trained-codebook path)") {
    import spark.implicits._
    // a second codebook distinct from the init one, to pin that the
    // kernels really score against the codebook they were HANDED
    val cb2 = VecKernels.pqInitCodebook.map(x => x * 0.5 + 0.125)
    for (cb <- Seq(VecKernels.pqInitCodebook, cb2)) {
      val rows = emb
        .select(col("vec_id"),
          SimilarityQueries.pqCodesCol(col("embedding"), cb).as("codes"),
          col("embedding"))
        .as[(Long, Long, Seq[Float])].collect()
      assert(rows.nonEmpty)
      val q = rows.find(_._1 == 0L).get._3
      val adc = emb
        .select(col("vec_id"), SimilarityQueries.pqCosCol(
          SimilarityQueries.pqCodesCol(col("embedding"), cb),
          typedlit(q), cb).as("adc"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      rows.foreach { case (id, codes, v) =>
        assert(codes == pqRef(v, cb), s"pq_codes mismatch for vec $id")
        assert(adc(id) == pqCosRef(codes, q, cb),
          s"pq_cos mismatch for vec $id")
      }
    }
  }

  test("pq kernels: null vector → null; ragged vector / query → null") {
    import spark.implicits._
    val df = Seq((1, Array(1.0f, 2.0f)), (2, null.asInstanceOf[Array[Float]]))
      .toDF("id", "v")
    val r = df.select(SimilarityQueries.pqCodesCol(col("v")),
        SimilarityQueries.pqCosCol(lit(0L), col("v")))
      .orderBy(col("id")).collect()
    assert(r(0).isNullAt(0) && r(0).isNullAt(1)) // 2-dim: ragged → null
    assert(r(1).isNullAt(0) && r(1).isNullAt(1)) // null vector
  }

  test("undefined cosine is NULL, never a fake score: a NaN/Inf lane or a " +
    "zero-norm side nulls cosE4 / pqCodes / pqCosE4 (a naive " +
    "floor(NaN).toLong would smuggle it out as a real-looking 0), and " +
    "validVec mirrors the kernel validity rule exactly") {
    import spark.implicits._
    val nanv = Array.tabulate(64)(i => if (i == 3) Float.NaN else i.toFloat)
    val infv = Array.tabulate(64)(i =>
      if (i == 5) Float.PositiveInfinity else i.toFloat)
    val zero = Array.fill(64)(0.0f)
    val clean = Array.tabulate(64)(i => (i + 1).toFloat)
    val df = Seq((1, nanv), (2, infv), (3, zero), (4, clean))
      .toDF("id", "v").repartition(2)
    val r = df.select(col("id"),
        SimilarityQueries.cosE4(col("v"), typedlit(clean.toSeq)).as("cos"),
        SimilarityQueries.pqCodesCol(col("v")).as("codes"),
        SimilarityQueries.pqCosCol(lit(0L), col("v")).as("adc"))
      .orderBy("id").collect()
    (0 to 2).foreach { i =>
      assert(r(i).isNullAt(1), s"cos should be null for id=${r(i).getInt(0)}")
      assert(r(i).isNullAt(2), s"codes should be null for id=${r(i).getInt(0)}")
      assert(r(i).isNullAt(3), s"adc should be null for id=${r(i).getInt(0)}")
    }
    assert(!r(3).isNullAt(1) && !r(3).isNullAt(2) && !r(3).isNullAt(3))
    val vv = df.select(col("id"), SimilarityQueries.validVec(col("v")))
      .orderBy("id").collect().map(_.getBoolean(1)).toSeq
    assert(vv == Seq(false, false, false, true))
  }

  test("SQL surface: pq_codes / pq_cos_e4 registered and callable") {
    emb.createOrReplaceTempView("epq")
    val r = spark.sql(
      """SELECT pq_cos_e4(pq_codes(embedding), embedding) AS a
        |FROM epq WHERE vec_id = 0""".stripMargin).collect()(0)
    // reconstruction of v scored against v itself: positive but below 1e4
    assert(!r.isNullAt(0) && r.getLong(0) > 0 && r.getLong(0) <= 10000)
  }

  test("pq codebook contract: the SQL pair is init-codebook on BOTH sides " +
    "(≡ the DataFrame init path), and MIXING surfaces — codes from a " +
    "trained-style codebook scored by SQL pq_cos_e4 — visibly mismatches " +
    "(the hazard the GraftExtensions scaladoc forbids)") {
    import spark.implicits._
    emb.createOrReplaceTempView("epqc")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).as[Seq[Float]].collect()(0)
    // SQL pair ≡ DataFrame init-codebook pair, row for row
    val viaSql = spark.sql(
      """SELECT vec_id, pq_cos_e4(pq_codes(embedding),
        |  (SELECT embedding FROM epqc WHERE vec_id = 0)) AS adc
        |FROM epqc""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDf = emb.select(col("vec_id"),
        SimilarityQueries.pqCosCol(
          SimilarityQueries.pqCodesCol(col("embedding")), typedlit(q))
          .as("adc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaDf)
    // cross-surface mixing: encode with a DIFFERENT (trained-style)
    // codebook, score through the init-codebook SQL kernel → wrong
    val cb2 = VecKernels.pqInitCodebook.map(x => x * 0.5 + 0.125)
    val mixed = emb.select(col("vec_id"),
        SimilarityQueries.pqCosCol(
          SimilarityQueries.pqCodesCol(col("embedding"), cb2), typedlit(q))
          .as("adc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val consistent = emb.select(col("vec_id"),
        SimilarityQueries.pqCosCol(
          SimilarityQueries.pqCodesCol(col("embedding"), cb2), typedlit(q),
          cb2).as("adc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mixed != consistent,
      "mixed-surface scores should differ from the consistent pairing")
  }

  test("SQL builders reject wrong arity at analysis time (named error, " +
    "not IndexOutOfBounds) — and accept the correct arity") {
    emb.createOrReplaceTempView("e3")
    // positive direction first: a builder regression (or a dropped
    // registration) must fail HERE, not hide behind the intercepts below
    val ok = spark.sql(
      "SELECT cosine_e4(embedding, embedding) AS c, simhash64('a b') AS s " +
        "FROM e3 WHERE vec_id = 0").collect()(0)
    assert(ok.getLong(0) == 10000L && !ok.isNullAt(1))
    val ex = intercept[Exception] {
      spark.sql("SELECT cosine_e4(embedding) FROM e3").collect()
    }
    assert(ex.getMessage.contains("cosine_e4"))
    val ex2 = intercept[Exception] {
      spark.sql("SELECT simhash64('a', 'b') FROM e3").collect()
    }
    assert(ex2.getMessage.contains("simhash64"))
  }

  test("null vector → null result (both kernels)") {
    import spark.implicits._
    val df = Seq((1, Array(1.0f, 2.0f)), (2, null.asInstanceOf[Array[Float]]))
      .toDF("id", "v")
    val r = df.select(SimilarityQueries.cosE4(col("v"), col("v")),
      SimilarityQueries.rhpSigCol(col("v"), 4)).orderBy(col("id")).collect()
    assert(!r(0).isNullAt(0) && !r(0).isNullAt(1))
    assert(r(1).isNullAt(0) && r(1).isNullAt(1))
  }

  test("SQL surface: cosine_e4 / rhp_sig64 registered and callable") {
    emb.createOrReplaceTempView("e")
    val r = spark.sql(
      """SELECT cosine_e4(embedding, embedding) AS c,
        |       rhp_sig64(embedding) AS s FROM e WHERE vec_id = 0""".stripMargin)
      .collect()(0)
    assert(r.getLong(0) == 10000L) // cos(v, v) = 1
    assert(!r.isNullAt(1))
  }

  test("kernels stay inside whole-stage codegen — no interpreted lambda in " +
    "the plan") {
    val df = emb.select(
      SimilarityQueries.cosE4(col("embedding"), col("embedding")),
      SimilarityQueries.rhpSigCol(col("embedding")))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), s"no codegen span in:\n$p")
    assert(!p.contains("lambdafunction"), s"interpreted HOF in:\n$p")
    assert(!p.contains("ScalaUDF"))
  }

  test("analysis-time validation: rhp_sig64 rejects nBits out of range; " +
    "fractional literal params are rejected, not truncated") {
    emb.createOrReplaceTempView("e2")
    intercept[Exception] {
      spark.sql("SELECT rhp_sig64(embedding, 65) FROM e2").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT rhp_sig64(embedding, 2.9) FROM e2").collect()
    }
    intercept[Exception] { // word_shingles n >= 1 (ADVICE: AIOOBE at eval)
      spark.sql("SELECT word_shingles('a b c', 0) FROM e2").collect()
    }
  }
}
