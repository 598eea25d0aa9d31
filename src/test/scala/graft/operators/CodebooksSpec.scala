package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Invariants of the deterministic Lloyd codebook training (q51/q52/q55):
  * exact-rational init, partition-order independence of the quantized mean
  * updates, empty-cell retention, and that training actually buys
  * quantization quality on the real table (the recall story's substrate).
  */
class CodebooksSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("codebooks-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val real = "/root/testdata/sf0.001"

  test("IVF init centroids are the exact-rational family: numerator " +
    "in [-1001, 1001], denominator 2^10, float-exact") {
    (0 until Codebooks.IvfCells).foreach { j =>
      val c = Codebooks.ivfInitCentroid(j)
      assert(c.length == 64)
      c.zipWithIndex.foreach { case (x, i) =>
        val num = (j.toLong * 64 + i) * 2654435761L % 2003L - 1001L
        assert(x.toDouble == num / 1024.0, s"lane ($j,$i)")
        // exactly representable: scaling by 2^10 recovers the integer
        assert(x.toDouble * 1024.0 == num.toDouble)
      }
    }
  }

  test("trainIvf is partition-layout independent: the quantized-BIGINT " +
    "mean updates give bit-identical centroids at 3 vs 13 partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (0 until 300)
      .map(_ => Seq.fill(64)((rnd.nextDouble() * 2 - 1).toFloat))
      .map(Tuple1(_))
    val df = rows.toDF("embedding")
    val a = Codebooks.trainIvf(df.repartition(3))
    val b = Codebooks.trainIvf(df.repartition(13))
    assert(a.length == Codebooks.IvfCells)
    (a zip b).zipWithIndex.foreach { case ((ca, cb), j) =>
      assert(ca.toSeq == cb.toSeq, s"cell $j diverged across layouts")
    }
  }

  test("cells that receive no vectors keep their init centroid; a voted " +
    "cell becomes the float-rounded quantized mean of its members") {
    import spark.implicits._
    // every vector is a positive multiple of init centroid 5 → cosine 1.0
    // to cell 5 (strictly less to every other init centroid), so cell 5
    // gets ALL the votes and every other cell gets none
    val c5 = Codebooks.ivfInitCentroid(5)
    val scales = Seq(1.0f, 2.0f, 3.5f)
    val df = scales.map(s => Tuple1(c5.map(_ * s).toSeq)).toDF("embedding")
      .repartition(2)
    val trained = Codebooks.trainIvf(df)
    (0 until Codebooks.IvfCells).filter(_ != 5).foreach { j =>
      assert(trained(j).toSeq == Codebooks.ivfInitCentroid(j).toSeq,
        s"empty cell $j drifted from its init centroid")
    }
    // independent recompute of the update arithmetic for the voted cell
    val expect = Array.tabulate(64) { i =>
      val qsum = scales.map(s =>
        math.floor((c5(i) * s).toDouble * Codebooks.LaneScale).toLong).sum
      (qsum.toDouble / (scales.length * Codebooks.LaneScale)).toFloat
    }
    assert(trained(5).toSeq == expect.toSeq)
  }

  test("training is memoized per table dir: repeated lookups return the " +
    "same codebook instance") {
    assert(Codebooks.ivf(spark, real) eq Codebooks.ivf(spark, real))
    assert(Codebooks.pq(spark, real) eq Codebooks.pq(spark, real))
  }

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    (0 until 64).foreach { i =>
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("Lloyd training improves IVF quantization on the real table: mean " +
    "best-cell cosine strictly above the init codebook's") {
    val vecs = spark.read.parquet(s"$real/embeddings.parquet")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    val init = Array.tabulate(Codebooks.IvfCells)(Codebooks.ivfInitCentroid)
    val trained = Codebooks.ivf(spark, real)
    def meanBest(cents: Array[Array[Float]]): Double =
      vecs.map(v => cents.map(c => cosine(v, c)).max).sum / vecs.length
    val (mi, mt) = (meanBest(init), meanBest(trained))
    assert(mt > mi + 0.05, f"trained $mt%.4f vs init $mi%.4f")
  }

  test("Lloyd training lowers PQ reconstruction error on the real table") {
    import graft.functions.VecKernels._
    val vecs = spark.read.parquet(s"$real/embeddings.parquet")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    def mse(cb: Array[Double]): Double = vecs.map { v =>
      var err = 0.0
      (0 until PqSubs).foreach { s =>
        // same argmin-L2² encode rule as the kernel, independent loop
        val best = (0 until PqK).minBy { k =>
          (0 until PqSubDim).map { i =>
            val d = v(s * PqSubDim + i).toDouble -
              cb((s * PqK + k) * PqSubDim + i)
            d * d
          }.sum
        }
        (0 until PqSubDim).foreach { i =>
          val d = v(s * PqSubDim + i).toDouble -
            cb((s * PqK + best) * PqSubDim + i)
          err += d * d
        }
      }
      err
    }.sum / vecs.length
    val (ei, et) = (mse(pqInitCodebook), mse(Codebooks.pq(spark, real)))
    assert(et < ei * 0.9, f"trained $et%.4f vs init $ei%.4f")
  }
}
