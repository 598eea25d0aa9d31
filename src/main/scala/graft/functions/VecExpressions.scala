package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expressions for the embedding similarity hot path
  * (q24/q25/q26), with `doGenCode` — the vector twin of [[TextKernels]].
  *
  * Why these exist: the higher-order-function formulation
  * (`zip_with` + `aggregate` lambdas) is NOT whole-stage-codegen'd — each
  * element is an interpreted Expression eval with per-element boxing, and
  * the cosine needs THREE such folds per candidate pair (dot + two norms).
  * On the near-dup path every blocked pair pays that; on the ANN paths
  * every candidate does. These kernels run the whole 64-lane loop as one
  * JIT-compiled call inside the surrounding codegen stage.
  *
  * `CosineE4(a, b)` : array<float> × array<float> → floor(cosine·10⁴) as
  *                    long — bit-identical to the HOF pipeline it replaces
  *                    (same double-cast lanes, same index-order summation,
  *                    same `(long) Math.floor` discretization), so the
  *                    DuckDB oracles for q24/q25 stay hash-green.
  * `RhpSig64(v, n)` : array<float> → n-bit random-hyperplane signature —
  *                    bit-identical to the `xxhash64(lit(j), i)`-derived
  *                    HOF signature (VecExpressionsSpec pins both twins).
  *
  * Registered as SQL functions `cosine_e4` / `rhp_sig64` by
  * [[GraftExtensions]].
  */
object VecKernels extends Serializable {

  /** floor(10⁴ · cos(a, b)) with the exact semantics of the HOF twin:
    * per-lane double cast, index-order left-fold sums for the dot product
    * and both squared norms, `sqrt` per norm, then
    * `(long) Math.floor((dot / (na * nb)) * 10000)` — the same grouping
    * Spark's `Floor(Multiply(Divide(...)))` evaluates. Returns NULL
    * (boxed) exactly when the twin does: a ragged pair (`zip_with`
    * null-pads the shorter side → null lane → null fold) or any null
    * element nulls the whole fold.
    */
  def cosineE4(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Long.valueOf(
      Math.floor(dot / (Math.sqrt(na) * Math.sqrt(nb)) * 10000.0).toLong)
  }

  /** Hyperplane lane signs, precomputed once per JVM: lane(j)(i) is the
    * sign Spark's `xxhash64(lit(j), i)` parity assigns — xxhash64 chains
    * children through seed 42, ints hash via `XXH64.hashInt`.
    */
  private lazy val laneSigns: Array[Array[Double]] = {
    Array.tabulate(64) { j =>
      val seedJ = XXH64.hashInt(j, 42L)
      Array.tabulate(64) { i =>
        val h = XXH64.hashInt(i, seedJ)
        if (java.lang.Math.floorMod(h, 2L) == 0L) 1.0 else -1.0
      }
    }
  }

  /** Hyperplane lane sign (j < 64, i < 64) — public so the q26 DuckDB
    * oracle can inline the constant sign table as SQL literals and
    * recompute the bucketing independently (the signs are algorithm
    * constants, like q51's centroids, not data).
    */
  def laneSign(j: Int, i: Int): Double = laneSigns(j)(i)

  /** Lane sign for indices ≥ 64 of an over-long vector: the HOF twin zips
    * them against a NULL sequence element, and `xxhash64` SKIPS null
    * children — so the sign is the parity of hashInt(j, seed) alone, a
    * per-hyperplane constant.
    */
  private lazy val laneSignNullIdx: Array[Double] = Array.tabulate(64) { j =>
    if (java.lang.Math.floorMod(XXH64.hashInt(j, 42L), 2L) == 0L) 1.0 else -1.0
  }

  /** n-bit random-hyperplane signature; bit j set iff the index-order
    * double-fold dot of the vector with hyperplane j is > 0 — the exact
    * semantics of the HOF twin for EVERY input shape: a vector shorter
    * than 64 lanes or containing a null element nulls every fold, and
    * `when(null > 0, …).otherwise(0)` makes every bit 0 → signature 0;
    * lanes beyond 63 contribute with the null-index lane sign. (Sole
    * documented divergence: a NULL vector is NULL here, where the HOF
    * twin's otherwise(0) yields 0 — null-in-null-out is the saner
    * contract.)
    */
  def rhpSig64(v: ArrayData, nBits: Int): Long = {
    val n = v.numElements()
    if (n < 64) return 0L // zip_with pads v with nulls → all folds null
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return 0L // null lane → all folds null
      i += 1
    }
    val lanes = laneSigns
    var sig = 0L
    var j = 0
    while (j < nBits) {
      val lane = lanes(j)
      var d = 0.0
      i = 0
      while (i < 64) {
        d += v.getFloat(i).toDouble * lane(i)
        i += 1
      }
      val cl = laneSignNullIdx(j)
      while (i < n) {
        d += v.getFloat(i).toDouble * cl
        i += 1
      }
      if (d > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  // ---- Product quantization (q55) ----------------------------------------

  val PqSubs = 8 // subvectors of 8 dims each over the 64-dim embedding
  val PqK = 16 // centroids per subvector → 4 bits/code, 32 bits packed

  /** PQ codebook lane: subvector s, centroid k, dim i →
    * (((s·128 + k·8 + i)·2654435761 mod 2003) − 1001) / 1024 — the q51
    * exact-rational family (integer arithmetic + division by 2⁰), so the
    * value is bit-identical in float, double, Spark, and the DuckDB
    * oracle. At real scale the codebook comes from a k-means job persisted
    * beside the corpus; encode/search plans don't change.
    */
  def pqCentroid(s: Int, k: Int, i: Int): Double =
    (((s.toLong * 128 + k * 8 + i) * 2654435761L) % 2003L - 1001L) / 1024.0

  private lazy val pqCodebook: Array[Array[Array[Double]]] =
    Array.tabulate(PqSubs, PqK, 8)(pqCentroid)

  /** PQ encode: per subvector the argmin-L2² centroid (index-order double
    * fold of (x−c)²; ties → smallest k, mirrored by the oracle's
    * row_number ORDER BY d, k), packed 4 bits per subvector into one int-
    * sized long — the 64-dim float vector (256 B) becomes 4 B, the memory
    * story that makes 10^10-vector ANN fit a cluster. NULL for ragged
    * (≠ 64 dims) or null-element vectors.
    */
  def pqCodes(v: ArrayData): java.lang.Long = {
    if (v.numElements() != 64) return null
    var i = 0
    while (i < 64) {
      if (v.isNullAt(i)) return null
      i += 1
    }
    val cb = pqCodebook
    var packed = 0L
    var s = 0
    while (s < PqSubs) {
      var best = 0
      var bestD = Double.MaxValue
      var k = 0
      while (k < PqK) {
        val c = cb(s)(k)
        var d = 0.0
        i = 0
        while (i < 8) {
          val x = v.getFloat(s * 8 + i).toDouble - c(i)
          d += x * x
          i += 1
        }
        if (d < bestD) { bestD = d; best = k }
        k += 1
      }
      packed |= best.toLong << (4 * s)
      s += 1
    }
    java.lang.Long.valueOf(packed)
  }

  /** Asymmetric PQ score: floor(10⁴ · cos(reconstruction(codes), q)) with
    * the [[cosineE4]] fold discipline (index-order double sums, same
    * grouping and floor). The reconstruction never materializes an array —
    * the 64-lane loop reads codebook doubles straight from the packed
    * codes. NULL for ragged/null-element q (the cosineE4 contract).
    */
  def pqCosE4(codes: Long, q: ArrayData): java.lang.Long = {
    if (q.numElements() != 64) return null
    val cb = pqCodebook
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < 64) {
      if (q.isNullAt(i)) return null
      val c = cb(i / 8)(((codes >> (4 * (i / 8))) & 15L).toInt)(i % 8)
      val y = q.getFloat(i).toDouble
      dot += c * y
      na += c * c
      nb += y * y
      i += 1
    }
    java.lang.Long.valueOf(
      Math.floor(dot / (Math.sqrt(na) * Math.sqrt(nb)) * 10000.0).toLong)
  }
}

final case class CosineE4(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  // nullable beyond child nullability: ragged pairs and null ELEMENTS
  // also produce null (the HOF-twin semantics), so ev.isNull must be a
  // real variable even over non-null array columns
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "cosine_e4 requires two array<float> arguments")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.cosineE4(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("cosE4")
      s"""
         |java.lang.Long $tmp = graft.functions.VecKernels.cosineE4($a, $b);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.longValue();
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineE4 = copy(left = newLeft, right = newRight)
  override def prettyName: String = "cosine_e4"
}

final case class PqCodes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  // null beyond child nullability: ragged / null-element vectors
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure("pq_codes requires array<float>")
  }
  override def nullSafeEval(input: Any): Any =
    VecKernels.pqCodes(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("pqCodes")
      s"""
         |java.lang.Long $tmp = graft.functions.VecKernels.pqCodes($c);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.longValue();
         |}
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
  override def prettyName: String = "pq_codes"
}

final case class PqCosE4(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "pq_cos_e4 requires (bigint codes, array<float> query)")
    }
  override def nullSafeEval(codes: Any, q: Any): Any =
    VecKernels.pqCosE4(codes.asInstanceOf[Long], q.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, q) => {
      val tmp = ctx.freshName("pqCos")
      s"""
         |java.lang.Long $tmp = graft.functions.VecKernels.pqCosE4($c, $q);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.longValue();
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqCosE4 = copy(left = newLeft, right = newRight)
  override def prettyName: String = "pq_cos_e4"
}

final case class RhpSig64(child: Expression, nBits: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if nBits < 1 || nBits > 64 =>
      TypeCheckResult.TypeCheckFailure(
        s"rhp_sig64 requires 1 <= nBits <= 64 (got $nBits)")
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure("rhp_sig64 requires array<float>")
  }
  override def nullSafeEval(input: Any): Any =
    VecKernels.rhpSig64(input.asInstanceOf[ArrayData], nBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VecKernels.rhpSig64($c, $nBits)")
  override protected def withNewChildInternal(newChild: Expression): RhpSig64 =
    copy(child = newChild)
  override def prettyName: String = "rhp_sig64"
}
