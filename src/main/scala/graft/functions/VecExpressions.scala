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
