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
    * (boxed) when the twin does — a ragged pair (`zip_with` null-pads
    * the shorter side → null lane → null fold) or any null element —
    * AND when the cosine is UNDEFINED: a NaN/±Inf lane or a zero-norm
    * side makes the ratio non-finite, and `Math.floor(NaN).toLong`
    * would otherwise smuggle it out as score 0, a real-looking value
    * the DuckDB oracle cannot even cast (NaN::BIGINT errors). No
    * direction → no cosine → null, uniformly filtered by every
    * candidate path's isNotNull guard.
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
    val c = dot / (Math.sqrt(na) * Math.sqrt(nb)) * 10000.0
    if (java.lang.Double.isNaN(c) || java.lang.Double.isInfinite(c)) null
    else java.lang.Long.valueOf(Math.floor(c).toLong)
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

  val PqSubs = 16 // subvectors of 4 dims each over the 64-dim embedding
  val PqSubDim = 4 // dims per subvector
  val PqK = 16 // centroids per subvector → 4 bits/code, 64 bits packed

  /** PQ INIT codebook lane: subvector s, centroid k, dim i →
    * (((s·128 + k·8 + i)·2654435761 mod 2003) − 1001) / 1024 — the q51
    * exact-rational family (integer arithmetic + division by 2¹⁰), so the
    * value is bit-identical in float, double, Spark, and the DuckDB
    * oracle. This is the deterministic Lloyd INIT (see
    * [[graft.operators.Codebooks]]); queries encode with the trained
    * codebook, which both engines re-derive from the same raw table.
    */
  def pqCentroid(s: Int, k: Int, i: Int): Double =
    (((s.toLong * 128 + k * 8 + i) * 2654435761L) % 2003L - 1001L) / 1024.0

  /** Flattened init codebook, index (s·PqK + k)·PqSubDim + i — the layout
    * every `cb` parameter below expects.
    */
  def pqInitCodebook: Array[Double] =
    Array.tabulate(PqSubs * PqK * PqSubDim) { idx =>
      val i = idx % PqSubDim
      val k = idx / PqSubDim % PqK
      val s = idx / (PqSubDim * PqK)
      pqCentroid(s, k, i)
    }

  /** PQ encode against codebook `cb` (flattened [[pqInitCodebook]]
    * layout): per subvector the argmin-L2² centroid (index-order double
    * fold of (x−c)²; ties → smallest k, mirrored by the oracle's
    * row_number ORDER BY d, k), packed 4 bits per subvector into one
    * long — 16 subvectors × 4 bits fill all 64 bits, and the 64-dim float
    * vector (256 B) becomes 8 B, the memory story that makes 10^10-vector
    * ANN fit a cluster. NULL for ragged (≠ 64 dims) or null-element
    * vectors.
    */
  def pqCodes(v: ArrayData, cb: Array[Double]): java.lang.Long = {
    if (v.numElements() != 64) return null
    var i = 0
    var allZero = true
    while (i < 64) {
      // non-finite lanes make every subvector distance NaN — the argmin
      // would be comparison-order noise; and the zero vector, while
      // L2-encodable, has no direction: every cosine it participates in
      // is null, so admitting it to the code table (or its votes to the
      // codebook) would give the index a citizen no query can ever
      // retrieve — the validity rule is cosineE4's, uniformly
      if (v.isNullAt(i)) return null
      val f = v.getFloat(i)
      if (java.lang.Float.isNaN(f) || java.lang.Float.isInfinite(f))
        return null
      if (f != 0.0f) allZero = false
      i += 1
    }
    if (allZero) return null
    var packed = 0L
    var s = 0
    while (s < PqSubs) {
      var best = 0
      var bestD = Double.MaxValue
      var k = 0
      while (k < PqK) {
        val base = (s * PqK + k) * PqSubDim
        var d = 0.0
        i = 0
        while (i < PqSubDim) {
          val x = v.getFloat(s * PqSubDim + i).toDouble - cb(base + i)
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

  /** Asymmetric PQ score against codebook `cb`: floor(10⁴ ·
    * cos(reconstruction(codes), q)) with the [[cosineE4]] fold discipline
    * (index-order double sums, same grouping and floor). The
    * reconstruction never materializes an array — the 64-lane loop reads
    * codebook doubles straight from the packed codes (arithmetic `>>`
    * then `& 15` is sign-safe even for subvector 15 in the top bits).
    * NULL for ragged/null-element q (the cosineE4 contract).
    */
  def pqCosE4(codes: Long, q: ArrayData, cb: Array[Double]): java.lang.Long = {
    if (q.numElements() != 64) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < 64) {
      if (q.isNullAt(i)) return null
      val s = i / PqSubDim
      val k = ((codes >> (4 * s)) & 15L).toInt
      val c = cb((s * PqK + k) * PqSubDim + i % PqSubDim)
      val y = q.getFloat(i).toDouble
      dot += c * y
      na += c * c
      nb += y * y
      i += 1
    }
    // undefined reconstruction cosine (NaN/Inf query lane, zero-norm
    // side) → null, as in [[cosineE4]]
    val r = dot / (Math.sqrt(na) * Math.sqrt(nb)) * 10000.0
    if (java.lang.Double.isNaN(r) || java.lang.Double.isInfinite(r)) null
    else java.lang.Long.valueOf(Math.floor(r).toLong)
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

/** PQ encode. `codebook` is a flattened [[VecKernels.pqInitCodebook]]-layout
  * constant (a `Seq` so expression equality/canonicalization stays
  * structural); it defaults to the deterministic Lloyd INIT codebook, which
  * is what the SQL surface registration exposes — the q55 query path passes
  * the [[graft.operators.Codebooks]]-trained one.
  */
final case class PqCodes(child: Expression,
    codebook: Seq[Double] = VecKernels.pqInitCodebook.toSeq)
    extends UnaryExpression {
  @transient private lazy val cbArr: Array[Double] = codebook.toArray
  override def dataType: DataType = LongType
  // null beyond child nullability: ragged / null-element vectors
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if codebook.length !=
        VecKernels.PqSubs * VecKernels.PqK * VecKernels.PqSubDim =>
      TypeCheckResult.TypeCheckFailure(
        s"pq_codes codebook must have ${VecKernels.PqSubs}x${VecKernels.PqK}" +
          s"x${VecKernels.PqSubDim} entries (got ${codebook.length})")
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure("pq_codes requires array<float>")
  }
  override def nullSafeEval(input: Any): Any =
    VecKernels.pqCodes(input.asInstanceOf[ArrayData], cbArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cbArr, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("pqCodes")
      s"""
         |java.lang.Long $tmp = graft.functions.VecKernels.pqCodes($c, $cbRef);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.longValue();
         |}
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
  override def prettyName: String = "pq_codes"
}

/** Asymmetric PQ score; `codebook` as in [[PqCodes]] — the two MUST be the
  * same array for the reconstruction to mean anything.
  */
final case class PqCosE4(left: Expression, right: Expression,
    codebook: Seq[Double] = VecKernels.pqInitCodebook.toSeq)
    extends BinaryExpression {
  @transient private lazy val cbArr: Array[Double] = codebook.toArray
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case _ if codebook.length !=
          VecKernels.PqSubs * VecKernels.PqK * VecKernels.PqSubDim =>
        TypeCheckResult.TypeCheckFailure(
          s"pq_cos_e4 codebook must have ${VecKernels.PqSubs}x" +
            s"${VecKernels.PqK}x${VecKernels.PqSubDim} entries " +
            s"(got ${codebook.length})")
      case (LongType, ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "pq_cos_e4 requires (bigint codes, array<float> query)")
    }
  override def nullSafeEval(codes: Any, q: Any): Any =
    VecKernels.pqCosE4(codes.asInstanceOf[Long], q.asInstanceOf[ArrayData],
      cbArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cbArr, "double[]")
    nullSafeCodeGen(ctx, ev, (c, q) => {
      val tmp = ctx.freshName("pqCos")
      s"""
         |java.lang.Long $tmp =
         |  graft.functions.VecKernels.pqCosE4($c, $q, $cbRef);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.longValue();
         |}
       """.stripMargin
    })
  }
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
