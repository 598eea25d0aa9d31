package graft.functions

import java.util.regex.Pattern
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup hot path, with `doGenCode`.
  *
  * Why these exist: the higher-order-function formulation
  * (`transform`/`array_min`/`aggregate`) is NOT whole-stage-codegen'd —
  * each lambda element is interpreted Expression eval with per-element
  * boxing, and projection collapse re-inlines an expensive sub-expression
  * (the minhash signature) into every consumer. Measured on this box:
  * banding 5 000 docs took 88 s interpreted vs < 1 s through these
  * kernels. At 10^10 documents the kernels are the difference between a
  * map stage and a cluster-week.
  *
  * `WordShingles(text, n)`     : string → distinct word n-grams, document
  *                               order (same semantics as the HOF pipeline
  *                               it replaces, mirrored in the q21 oracle:
  *                               trim-spaces → lower → split \s+ → joined
  *                               n-grams → first-occurrence distinct)
  * `MinhashBands(sh, k, bands)`: shingle set → `bands` LSH band hashes of
  *                               a k-slot minhash signature, one pass
  * `SimHash64(text)`           : string → 64-bit SimHash (bitwise majority
  *                               vote over token xxhash64s, seed 42 — the
  *                               exact semantics of the Scala UDF this
  *                               codegen expression supersedes)
  *
  * `WordGrams(text, n)`        : string → ordered NON-distinct word
  *                               n-grams (element i = gram at position i,
  *                               for positional posexplode)
  * `GopherStats(text)`         : string → within-document repetition
  *                               stats struct, one pass (see
  *                               [[TextKernels.gopherStats]])
  *
  * Registered as SQL functions `word_shingles` / `minhash_bands` /
  * `simhash64` / `word_grams` / `gopher_stats` by [[GraftExtensions]].
  */
object TextKernels extends Serializable {
  private val Ws = Pattern.compile("\\s+")

  /** Spark's `trim` strips 0x20 only (not Java's <= 0x20) — replicated so
    * the expression matches the HOF pipeline and DuckDB `trim` bit-for-bit.
    */
  private def trimSpaces(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && s.charAt(i) == ' ') i += 1
    while (j > i && s.charAt(j - 1) == ' ') j -= 1
    s.substring(i, j)
  }

  // lower() FIRST via UTF8String.toLowerCase — the exact code path of
  // Spark's Lower expression, so non-ASCII case folding (İ, ß, …) matches
  // the HOF pipeline and the q21 oracle bit-for-bit (Java's
  // String.toLowerCase(Locale.ROOT) diverges on those)
  private def words(text: UTF8String): Array[String] =
    Ws.split(trimSpaces(text.toLowerCase.toString))

  def shingles(text: UTF8String, n: Int): ArrayData = {
    val ws = words(text)
    if (ws.length < n) return new GenericArrayData(Array.empty[Any])
    // LinkedHashSet = array_distinct's keep-first-occurrence order
    val seen = new java.util.LinkedHashSet[String]
    var i = 0
    while (i + n <= ws.length) {
      val sb = new java.lang.StringBuilder(ws(i))
      var m = 1
      while (m < n) { sb.append(' ').append(ws(i + m)); m += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = UTF8String.fromString(it.next()); p += 1 }
    new GenericArrayData(out)
  }

  /** k-slot minhash → per-band hash, single pass over the shingle set.
    * Slot hashes use the Kirsch–Mitzenmacher construction (two real
    * xxhash64 evaluations per shingle, slot j = h1 + j·h2) instead of k
    * independent string hashes — 16× fewer hash evaluations at minhash
    * quality indistinguishable for banding purposes. Band hash chains the
    * r slot minima through xxhash64 with the band index as seed.
    */
  def minhashBands(sh: ArrayData, k: Int, bands: Int): ArrayData = {
    val n = sh.numElements()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val u = sh.getUTF8String(i)
      val h1 = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 0L)
      val h2 = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 1L) | 1L
      var j = 0
      var h = h1
      while (j < k) {
        if (h < mins(j)) mins(j) = h
        h += h2
        j += 1
      }
      i += 1
    }
    val r = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = XXH64.hashInt(b, 42L)
      var q = 0
      while (q < r) { acc = XXH64.hashLong(mins(b * r + q), acc); q += 1 }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Ordered, NON-distinct word n-grams (the positional companion of
    * [[shingles]]): element i is the n-gram starting at token i, so
    * `posexplode` over the result yields (position, gram) pairs — the
    * input to cross-document duplicated-span coverage (q31). Empty for
    * docs shorter than n tokens.
    */
  def wordGrams(text: UTF8String, n: Int): ArrayData = {
    val ws = words(text)
    if (ws.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](ws.length - n + 1)
    var i = 0
    while (i + n <= ws.length) {
      val sb = new java.lang.StringBuilder(ws(i))
      var m = 1
      while (m < n) { sb.append(' ').append(ws(i + m)); m += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  private def bump(m: java.util.HashMap[String, Integer], k: String): Unit = {
    val old = m.get(k)
    m.put(k, if (old == null) 1 else old + 1)
  }

  /** Within-document repetition statistics (the Gopher-rules family of
    * webtext quality signals — Rae et al. 2021 §A1.1, adapted to
    * newline-free text) in ONE pass over the row, zero shuffle:
    *
    *   n_tokens             : token count (trim-spaces → lower → split \s+,
    *                          the same tokenization as [[shingles]])
    *   dup_token_positions  : positions whose token occurs ≥ 2 times in
    *                          the document ("fraction of duplicate tokens")
    *   top_bigram_score     : max over bigrams of occurrences × bigram
    *                          codepoint length ("characters in the most
    *                          frequent 2-gram"); 0 below 2 tokens
    *   dup_trigram_coverage : token positions covered by ≥ 1 trigram that
    *                          occurs ≥ 2 times in the document (position
    *                          UNION, the Gopher "characters in duplicated
    *                          n-grams" shape); 0 below 3 tokens
    *
    * All-integer outputs so the DuckDB oracle (q30) compares exactly. The
    * explode + re-group formulation of these stats shuffles every token
    * occurrence of the corpus — at 100 TB that is a full-corpus shuffle
    * for a statistic that never leaves its row; this kernel keeps it a
    * map-only scan.
    */
  def gopherStats(text: UTF8String): InternalRow = {
    val ws = words(text)
    val n = ws.length
    val tc = new java.util.HashMap[String, Integer](n * 2)
    var i = 0
    while (i < n) { bump(tc, ws(i)); i += 1 }
    var dupTok = 0L
    i = 0
    while (i < n) { if (tc.get(ws(i)) >= 2) dupTok += 1; i += 1 }
    var topBi = 0L
    if (n >= 2) {
      val bc = new java.util.HashMap[String, Integer](n * 2)
      i = 0
      while (i + 2 <= n) { bump(bc, ws(i) + " " + ws(i + 1)); i += 1 }
      val it = bc.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        // codepoint length = Spark length() = DuckDB length() (NOT Java's
        // UTF-16 unit count, which diverges on astral-plane chars)
        val score = e.getValue.toLong *
          e.getKey.codePointCount(0, e.getKey.length)
        if (score > topBi) topBi = score
      }
    }
    var cov = 0L
    if (n >= 3) {
      val gc = new java.util.HashMap[String, Integer](n * 2)
      val grams = new Array[String](n - 2)
      i = 0
      while (i + 3 <= n) {
        val g = ws(i) + " " + ws(i + 1) + " " + ws(i + 2)
        grams(i) = g
        bump(gc, g)
        i += 1
      }
      val covered = new Array[Boolean](n)
      i = 0
      while (i < grams.length) {
        if (gc.get(grams(i)) >= 2) {
          covered(i) = true; covered(i + 1) = true; covered(i + 2) = true
        }
        i += 1
      }
      i = 0
      while (i < n) { if (covered(i)) cov += 1; i += 1 }
    }
    new GenericInternalRow(Array[Any](n.toLong, dupTok, topBi, cov))
  }

  def simhash64(text: UTF8String): Long = {
    val votes = new Array[Int](64)
    // Java-trim (strips <= 0x20) — byte-identical to the Scala UDF this
    // kernel supersedes (DedupQueries.simhashUdf), pinned by spec
    val toks = Ws.split(text.toString.trim.toLowerCase)
    var t = 0
    while (t < toks.length) {
      val u = UTF8String.fromString(toks(t))
      val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      t += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }
}

final case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 1) TypeCheckResult.TypeCheckFailure(
      // n <= 0 would pass analysis and then throw AIOOBE in executors
      s"word_shingles requires n >= 1 (got n=$n)")
    else if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("word_shingles requires a string argument")
  override def nullSafeEval(input: Any): Any =
    TextKernels.shingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.shingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

final case class MinhashBands(child: Expression, k: Int, bands: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if bands <= 0 || k <= 0 =>
      TypeCheckResult.TypeCheckFailure(
        s"minhash_bands requires k > 0 and bands > 0 (got k=$k, bands=$bands)")
    case _ if k % bands != 0 =>
      // a non-dividing band count would SILENTLY drop the k % bands tail
      // slots from every band hash — reject at analysis, not at eval
      TypeCheckResult.TypeCheckFailure(
        s"minhash_bands requires bands to divide k (got k=$k, bands=$bands)")
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure("minhash_bands requires array<string>")
  }
  override def nullSafeEval(input: Any): Any =
    TextKernels.minhashBands(input.asInstanceOf[ArrayData], k, bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.minhashBands($c, $k, $bands)")
  override protected def withNewChildInternal(newChild: Expression): MinhashBands =
    copy(child = newChild)
  override def prettyName: String = "minhash_bands"
}

final case class WordGrams(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 1) TypeCheckResult.TypeCheckFailure(
      s"word_grams requires n >= 1 (got n=$n)")
    else if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("word_grams requires a string argument")
  override def nullSafeEval(input: Any): Any =
    TextKernels.wordGrams(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.wordGrams($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)
  override def prettyName: String = "word_grams"
}

object GopherStats {
  /** Output schema — all-long so every field oracle-compares exactly.
    * Fields are declared NULLABLE: the expression itself is null for null
    * text, and a null struct routed through `inline(array(..))` emits a
    * null-fielded row — nullable=false here would let codegen skip null
    * checks on columns that can in fact be null.
    */
  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = true),
    StructField("dup_token_positions", LongType, nullable = true),
    StructField("top_bigram_score", LongType, nullable = true),
    StructField("dup_trigram_coverage", LongType, nullable = true)))
}

final case class GopherStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = GopherStats.Schema
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("gopher_stats requires a string argument")
  override def nullSafeEval(input: Any): Any =
    TextKernels.gopherStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.gopherStats($c)")
  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(child = newChild)
  override def prettyName: String = "gopher_stats"
}

final case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("simhash64 requires a string argument")
  override def nullSafeEval(input: Any): Any =
    TextKernels.simhash64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}
