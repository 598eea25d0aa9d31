package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook registering the engine's native functions
  * with the SQL surface:
  *
  *   spark.sql("SELECT url_hash64(url), url_canon(url) FROM pages")
  *
  * Install with
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions` — the standard
  * plug-point, so a cluster operator enables them with one conf line.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("url_canon"),
      new ExpressionInfo(classOf[CanonicalizeUrl].getName, "url_canon"),
      (children: Seq[Expression]) => CanonicalizeUrl(children.head)))
    ext.injectFunction((
      FunctionIdentifier("url_hash64"),
      new ExpressionInfo(classOf[UrlHash64].getName, "url_hash64"),
      (children: Seq[Expression]) => UrlHash64(children.head)))
    ext.injectFunction((
      FunctionIdentifier("url_path"),
      new ExpressionInfo(classOf[UrlPath].getName, "url_path"),
      (children: Seq[Expression]) => UrlPath(children.head)))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (children: Seq[Expression]) => GraftExtensions.shinglesBuilder(children)))
    ext.injectFunction((
      FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[MinhashBands].getName, "minhash_bands"),
      (children: Seq[Expression]) => GraftExtensions.minhashBuilder(children)))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    ext.injectFunction((
      FunctionIdentifier("cosine_e4"),
      new ExpressionInfo(classOf[CosineE4].getName, "cosine_e4"),
      (children: Seq[Expression]) => CosineE4(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("rhp_sig64"),
      new ExpressionInfo(classOf[RhpSig64].getName, "rhp_sig64"),
      (children: Seq[Expression]) => GraftExtensions.rhpSigBuilder(children)))
  }
}

object GraftExtensions {
  /** Extract an integer LITERAL argument; a column, a non-number, or a
    * FRACTIONAL number (2.9 would otherwise silently truncate to 2) gets
    * an analysis-time error naming the function, not an eval NPE.
    */
  private def intLit(fn: String, e: Expression): Int = e match {
    case lit: org.apache.spark.sql.catalyst.expressions.Literal
        if lit.value != null && lit.value.isInstanceOf[Number] &&
          lit.value.asInstanceOf[Number].doubleValue() ==
            lit.value.asInstanceOf[Number].intValue().toDouble =>
      lit.value.asInstanceOf[Number].intValue()
    case _ => throw new IllegalArgumentException(
      s"$fn expects integer literal parameters, got: ${e.sql}")
  }

  /** word_shingles(text[, n=3]) */
  def shinglesBuilder(children: Seq[Expression]): Expression =
    WordShingles(children.head,
      if (children.length > 1) intLit("word_shingles", children(1)) else 3)

  /** minhash_bands(shingles[, k=32, bands=8]) */
  def minhashBuilder(children: Seq[Expression]): Expression =
    MinhashBands(children.head,
      if (children.length > 1) intLit("minhash_bands", children(1)) else 32,
      if (children.length > 2) intLit("minhash_bands", children(2)) else 8)

  /** rhp_sig64(vec[, nBits=8]) */
  def rhpSigBuilder(children: Seq[Expression]): Expression =
    RhpSig64(children.head,
      if (children.length > 1) intLit("rhp_sig64", children(1)) else 8)

  /** Install the same functions on an already-built session (temp
    * functions) — for hosts that construct the SparkSession themselves.
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.registerTempFunction(spark, "url_canon",
      children => CanonicalizeUrl(children.head))
    ColumnBridge.registerTempFunction(spark, "url_hash64",
      children => UrlHash64(children.head))
    ColumnBridge.registerTempFunction(spark, "url_path",
      children => UrlPath(children.head))
    ColumnBridge.registerTempFunction(spark, "word_shingles",
      shinglesBuilder)
    ColumnBridge.registerTempFunction(spark, "minhash_bands",
      minhashBuilder)
    ColumnBridge.registerTempFunction(spark, "simhash64",
      children => SimHash64(children.head))
    ColumnBridge.registerTempFunction(spark, "cosine_e4",
      children => CosineE4(children.head, children(1)))
    ColumnBridge.registerTempFunction(spark, "rhp_sig64", rhpSigBuilder)
  }
}
