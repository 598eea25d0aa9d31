package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the title→API-lookup path (q28) —
  * column twins of the E10/E11 row functions in
  * [[graft.extract.TitleClean]] and the Atom entry[0] id parse in
  * [[graft.extract.ArxivExtract]] (reference: name2arxivid.py:147-175).
  * Each calls the SAME row function the extraction layer executes, from
  * generated code, so the per-doc lookup path stays inside whole-stage
  * codegen with zero drift risk — these replaced the last boxed ScalaUDFs
  * on a driver-contract query plan (ExtractExpressionsSpec pins equality
  * against the UDF formulation; PlanSpec pins q28 UDF-free).
  *
  * `clean_title(t)`     : string → ordered-regex-chain cleaned title (E10)
  * `search_variants(t)` : string → the E11 search-variant array, original
  *                        title first (the variant_rank order q28's
  *                        first-hit-wins cascade depends on)
  * `atom_first_id(xml)` : string → arxiv id of the FIRST Atom `<entry>`,
  *                        NULL when the feed has no resolvable entry —
  *                        nullable beyond input nullability, like
  *                        [[CosineE4]].
  */
object ExtractExprOps extends Serializable {
  def cleanTitle(t: UTF8String): UTF8String =
    if (t == null) null
    else UTF8String.fromString(graft.extract.TitleClean.cleanTitle(t.toString))

  def searchVariants(t: UTF8String): GenericArrayData =
    if (t == null) null
    else new GenericArrayData(graft.extract.TitleClean
      .searchVariants(t.toString).map(UTF8String.fromString).toArray[Any])

  def atomFirstId(xml: UTF8String): UTF8String =
    if (xml == null) null
    else graft.extract.ArxivExtract.parseAtomFirstId(xml.toString)
      .map(UTF8String.fromString).orNull
}

final case class CleanTitle(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("clean_title requires a string")
  override def nullSafeEval(input: Any): Any =
    ExtractExprOps.cleanTitle(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ExtractExprOps.cleanTitle($c)")
  override protected def withNewChildInternal(newChild: Expression): CleanTitle =
    copy(child = newChild)
  override def prettyName: String = "clean_title"
}

final case class SearchVariants(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("search_variants requires a string")
  override def nullSafeEval(input: Any): Any =
    ExtractExprOps.searchVariants(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ExtractExprOps.searchVariants($c)")
  override protected def withNewChildInternal(newChild: Expression): SearchVariants =
    copy(child = newChild)
  override def prettyName: String = "search_variants"
}

final case class AtomFirstId(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  // nullable beyond child nullability: a feed without a resolvable first
  // entry is NULL — ev.isNull must be a real variable (CosineE4 pattern)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("atom_first_id requires a string")
  override def nullSafeEval(input: Any): Any =
    ExtractExprOps.atomFirstId(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("atomId")
      s"""
         |UTF8String $tmp = graft.functions.ExtractExprOps.atomFirstId($c);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp;
         |}
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): AtomFirstId =
    copy(child = newChild)
  override def prettyName: String = "atom_first_id"
}
