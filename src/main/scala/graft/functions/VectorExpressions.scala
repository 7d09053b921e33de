package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlInternals.{columnOf, expressionOf}
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity over two float-array
  * embedding columns.
  *
  * Why a custom Expression (SURVEY.md §4 extension ladder, tier (b)): the
  * composed form `aggregate(zip_with(a,b,_*_),…) / (sqrt(…)*sqrt(…))` walks
  * both arrays five times and materializes an intermediate array per row —
  * measurable on a 100 TB embedding scan. This kernel is one fused loop,
  * participates in whole-stage codegen via `doGenCode`, and accumulates the
  * dot product and both norms in a single pass.
  *
  * Semantics: inputs are ARRAY<FLOAT> or ARRAY<DOUBLE> (elements promoted to
  * double); null if either side is null OR contains a null element (the
  * composed zip_with/aggregate form null-propagates element nulls the same
  * way); 0.0 if either norm is 0 or lengths differ (same guards as
  * `Similarity.cosine`).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects ARRAY<FLOAT|DOUBLE> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  private def elemNullable(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  override def nullable: Boolean = left.nullable || right.nullable ||
    elemNullable(left) || elemNullable(right)

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return 0.0d
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val (fa, fb) = (isFloat(left), isFloat(right))
    val checkNulls = elemNullable(left) || elemNullable(right)
    while (i < n) {
      if (checkNulls && (a.isNullAt(i) || b.isNullAt(i))) return null
      val x = if (fa) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (fb) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0d else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getA = if (isFloat(left)) "getFloat" else "getDouble"
    val getB = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // every local through ctx.freshName: inlined whole-stage codegen would
      // otherwise collide with same-named variables from sibling expressions
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      // per-element null check only compiled in when the schema allows null
      // elements (zero cost on the common containsNull=false embedding scan)
      val nullCheck =
        if (elemNullable(left) || elemNullable(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.value} = 0.0;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    double $x = (double) $a.$getA($i);
         |    double $y = (double) $b.$getB($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = ($na == 0.0 || $nb == 0.0)
         |      ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  import org.apache.spark.sql.catalyst.expressions.Cast

  /** Accept any numeric array (SQL literals like array(1.0, 2.0) are
    * DECIMAL under ANSI): cast to ARRAY<DOUBLE> unless already float/double.
    */
  private def normalize(e: Expression): Expression = if (!e.resolved) e else e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => e
    case ArrayType(_: NumericType, n) => Cast(e, ArrayType(DoubleType, n))
    case _ => e // let checkInputDataTypes produce the typed error
  }

  /** Column API for the native kernel. */
  def cosine_native(a: Column, b: Column): Column =
    columnOf(CosineSimilarity(expressionOf(a), expressionOf(b)))

  /** Register `cosine_sim` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      exprs => CosineSimilarity(normalize(exprs(0)), normalize(exprs(1))),
      "scala_udf")
}
