package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlInternals.{columnOf, expressionOf}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** IVF (inverted-file) coarse quantization: the `nProbe` nearest centroids
  * of an embedding by squared L2, as ONE fused pass (embedding is copied to
  * a local register array once; cells scan that). The centroid matrix is a
  * plan-time constant (trained driver-side on a bounded sample — the
  * industrial IVF shape: train small, apply distributed), shipped to
  * executors once via the codegen reference table, NOT per row.
  *
  * The composed built-in alternative (transform over a literal
  * array-of-arrays with an aggregate inside) evaluates interpreted per
  * element — the same trap the fused LSH/minhash kernels in
  * HashExpressions replaced.
  */
case class IvfNearestCells(child: Expression, centroids: Array[Double],
    dim: Int, nCells: Int, nProbe: Int) extends UnaryExpression {
  require(nCells > 0 && nProbe > 0 && nProbe <= nCells,
    s"ivf_nearest_cells: bad nCells=$nCells nProbe=$nProbe")
  require(centroids.length == nCells * dim,
    s"ivf_nearest_cells: centroid matrix ${centroids.length} != $nCells*$dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ivf_nearest_cells expects ARRAY<FLOAT|DOUBLE>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val m = math.min(a.numElements(), dim)
    val x = new Array[Double](dim) // dims beyond the input stay 0
    var i = 0
    while (i < m) {
      if (!a.isNullAt(i)) x(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    val bestIdx = new Array[Int](nProbe)
    val bestDist = Array.fill(nProbe)(Double.MaxValue)
    var c = 0
    while (c < nCells) {
      var d = 0.0
      var j = 0
      val off = c * dim
      while (j < dim) { val t = x(j) - centroids(off + j); d += t * t; j += 1 }
      // insertion into the running top-nProbe (nProbe is tiny)
      var k = nProbe - 1
      if (d < bestDist(k)) {
        while (k > 0 && d < bestDist(k - 1)) {
          bestDist(k) = bestDist(k - 1); bestIdx(k) = bestIdx(k - 1); k -= 1
        }
        bestDist(k) = d; bestIdx(k) = c
      }
      c += 1
    }
    new GenericArrayData(bestIdx)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    val centsRef = ctx.addReferenceObj("ivfCentroids", centroids, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("m"); val x = ctx.freshName("x")
      val i = ctx.freshName("i"); val c = ctx.freshName("c")
      val j = ctx.freshName("j"); val d = ctx.freshName("d")
      val t = ctx.freshName("t"); val off = ctx.freshName("off")
      val bi = ctx.freshName("bestIdx"); val bd = ctx.freshName("bestDist")
      val k = ctx.freshName("k")
      val nullGuard =
        if (child.dataType.asInstanceOf[ArrayType].containsNull)
          s"if (!$a.isNullAt($i))"
        else ""
      s"""
         |int $m = java.lang.Math.min($a.numElements(), $dim);
         |double[] $x = new double[$dim];
         |for (int $i = 0; $i < $m; $i++) {
         |  $nullGuard $x[$i] = (double) $a.$get($i);
         |}
         |int[] $bi = new int[$nProbe];
         |double[] $bd = new double[$nProbe];
         |java.util.Arrays.fill($bd, Double.MAX_VALUE);
         |for (int $c = 0; $c < $nCells; $c++) {
         |  double $d = 0.0;
         |  int $off = $c * $dim;
         |  for (int $j = 0; $j < $dim; $j++) {
         |    double $t = $x[$j] - $centsRef[$off + $j];
         |    $d += $t * $t;
         |  }
         |  int $k = $nProbe - 1;
         |  if ($d < $bd[$k]) {
         |    while ($k > 0 && $d < $bd[$k - 1]) {
         |      $bd[$k] = $bd[$k - 1]; $bi[$k] = $bi[$k - 1]; $k--;
         |    }
         |    $bd[$k] = $d; $bi[$k] = $c;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bi);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): IvfNearestCells =
    copy(child = newChild)
}

object IvfFunctions {
  /** Column API: nProbe nearest IVF cells of an embedding (array<int>). */
  def ivf_nearest_cells(embedding: Column, centroids: Array[Double],
      dim: Int, nCells: Int, nProbe: Int): Column =
    columnOf(IvfNearestCells(expressionOf(embedding), centroids, dim, nCells, nProbe))
}
