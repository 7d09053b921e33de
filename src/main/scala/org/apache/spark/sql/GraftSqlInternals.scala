package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.classic.{DataFrame => CDataFrame, Dataset => CDataset, SparkSession => CSparkSession}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.storage.StorageLevel

/** Internal bridge for iterative algorithms: persist the computed rows of a
  * DataFrame and rebuild it as a flat LogicalRDD scan — what
  * `Dataset.localCheckpoint` does, but returning the underlying RDD handle
  * so the caller can unpersist the PREVIOUS iterate deterministically
  * instead of waiting for the ContextCleaner (unbounded iteration loops
  * would otherwise accumulate cached blocks between GCs).
  * Output partitioning/ordering are preserved (LogicalRDD.fromDataset), so
  * co-partitioned joins stay shuffle-free across iterations.
  */
/** A per-iteration scalar (ω, dᵀx, …) that travels through the codegen
  * REFERENCES ARRAY instead of being inlined into the generated source.
  * `lit(omega)` bakes the double into the Java text, so every iteration of
  * an iterative solver produces different source and pays a fresh Janino
  * compile of every stage touching it; StableDouble keeps the source
  * byte-identical across iterations (only `references` differs), so the
  * CodeGenerator cache hits from iteration 2 on. foldable=false keeps the
  * optimizer from constant-folding it back into an inline literal.
  */
case class StableDouble(value: Double) extends LeafExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def eval(input: InternalRow): Any = value
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftStableDouble",
      java.lang.Double.valueOf(value), "java.lang.Double")
    ev.copy(
      code = code"final double ${ev.value} = $ref.doubleValue();",
      isNull = FalseLiteral)
  }
}

object GraftSqlInternals {

  /** Column carrying a per-iteration scalar with iteration-stable codegen. */
  def stableLit(value: Double): Column = columnOf(StableDouble(value))

  /** Column ⇄ Expression bridge (classic.ExpressionUtils is private[sql]). */
  def columnOf(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  final case class Truncated(df: DataFrame, handle: RDD[InternalRow])

  def truncate(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Truncated = {
    val cdf = df.asInstanceOf[CDataFrame]
    val spark = cdf.sparkSession
    val rdd = cdf.queryExecution.toRdd.map(_.copy())
    rdd.persist(level)
    // truncate the RDD lineage too: persist alone keeps the parent-RDD
    // object graph alive, which deepens every iteration until the scheduler
    // or task deserializer recurses into a StackOverflowError
    rdd.localCheckpoint()
    val logical = LogicalRDD.fromDataset(rdd, cdf, isStreaming = false)
    Truncated(CDataset.ofRows(spark, logical), rdd)
  }

  /** `truncate` + EAGER materialization in ONE job, returning the metrics of
    * any `Dataset.observe` (CollectMetrics) nodes in the plan.
    *
    * This is the single-action iteration kernel: an iterative solver needs
    * (a) the next iterate materialized + lineage-truncated and (b) a handful
    * of global scalars about it (residual, dangling mass, sum). Running a
    * separate `.agg().head()` pays one extra stage barrier plus a full
    * read-back of the just-cached data per iteration; `observe` computes the
    * same scalars in AggregatingAccumulators as a side-effect of the SAME
    * tasks that write the cache, so the per-iteration job has no dedicated
    * aggregation stage at all.
    */
  def truncateObserved(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): (Truncated, Map[String, Row]) = {
    val cdf = df.asInstanceOf[CDataFrame]
    val spark = cdf.sparkSession
    val qe = cdf.queryExecution
    val rdd = qe.toRdd.map(_.copy())
    rdd.persist(level)
    rdd.localCheckpoint()
    rdd.count() // the materializing action; observe accumulators fill here
    val logical = LogicalRDD.fromDataset(rdd, cdf, isStreaming = false)
    (Truncated(CDataset.ofRows(spark, logical), rdd), qe.observedMetrics)
  }
}
