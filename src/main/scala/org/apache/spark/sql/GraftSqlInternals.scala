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

/** A cached block of UnsafeRow payloads packed back-to-back into ONE byte
  * array (plus an offsets index) — the "primitive-array rank block"
  * representation of an iterate. Caching `RDD[InternalRow]` stores two JVM
  * objects per row (the UnsafeRow wrapper + its private byte[]): at 10⁷
  * vertices an iterative solver allocates and retires ~2·10⁷ objects per
  * iteration, and that allocator/GC/LLC churn is what caps scaling at high
  * thread counts. A chunk stores the same bytes as O(1) objects per
  * partition; the read side replays rows as a single reused UnsafeRow view
  * pointing into the array — the same row-reuse contract every Spark scan
  * (Parquet, columnar cache) already has.
  */
final class GraftRowChunk(
    val bytes: Array[Byte],
    val offsets: Array[Int], // row i at [offsets(i), offsets(i+1))
    val n: Int) extends Serializable

object GraftSqlInternals {

  /** Column carrying a per-iteration scalar with iteration-stable codegen. */
  def stableLit(value: Double): Column = columnOf(StableDouble(value))

  /** Column ⇄ Expression bridge (classic.ExpressionUtils is private[sql]). */
  def columnOf(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  final case class Truncated(df: DataFrame, handle: RDD[_])

  /** Escape hatch for A/B measurement: GRAFT_ROW_BLOCKS=0 restores the
    * per-row-copy cache representation.
    */
  private val useRowBlocks: Boolean =
    !sys.env.get("GRAFT_ROW_BLOCKS").contains("0")

  private val ByteArrayOffset =
    org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET

  /** Pack a partition's rows into GraftRowChunk blocks (segmented so one
    * chunk's byte array stays ≤ ~64 MB). Rows out of whole-stage codegen
    * are UnsafeRows whose bytes are copied directly; any other InternalRow
    * (non-codegen tails) is converted through a per-partition
    * UnsafeProjection first.
    */
  private def packPartition(it: Iterator[InternalRow],
      types: Array[org.apache.spark.sql.types.DataType]): Iterator[GraftRowChunk] =
    new Iterator[GraftRowChunk] {
      private val maxChunk = 64 << 20
      private lazy val proj = org.apache.spark.sql.catalyst.expressions
        .UnsafeProjection.create(types)
      def hasNext: Boolean = it.hasNext
      def next(): GraftRowChunk = {
        var bytes = new Array[Byte](1 << 16)
        val offs = new scala.collection.mutable.ArrayBuffer[Int](1 << 12)
        var used = 0
        while (it.hasNext && used < maxChunk) {
          val u = it.next() match {
            case ur: org.apache.spark.sql.catalyst.expressions.UnsafeRow => ur
            case other => proj(other)
          }
          val sz = u.getSizeInBytes
          if (used + sz > bytes.length) {
            var cap = bytes.length
            while (cap < used + sz) cap *= 2
            bytes = java.util.Arrays.copyOf(bytes, cap)
          }
          org.apache.spark.unsafe.Platform.copyMemory(
            u.getBaseObject, u.getBaseOffset,
            bytes, ByteArrayOffset + used, sz)
          offs += used
          used += sz
        }
        offs += used // sentinel: end of last row
        new GraftRowChunk(
          if (bytes.length == used) bytes else java.util.Arrays.copyOf(bytes, used),
          offs.toArray, offs.length - 1)
      }
    }

  /** Replay a chunk as InternalRows through ONE reused UnsafeRow view. */
  private def unpackChunks(chunks: Iterator[GraftRowChunk],
      nFields: Int): Iterator[InternalRow] =
    chunks.flatMap { c =>
      new Iterator[InternalRow] {
        private val row =
          new org.apache.spark.sql.catalyst.expressions.UnsafeRow(nFields)
        private var i = 0
        def hasNext: Boolean = i < c.n
        def next(): InternalRow = {
          row.pointTo(c.bytes, ByteArrayOffset + c.offsets(i),
            c.offsets(i + 1) - c.offsets(i))
          i += 1
          row
        }
      }
    }

  private def truncateImpl(cdf: CDataFrame, level: StorageLevel,
      eagerCount: Boolean): Truncated = {
    val spark = cdf.sparkSession
    val qe = cdf.queryExecution
    val nFields = cdf.schema.length
    if (useRowBlocks) {
      val src = qe.toRdd
      val types = cdf.schema.fields.map(_.dataType)
      // row buffers may be reused by the producing operator — irrelevant
      // here, the bytes are copied into the chunk immediately
      val chunks = src.mapPartitions(packPartition(_, types),
        preservesPartitioning = true)
      chunks.persist(level)
      chunks.localCheckpoint()
      if (eagerCount) chunks.count()
      val rows = chunks.mapPartitions(unpackChunks(_, nFields),
        preservesPartitioning = true)
      val logical = LogicalRDD.fromDataset(rows, cdf, isStreaming = false)
      Truncated(CDataset.ofRows(spark, logical), chunks)
    } else {
      val rdd = qe.toRdd.map(_.copy())
      rdd.persist(level)
      // truncate the RDD lineage too: persist alone keeps the parent-RDD
      // object graph alive, which deepens every iteration until the
      // scheduler or task deserializer recurses into a StackOverflowError
      rdd.localCheckpoint()
      if (eagerCount) rdd.count()
      val logical = LogicalRDD.fromDataset(rdd, cdf, isStreaming = false)
      Truncated(CDataset.ofRows(spark, logical), rdd)
    }
  }

  def truncate(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Truncated =
    truncateImpl(df.asInstanceOf[CDataFrame], level, eagerCount = false)

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
    val qe = cdf.queryExecution
    val t = truncateImpl(cdf, level, eagerCount = true)
    (t, qe.observedMetrics)
  }
}
