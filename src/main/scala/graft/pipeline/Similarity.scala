package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * - `bruteForceTopK`: exact cosine top-k — the correctness baseline. The
  *   dot product is a `zip_with` + `aggregate` column expression (codegen'd),
  *   the per-query top-k a window rank after a broadcast join of the query
  *   set, so the big corpus side never shuffles.
  * - `lshTopK`: random-hyperplane LSH — the 100 TB path. Corpus vectors are
  *   bucketed once by sign-pattern key; each query probes only its bucket
  *   (plus multiprobe neighbors), turning all-pairs into an equi-join.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — the native single-pass Catalyst kernel
    * (graft.functions.CosineSimilarity, codegen'd); `cosineComposed` is the
    * equivalent built-in-functions form kept as a differential-testing
    * reference (five array passes + an intermediate array per row).
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosine_native(a, b)

  def cosineComposed(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm2(a) * norm2(b)
    when(n === 0, 0.0).otherwise(d / n)
  }

  /** Exact top-k cosine neighbors for every query row.
    * @param corpus  (id, embedding) — the big side, scanned once
    * @param queries (qid, embedding) — broadcast
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val joined = corpus.select(col("id"), col("embedding").as("ce"))
      .join(broadcast(queries.select(col("qid"), col("embedding").as("qe"))))
      .where(if (excludeSelf) col("id") =!= col("qid") else lit(true))
      .select(col("qid"), col("id"), cosine(col("ce"), col("qe")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(desc("cos"), asc("id"))
    joined.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rk"))
  }

  /** Sign-pattern bucket key from `nPlanes` pseudo-random hyperplanes.
    * Plane p's component for dimension i is a deterministic ±hash value —
    * no stored plane matrix, fully reproducible across executors.
    */
  def lshKey(embedding: Column, nPlanes: Int, seed: Int = 7): Column = {
    val keyBits = (0 until nPlanes).map { p =>
      // signed pseudo-weight per (plane, dim): xxhash64(p, seed, i) mapped to ±[0,1)
      val proj = aggregate(
        zip_with(embedding,
          transform(sequence(lit(0), size(embedding) - 1),
            i => (pmod(xxhash64(lit(p), lit(seed), i), lit(2000001L)) - 1000000L)
              .cast("double") / 1000000.0),
          (x, w) => x * w),
        lit(0.0d), (acc, v) => acc + v)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    keyBits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Approximate top-k: candidates share the LSH bucket key; ranked by exact
    * cosine inside the bucket. Recall grows with fewer planes / multiprobe.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nPlanes: Int = 8, excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(col("id"), col("embedding").as("ce"))
      .withColumn("key", lshKey(col("ce"), nPlanes))
    val q = queries.select(col("qid"), col("embedding").as("qe"))
      .withColumn("key", lshKey(col("qe"), nPlanes))
    val joined = c.join(q, Seq("key"))
      .where(if (excludeSelf) col("id") =!= col("qid") else lit(true))
      .select(col("qid"), col("id"), cosine(col("ce"), col("qe")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(desc("cos"), asc("id"))
    joined.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rk"))
  }

  /** Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold),
    * LSH-bucketed so only same-bucket pairs are compared.
    */
  def cosineNearDup(df: DataFrame, threshold: Double, nPlanes: Int = 6): DataFrame = {
    val d = df.select(col("id"), col("embedding"))
      .withColumn("key", lshKey(col("embedding"), nPlanes))
    val l = d.select(col("key"), col("id").as("a"), col("embedding").as("ea"))
    val r = d.select(col("key"), col("id").as("b"), col("embedding").as("eb"))
    l.join(r, Seq("key")).where(col("a") < col("b"))
      .select(col("a"), col("b"), cosine(col("ea"), col("eb")).as("cos"))
      .where(col("cos") >= threshold)
      .distinct()
  }
}
