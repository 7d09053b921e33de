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
    * no stored plane matrix, fully reproducible across executors. Computed
    * by the fused `LshSignBits` kernel: one embedding traversal accumulates
    * all plane projections (the composed form below re-walks the array per
    * plane and materializes a weights array per row·plane).
    */
  def lshKey(embedding: Column, nPlanes: Int, seed: Int = 7): Column =
    graft.functions.HashFunctions.lsh_sign_bits(embedding, nPlanes, seed)

  /** Composed built-in form of `lshKey` — differential-testing reference. */
  def lshKeyComposed(embedding: Column, nPlanes: Int, seed: Int = 7): Column = {
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
    * cosine inside the bucket.
    *
    * Multiprobe: each query also probes every bucket at Hamming distance
    * ≤ `multiprobe` (bit flips of its own key) — a vector just across one
    * hyperplane from the query lands in such a neighbor bucket. The probe
    * fan-out multiplies only the SMALL query side (1 + nPlanes keys at
    * depth 1) before the equi-join, so the corpus is still touched
    * linearly; this is the standard recall knob that avoids either more
    * tables (memory) or fewer planes (bucket blowup).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nPlanes: Int = 8, multiprobe: Int = 1, excludeSelf: Boolean = true): DataFrame = {
    // default 1 = Hamming-1 probing, the historical call-site contract and
    // the recall-safe default (a caller who wants the cheapest probe-free
    // lookup opts DOWN explicitly). Negative values are rejected rather
    // than silently behaving like depth-1 probing.
    require(multiprobe >= 0 && multiprobe <= 1,
      s"only Hamming-distance-0/1 probing implemented, got $multiprobe")
    val c = corpus.select(col("id"), col("embedding").as("ce"))
      .withColumn("key", lshKey(col("ce"), nPlanes))
    val q0 = queries.select(col("qid"), col("embedding").as("qe"))
      .withColumn("key0", lshKey(col("qe"), nPlanes))
    val probeKeys =
      if (multiprobe == 0) array(col("key0"))
      else array(col("key0") +:
        (0 until nPlanes).map(p => col("key0").bitwiseXOR(lit(1L << p))): _*)
    val q = q0.select(col("qid"), col("qe"), explode(probeKeys).as("key"))
    val joined = c.join(q, Seq("key"))
      .where(if (excludeSelf) col("id") =!= col("qid") else lit(true))
      .select(col("qid"), col("id"), cosine(col("ce"), col("qe")).as("cos"))
      .distinct() // a neighbor can surface through several probe buckets
    val w = Window.partitionBy(col("qid")).orderBy(desc("cos"), asc("id"))
    joined.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rk"))
  }

  /** Train an IVF coarse quantizer: k-means centroids from a DETERMINISTIC
    * bounded sample (rows ordered by xxhash64(id), first `sampleN`) with
    * `iters` Lloyd steps on the driver. The industrial IVF shape: training
    * touches O(sampleN·nCells·dim) flops once on the driver; the full
    * corpus is only ever scanned by the fused assignment expression.
    * Returns the centroid matrix flattened row-major (nCells × dim).
    */
  def trainIvfCentroids(corpus: DataFrame, nCells: Int,
      sampleN: Int = 4096, iters: Int = 5): (Array[Double], Int) = {
    val sample = corpus.select(col("embedding").cast("array<double>"))
      .withColumn("h", xxhash64(col("embedding")))
      .orderBy(col("h")).limit(sampleN)
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "ivf: empty corpus")
    val dim = sample.map(_.length).max
    val pts = sample.map(v => if (v.length == dim) v else v.padTo(dim, 0.0))
    val k = math.min(nCells, pts.length)
    val cents = Array.tabulate(k)(i => pts(i * pts.length / k).clone())
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val t = a(i) - b(i); s += t * t; i += 1 }; s
    }
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      pts.foreach { p =>
        var best = 0; var bd = Double.MaxValue
        var c = 0
        while (c < k) { val dd = d2(p, cents(c)); if (dd < bd) { bd = dd; best = c }; c += 1 }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += p(i); i += 1 }
      }
      for (c <- 0 until k if counts(c) > 0; i <- 0 until dim)
        cents(c)(i) = sums(c)(i) / counts(c) // empty cell keeps its centroid
    }
    // pad trained k up to nCells by repeating (degenerate tiny-corpus case)
    val full = Array.tabulate(nCells)(c => cents(c % k))
    (full.flatten, dim)
  }

  /** IVF approximate top-k — the coarse-quantizer scale path next to
    * `lshTopK`: the corpus partitions into `nCells` inverted lists by
    * nearest centroid (one fused-expression pass, never shuffled by more
    * than the equi-join); each query probes its `nProbe` nearest cells and
    * ranks candidates by exact cosine. Recall/latency dial: nProbe.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 64, nProbe: Int = 4, sampleN: Int = 4096,
      excludeSelf: Boolean = true): DataFrame = {
    import graft.functions.IvfFunctions.ivf_nearest_cells
    val (cents, dim) = trainIvfCentroids(
      corpus.select(col("embedding")), nCells, sampleN)
    val c = corpus.select(col("id"), col("embedding").as("ce"))
      .withColumn("cell",
        element_at(ivf_nearest_cells(col("ce"), cents, dim, nCells, 1), 1))
    val q = queries.select(col("qid"), col("embedding").as("qe"))
      .select(col("qid"), col("qe"),
        explode(ivf_nearest_cells(col("qe"), cents, dim, nCells, nProbe)).as("cell"))
    val joined = c.join(q, Seq("cell"))
      .where(if (excludeSelf) col("id") =!= col("qid") else lit(true))
      .select(col("qid"), col("id"), cosine(col("ce"), col("qe")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(desc("cos"), asc("id"))
    joined.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rk"))
  }

  /** Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold).
    *
    * Banded multi-table LSH (the minhash-banding shape): `nBands` bands of
    * `planesPerBand` hyperplanes each; two rows are candidates iff they
    * agree on ALL sign bits of SOME band. A single flat table (the old
    * 6-plane design) put N/2⁶ rows in each bucket — within-bucket all-pairs
    * is O(N²/64), still quadratic; banding keeps recall (any one band can
    * match) while each band slices N into 2^planesPerBand buckets, and the
    * `maxBucket` guard drops degenerate buckets (dense regions — e.g. a
    * zero-vector pileup) so no single bucket can go quadratic.
    */
  def cosineNearDup(df: DataFrame, threshold: Double, nBands: Int = 4,
      planesPerBand: Int = 12, maxBucket: Int = 2000, seed: Int = 7): DataFrame = {
    val total = nBands * planesPerBand
    require(total <= 63, s"nBands*planesPerBand must be <= 63, got $total")
    val mask = (1L << planesPerBand) - 1
    val d = df.select(col("id"), col("embedding"))
      .withColumn("key", lshKey(col("embedding"), total, seed))
    val bands = d.select(col("id"), col("embedding"), posexplode(
      array((0 until nBands).map(b =>
        shiftright(col("key"), b * planesPerBand).bitwiseAND(lit(mask))): _*))
      .as(Seq("band", "pattern")))
    // bucket-size guard: an oversized bucket is excluded from the pair join
    val ok = bands.groupBy(col("band"), col("pattern"))
      .agg(count(lit(1)).as("c")).where(col("c") <= maxBucket)
      .select(col("band"), col("pattern"))
    val g = bands.join(ok, Seq("band", "pattern"), "left_semi")
    val l = g.select(col("band"), col("pattern"), col("id").as("a"), col("embedding").as("ea"))
    val r = g.select(col("band"), col("pattern"), col("id").as("b"), col("embedding").as("eb"))
    l.join(r, Seq("band", "pattern")).where(col("a") < col("b"))
      .select(col("a"), col("b"), cosine(col("ea"), col("eb")).as("cos"))
      .where(col("cos") >= threshold)
      .distinct()
  }
}
