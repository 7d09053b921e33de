package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora. Every variant is a pure
  * DataFrame pipeline: shingle/minhash/simhash signatures are computed with
  * built-in higher-order array functions (codegen'd — no Scala UDF in the
  * scan path), candidate pairs come from an equi-join on bucket keys (never
  * an all-pairs cross join), and survivors are selected with a deterministic
  * min-id rule.
  */
object Dedup {

  /** Exact dedup: group identical normalized text, keep the smallest id.
    * Returns (id, keep_id, group_size).
    *
    * The group key is (fingerprint, normalized text): the 64-bit fingerprint
    * prefix keeps shuffle-key comparisons cheap and the partitioning
    * balanced, while carrying the text itself guarantees a hash collision
    * can never silently merge two distinct documents — at web scale a 64-bit
    * hash alone WOULD collide (birthday bound ≈ 5·10⁹ docs for p=0.5).
    */
  def exact(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    val w = Window.partitionBy(col("fp"), col("norm"))
    df.select(col(idCol).as("id"), norm.as("norm"))
      .withColumn("fp", xxhash64(col("norm")))
      .withColumn("keep_id", min(col("id")).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .select(col("id"), col("keep_id"), col("group_size"))
  }

  /** MinHash signature (nHashes permutations) over the shingle set.
    * h_i(S) = min over shingles s of xxhash64(base(s), i) — the standard
    * tabulation-free family. Shingle strings are hashed ONCE; the i-th
    * permutation re-hashes the 8-byte long (O(1) per element, codegen'd,
    * and ANSI-safe: raw long arithmetic would trip Spark 4's overflow
    * checks), so the scan does one string pass instead of nHashes.
    */
  def minhashSignature(shingleCol: Column, nHashes: Int,
      preHashed: Boolean = false): Column = {
    val baseHashes =
      if (preHashed) shingleCol else transform(shingleCol, s => xxhash64(s))
    array((0 until nHashes).map { i =>
      array_min(transform(baseHashes, h => xxhash64(h, lit(i))))
    }: _*)
  }

  /** MinHash-LSH near-duplicate pairs.
    * Pipeline: shingle → minhash(nBands·rowsPerBand) → band buckets →
    * self-join per bucket → distinct candidate pairs (a < b). The verify
    * step (exact Jaccard on the candidates only) is `verifyJaccard`.
    */
  def minhashCandidates(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", shingleK: Int = 5,
      nBands: Int = 8, rowsPerBand: Int = 4): DataFrame = {
    val n = nBands * rowsPerBand
    val sh = shinglesExpr(col(textCol), shingleK)
    val sig = df.select(col(idCol).as("id"), sh.as("sh"))
      .where(size(col("sh")) > 0)
      // materialize base hashes once per row before fanning out n mins
      .select(col("id"), transform(col("sh"), s => xxhash64(s)).as("bh"))
      .localCheckpoint(false)
      .withColumn("sig", minhashSignature(col("bh"), n, preHashed = true))
      .select(col("id"), col("sig"))
    val bands = sig.select(col("id"), posexplode(
      array((0 until nBands).map(b =>
        hash(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand), lit(b))): _*))
      .as(Seq("band", "bucket")))
    val l = bands.select(col("band"), col("bucket"), col("id").as("a"))
    val r = bands.select(col("band"), col("bucket"), col("id").as("b"))
    l.join(r, Seq("band", "bucket")).where(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
  }

  /** Exact Jaccard similarity for given candidate pairs (a, b). */
  def verifyJaccard(candidates: DataFrame, df: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      shingleK: Int = 5, threshold: Double = 0.7): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shinglesExpr(col(textCol), shingleK).as("sh"))
    candidates
      .join(sh.withColumnRenamed("id", "a").withColumnRenamed("sh", "sha"), "a")
      .join(sh.withColumnRenamed("id", "b").withColumnRenamed("sh", "shb"), "b")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("double"))
      .withColumn("uni", size(array_union(col("sha"), col("shb"))).cast("double"))
      .withColumn("jaccard", when(col("uni") === 0, 0.0).otherwise(col("inter") / col("uni")))
      .where(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** SimHash: 64-bit signature where bit i is the sign of the sum over
    * tokens of (token-hash bit i ? +1 : -1). Near-dups = signatures within
    * `maxHamming`; bucketing by 4 16-bit chunks guarantees recall for
    * maxHamming ≤ 3 (pigeonhole).
    */
  def simhash(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val hashes = transform(toks, t => xxhash64(t))
    (0 until 64).map { i =>
      val bitSum = aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(bitSum > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a: Column, b: Column) => a.bitwiseOR(b))
  }

  /** SimHash near-duplicate candidate pairs within hamming distance ≤ 3,
    * via 16-bit chunk bucketing.
    */
  def simhashCandidates(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    val chunks = sigs.select(col("id"), col("sig"), posexplode(array(
      (0 until 4).map(c => shiftright(col("sig"), c * 16).bitwiseAND(0xffffL)): _*))
      .as(Seq("chunk", "key")))
    val l = chunks.select(col("chunk"), col("key"), col("id").as("a"), col("sig").as("siga"))
    val r = chunks.select(col("chunk"), col("key"), col("id").as("b"), col("sig").as("sigb"))
    l.join(r, Seq("chunk", "key")).where(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("siga").bitwiseXOR(col("sigb"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Word n-gram Jaccard similarity for all bucket-joined candidate pairs
    * sharing at least one n-gram (exact, no LSH approximation) — practical
    * only with a shared-ngram prefilter, which is what the join provides.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val grams = array_distinct(filter(
      transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => array_join(slice(toks, i + 1, lit(n)), " ")),
      g => size(split(g, " ")) === n))
    val d = df.select(col(idCol).as("id"), grams.as("grams"))
      .where(size(col("grams")) > 0)
    val inv = d.select(col("id"), explode(col("grams")).as("g"))
    val cand = inv.select(col("g"), col("id").as("a"))
      .join(inv.select(col("g"), col("id").as("b")), "g")
      .where(col("a") < col("b")).select(col("a"), col("b")).distinct()
    verify(cand, d)
      .where(col("jaccard") >= threshold)
  }

  private def verify(cand: DataFrame, d: DataFrame): DataFrame =
    cand
      .join(d.select(col("id").as("a"), col("grams").as("ga")), "a")
      .join(d.select(col("id").as("b"), col("grams").as("gb")), "b")
      .withColumn("inter", size(array_intersect(col("ga"), col("gb"))).cast("double"))
      .withColumn("uni", size(array_union(col("ga"), col("gb"))).cast("double"))
      .withColumn("jaccard", when(col("uni") === 0, 0.0).otherwise(col("inter") / col("uni")))
      .select(col("a"), col("b"), col("jaccard"))

  /** Character-shingle expression (k-grams of the normalized text). */
  def shinglesExpr(text: Column, k: Int): Column = {
    val norm = regexp_replace(lower(trim(text)), "\\s+", " ")
    array_distinct(filter(
      transform(sequence(lit(1), greatest(length(norm) - (k - 1), lit(1))),
        i => norm.substr(i, lit(k))),
      x => length(x) === k))
  }
}
