package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, Multimodal, Similarity, TextAnalysis}

class PipelineSpec extends AnyFunSuite with SparkTestBase {
  import org.apache.spark.sql.DataFrame

  private lazy val docs: DataFrame = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy dog"),      // exact dup of 0
      (2L, "the  quick brown fox   jumps over the lazy dog"),   // whitespace variant
      (3L, "the quick brown fox leaps over the lazy dog"),      // near-dup (1 word)
      (4L, "completely different content about spark engines"),
      (5L, ""),
      (6L, "der hund und die katze sind nicht hier"),           // German-ish
      (7L, "Punctuation!!! ... ;;; ,,, ??? !!!")
    ).toDF("doc_id", "text")
  }

  test("token count and stopword count") {
    val r = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.stopwordCount(col("text")).as("stop"))
      .collect().map(x => x.getLong(0) -> (x.getInt(1), x.getInt(2))).toMap
    assert(r(0L) == ((9, 2))) // 'the' twice; 'over' is not a stopword
    assert(r(5L) == ((0, 0)))
  }

  test("exact dedup groups whitespace-normalized duplicates, keeps min id") {
    val r = Dedup.exact(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(0L) == ((0L, 3L))) // docs 0,1,2 collapse
    assert(r(1L) == ((0L, 3L)))
    assert(r(2L) == ((0L, 3L)))
    assert(r(3L)._2 == 1L)
    assert(r(4L)._2 == 1L)
  }

  test("minhash LSH finds the near-duplicate pair and verifies jaccard") {
    val cand = Dedup.minhashCandidates(docs, nBands = 16, rowsPerBand = 2)
    val verified = Dedup.verifyJaccard(cand, docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // exact dups have jaccard 1.0
    assert(verified.get((0L, 1L)).contains(1.0))
    assert(verified.get((0L, 2L)).contains(1.0))
    // near-dup 0↔3 shares most shingles
    assert(verified.keySet.contains((0L, 3L)))
    assert(verified((0L, 3L)) > 0.5 && verified((0L, 3L)) < 1.0)
    // unrelated docs never become candidates-with-high-jaccard
    assert(!verified.keySet.exists { case (a, b) => b == 4L || a == 4L })
  }

  test("simhash: identical docs hamming 0, near-dups small hamming") {
    val pairs = Dedup.simhashCandidates(docs, maxHamming = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((0L, 1L)) == 0)
    assert(pairs.get((0L, 3L)).exists(_ <= 10))
  }

  test("ngram jaccard pairs") {
    val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs.contains((0L, 3L)))
  }

  test("langId: English vs German-ish markers, und for no markers") {
    val r = docs.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(0L) == "en")
    assert(r(6L) == "de")
    assert(r(7L) == "und")
  }

  test("fingerprint is whitespace-insensitive") {
    val fps = docs.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(fps(0L) == fps(2L))
    assert(fps(0L) != fps(3L))
  }

  test("brute-force cosine top-k: exact neighbors with deterministic order") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0, 0.0, 0.0)),
      (1L, Array(0.9, 0.1, 0.0)),  // closest to 0
      (2L, Array(0.0, 1.0, 0.0)),
      (3L, Array(0.7, 0.7, 0.0))
    ).toDF("id", "embedding")
    val q = vecs.where(col("id") === 0).select(col("id").as("qid"), col("embedding"))
    val top = Similarity.bruteForceTopK(vecs, q, k = 2).collect()
      .map(r => (r.getLong(1), r.getInt(3))).sortBy(_._2)
    assert(top.toSeq == Seq((1L, 1), (3L, 2)))
  }

  test("LSH top-k recall: bucket join returns same-bucket exact ranks") {
    import spark.implicits._
    // clustered vectors: LSH must keep intra-cluster neighbors together
    val base = Seq.tabulate(40) { i =>
      val cluster = i % 4
      val v = Array.tabulate(16)(d =>
        (if (d / 4 == cluster) 1.0 else 0.01) + 0.001 * ((i * 7 + d) % 5))
      (i.toLong, v)
    }
    val vecs = base.toDF("id", "embedding")
    val q = vecs.where(col("id") < 4).select(col("id").as("qid"), col("embedding"))
    val exact = Similarity.bruteForceTopK(vecs, q, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(vecs, q, k = 3, nPlanes = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // recall ≥ 2/3 per query on well-separated clusters
    assert((exact intersect approx).size >= exact.size * 2 / 3,
      s"recall too low: ${(exact intersect approx).size}/${exact.size}")
  }

  test("native cosine kernel: equals composed form, codegen, guards, SQL registration") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vecs = Seq.tabulate(60)(i => (i.toLong, Array.fill(33)(rnd.nextDouble() - 0.5)))
      .toDF("id", "e")
    val pairs = vecs.select(col("id").as("a"), col("e").as("ea"))
      .crossJoin(vecs.select(col("id").as("b"), col("e").as("eb")))
    val diff = pairs.select(
        graft.pipeline.Similarity.cosine(col("ea"), col("eb")).as("nat"),
        graft.pipeline.Similarity.cosineComposed(col("ea"), col("eb")).as("comp"))
      .where(abs(col("nat") - col("comp")) > 1e-12)
    assert(diff.count() == 0)
    // codegen actually engaged (no CodegenFallback in the plan)
    val p = pairs.select(graft.pipeline.Similarity.cosine(col("ea"), col("eb")))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Fallback"), p)
    // float arrays + guards
    val f = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f), Array(0.0f, 0.0f), Array(1.0f)))
      .toDF("a", "b", "z", "short")
    val r = f.select(
      graft.pipeline.Similarity.cosine(col("a"), col("b")).as("same"),
      graft.pipeline.Similarity.cosine(col("a"), col("z")).as("zero"),
      graft.pipeline.Similarity.cosine(col("a"), col("short")).as("mismatch")).head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0)
    // SQL registration
    graft.functions.VectorFunctions.register(spark)
    f.createOrReplaceTempView("vf")
    assert(spark.sql("SELECT cosine_sim(a, b) FROM vf").head().getDouble(0) == 1.0)
    // null-element semantics match the composed (zip_with/aggregate) form:
    // a null element null-propagates to a null result, in eval AND codegen
    val withNulls = Seq(
      (Array[java.lang.Double](1.0, null), Array[java.lang.Double](1.0, 2.0)),
      (Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](1.0, 2.0)))
      .toDF("na", "nb")
    val nr = withNulls.select(
      graft.pipeline.Similarity.cosine(col("na"), col("nb")).as("nat"),
      graft.pipeline.Similarity.cosineComposed(col("na"), col("nb")).as("comp"))
      .collect()
    assert(nr(0).isNullAt(0) && nr(0).isNullAt(1), nr(0).toString)
    assert(!nr(1).isNullAt(0) && math.abs(nr(1).getDouble(0) - 1.0) < 1e-12)
  }

  test("multimodal: batched feature extraction preserves schema and determinism") {
    val m = Multimodal.syntheticMedia(spark, 50, partitions = 3)
    val f1 = Multimodal.extractFeatures(m, batchSize = 7).collect()
      .map(x => x.media_id -> x.features.toSeq).toMap
    val f2 = Multimodal.extractFeatures(
      Multimodal.syntheticMedia(spark, 50, partitions = 11), batchSize = 64)
      .collect().map(x => x.media_id -> x.features.toSeq).toMap
    assert(f1 == f2) // partitioning/batch-size independent
    val kinds = m.collect().map(_.kind).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("multimodal: resize plan preserves aspect ratio within bounds") {
    val m = Multimodal.syntheticMedia(spark, 30).toDF()
    val r = Multimodal.resizePlan(m, 256).collect()
    r.foreach { row =>
      val (w, h) = (row.getAs[Int]("width"), row.getAs[Int]("height"))
      val (tw, th) = (row.getAs[Int]("target_w"), row.getAs[Int]("target_h"))
      assert(tw <= 256 && th <= 256 || (w <= 256 && h <= 256))
      assert(tw <= w && th <= h)
    }
  }
}
