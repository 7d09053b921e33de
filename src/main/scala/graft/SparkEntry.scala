package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.graph._
import graft.model.PageRankConfig
import graft.pipeline.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Driver contract — one `queries` entry per implemented operator
  * (SURVEY.md §2), with a DuckDB-equivalent SQL oracle where the operator is
  * SQL-expressible (OracleSql). Non-SQL-expressible ops (hash-based dedup
  * signatures, LSH, multimodal stubs) are rows-only checks; their numeric
  * correctness is covered by the ScalaTest oracle suite instead.
  */
object SparkEntry {

  /** Flagship: full pipeline on sf0.001 — events→transcripts→link graph →
    * converged PageRank (α=0.85, tol 1e-6) with top ranks named.
    */
  def entry(spark: SparkSession): DataFrame = {
    val g = TestdataGraph.linkGraph(spark, "/root/testdata/sf0.001")
    val (ranks, _) = PageRank.run(g, PageRankConfig(tol = 1e-6))
    ranks.toDF().join(g.dict, "id")
      .select(col("conv_id"), col("id"), col("rank"))
      .orderBy(desc("rank"), asc("id"))
  }

  // ---- i1 incremental-merge fixtures ----
  // The durable base store (plus its "late" raw-edge delta parquet) is
  // built ONCE per JVM and sf dir: in production the bucketed store
  // pre-exists — the incremental-maintenance OPERATOR is the delta merge,
  // not the initial bulk build (whose pieces c1/t3 cover). Each query
  // invocation merges into a fresh FS copy so the merge stays repeatable
  // (mergeDelta mutates the store).
  private val i1Stores = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Temp-store base dir: tmpfs when available (GRAFT_LOCAL_DIR, else
    * /dev/shm). The i1 query's timed body includes a filesystem copy of the
    * base store; on a disk-backed java.io.tmpdir that copy alone cost ~0.7 s
    * of the ~3.5 s query — pure I/O placement, no semantic difference.
    */
  private def i1TmpBase(): java.nio.file.Path = {
    val base = sys.env.get("GRAFT_LOCAL_DIR")
      .orElse(Option("/dev/shm").filter(p => new java.io.File(p).isDirectory))
      .getOrElse(System.getProperty("java.io.tmpdir"))
    val p = java.nio.file.Paths.get(base)
    java.nio.file.Files.createDirectories(p)
    p
  }

  private def i1BaseStore(s: SparkSession, dir: String): String =
    i1Stores.computeIfAbsent(dir, { _ =>
      val raw = TestdataGraph.rawEdges(s, dir).persist()
      val late = pmod(col("src") + col("dst"), lit(5)) === 0
      val base = raw.where(!late)
      val verts = base.select(col("src").as("id"))
        .union(base.select(col("dst").as("id"))).distinct()
      val dict = verts.select(
        concat(lit("u"), col("id").cast("string")).as("conv_id"), col("id"))
      val gBase = GraphOps.normalizeFrom(base, verts, dict)
      val store = java.nio.file.Files
        .createTempDirectory(i1TmpBase(), "graft_i1base").toString
      ingest.EdgeStore.write(gBase, store, buckets = 16)
      raw.where(late).write.mode("overwrite").parquet(s"$store/_i1_delta")
      raw.unpersist()
      store
    })

  private def i1CopyStore(s: SparkSession, src: String): String = {
    // The base store is a local temp dir by construction; a parallel NIO
    // tree copy replaces the sequential per-file Hadoop FileUtil walk
    // (~200 small files incl. .crc sidecars at ~3 ms each ≈ 0.6 s of the
    // timed query — pure copy mechanics, identical bytes).
    val dst = java.nio.file.Files
      .createTempDirectory(i1TmpBase(), "graft_i1work").toString
    val srcPath = java.nio.file.Paths.get(src)
    val dstPath = java.nio.file.Paths.get(dst)
    val files = new java.util.ArrayList[java.nio.file.Path]()
    for (sub <- Seq("data", "vertices", "dict", "meta")) {
      val sp = srcPath.resolve(sub)
      if (java.nio.file.Files.exists(sp)) {
        val st = java.nio.file.Files.walk(sp)
        try st.forEach(p => files.add(p): Unit) finally st.close()
      }
    }
    import scala.jdk.CollectionConverters._
    val (dirs, regs) = files.asScala.partition(java.nio.file.Files.isDirectory(_))
    dirs.foreach(d => java.nio.file.Files.createDirectories(dstPath.resolve(srcPath.relativize(d))))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futs = regs.map { f =>
        pool.submit(new Runnable {
          def run(): Unit = {
            java.nio.file.Files.copy(f, dstPath.resolve(srcPath.relativize(f)),
              java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
          }
        })
      }
      futs.foreach(_.get())
    } finally pool.shutdown()
    dst
  }

  /** Untimed setup Bench runs before its per-query timing loop — shared
    * fixtures that are one-time setup, not per-operator work: the memoized
    * link graph (otherwise whichever graph query happens to run FIRST
    * absorbs the whole build into its timing — ≙ the reference's
    * normalize-once script mode, ppagerank_main.cc:408-467) and the i1
    * base store (pre-exists in production).
    */
  def benchSetup(s: SparkSession, dir: String): Unit = {
    TestdataGraph.linkGraph(s, dir)
    i1BaseStore(s, dir)
    ()
  }

  private def pr5(spark: SparkSession, dir: String): DataFrame = {
    val g = TestdataGraph.linkGraph(spark, dir)
    val (ranks, _) = PageRank.run(g, PageRankConfig(alpha = 0.85, tol = 0.0, maxIter = 5))
    ranks.toDF()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- scans / transcript derivation (S1-S4; per-turn text equality) ----
    "s1_scan_transcripts" -> ((s, dir) =>
      TestdataGraph.transcripts(s, dir)
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")),

    // ---- graph kernels (C1, C2, C5/C13/K2, C6) ----
    "c1_normalize" -> ((s, dir) =>
      TestdataGraph.linkGraph(s, dir).edges.toDF()
        .select(col("src"), col("dst"), round(col("weight"), 8).as("weight"))),

    "c2_spmv" -> ((s, dir) => {
      val g = TestdataGraph.linkGraph(s, dir)
      val prep = PageRank.prepare(g, PageRankConfig())
      val x0 = g.vertices.withColumn("rank", lit(1.0 / g.numVertices))
      PageRank.spmv(prep, x0).select(col("id"), round(col("y"), 8).as("y"))
    }),

    "k2_stats" -> ((s, dir) => {
      val g = TestdataGraph.linkGraph(s, dir)
      val nDang = GraphOps.danglingVertices(g).count()
      val rowAgg = g.edges.groupBy(col("src"))
        .agg(sum(col("weight")).as("s"), count(lit(1)).as("d"))
        .agg(max(col("s")), min(col("d")), max(col("d"))).head()
      val colAgg = g.edges.groupBy(col("dst"))
        .agg(sum(col("weight")).as("s"), count(lit(1)).as("d"))
        .agg(max(col("s")), min(col("d")), max(col("d"))).head()
      import s.implicits._
      Seq((g.numVertices, g.numEdges, nDang,
        BigDecimal(colAgg.getDouble(0)).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(rowAgg.getDouble(0)).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble,
        rowAgg.getLong(1), rowAgg.getLong(2), colAgg.getLong(1), colAgg.getLong(2)))
        .toDF("n_vertices", "n_edges", "n_dangling", "norm_1", "norm_inf",
          "min_outdeg", "max_outdeg", "min_indeg", "max_indeg")
    }),

    // C1-transposed (-trans): normalization over the reversed edge list ≙
    // the reference's colsum + right diagonal scale (ppagerank.cc:183-209)
    "c1t_normalize_trans" -> ((s, dir) =>
      TestdataGraph.linkGraphTrans(s, dir).edges.toDF()
        .select(col("src"), col("dst"), round(col("weight"), 8).as("weight"))),

    "c6_dangling" -> ((s, dir) =>
      GraphOps.danglingVertices(TestdataGraph.linkGraph(s, dir))),

    // ---- algorithms (A2 power method, CC, LP, triangles) ----
    "a2_pagerank5" -> ((s, dir) =>
      pr5(s, dir).select(col("id"), round(col("rank"), 8).as("rank"))),

    "k3_toprank" -> ((s, dir) => {
      val r = pr5(s, dir).select(col("id"), round(col("rank"), 8).as("rank"))
      // distributed top-k (TakeOrderedAndProject) FIRST, then rank the 10
      // survivors — a global row_number window would move all rows to one
      // partition
      val top = r.orderBy(desc("rank"), asc("id")).limit(10)
      val w = Window.orderBy(desc("rank"), asc("id"))
      top.withColumn("rk", row_number().over(w).cast("long"))
    }),

    // value-exact: both solvers drive the residual to ~1e-13 (CGS2 arnoldi,
    // inner-outer then power), where the iterate agrees with the DuckDB
    // 160-iteration power fixed point (itself converged past 1e-12) to
    // ~1e-12 — 6 decimal places compare exactly with ~1e-4 flip risk
    "a3_inout" -> ((s, dir) => {
      val g = TestdataGraph.linkGraph(s, dir)
      InOutPageRank.run(g, InOutPageRank.InOutConfig(tol = 1e-13, maxIter = 300))._1
        .toDF().select(col("id"), round(col("rank"), 6).as("rank"))
    }),

    "a4_arnoldi" -> ((s, dir) => {
      val g = TestdataGraph.linkGraph(s, dir)
      ArnoldiPageRank.run(g, ArnoldiPageRank.ArnoldiConfig(tol = 1e-12, k = 8,
        maxRestarts = 30))._1
        .toDF().select(col("id"), round(col("rank"), 6).as("rank"))
    }),

    // batched multi-seed personalized PageRank: k teleport-indicator
    // vectors solved in ONE join+job per iteration (value-exact vs the
    // per-seed unrolled DuckDB twin)
    "a5_ppr_multiseed" -> ((s, dir) => {
      val g = TestdataGraph.linkGraph(s, dir)
      val (long, _) = PageRank.runMultiSeed(g, Seq(1L, 5L),
        PageRankConfig(alpha = 0.85, tol = 0.0, maxIter = 5))
      long.select(col("id"), col("seed"), round(col("rank"), 8).as("rank"))
    }),

    "cc_components" -> ((s, dir) => {
      val g = TestdataGraph.linkGraph(s, dir)
      ConnectedComponents.run(g.edges, g.vertices)
    }),

    "lp_labelprop3" -> ((s, dir) => {
      val g = TestdataGraph.linkGraph(s, dir)
      LabelPropagation.run(g.edges, g.vertices, rounds = 3)
    }),

    "tc_triangles" -> ((s, dir) => {
      val g = TestdataGraph.linkGraph(s, dir)
      import s.implicits._
      Seq(Triangles.count(g.edges)).toDF("triangles")
    }),

    // per-vertex triangle participation, on the same degree-oriented wedge
    // kernel as the total count (hub-safe at scale)
    "tc2_triangles_pervertex" -> ((s, dir) => {
      val g = TestdataGraph.linkGraph(s, dir)
      Triangles.perVertex(g.edges, g.vertices)
    }),

    // ---- relational coverage (agg/join/window/set-ops/sessionize) ----
    "r1_agg_pushdown" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .where(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-01 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
          round(avg(col("l_discount")), 8).as("avg_disc"),
          count(lit(1)).as("n"))),

    "r2_join_agg" -> ((s, dir) => {
      val l = s.read.parquet(s"$dir/lineitem.parquet")
      val o = s.read.parquet(s"$dir/orders.parquet")
      val c = s.read.parquet(s"$dir/customer.parquet")
      val n = s.read.parquet(s"$dir/nation.parquet")
      val r = s.read.parquet(s"$dir/region.parquet")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name").as("nation"), col("r_name").as("region"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
    }),

    "r3_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= 3)
    }),

    "r4_setops" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet").select(col("c_custkey"))
      val o = s.read.parquet(s"$dir/orders.parquet")
      c.intersect(o.select(col("o_custkey").as("c_custkey")))
        .except(o.where(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("c_custkey")))
    }),

    "r5_sessionize" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev.select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("gap_us",
          unix_micros(col("ts").cast("timestamp")) -
            unix_micros(lag(col("ts"), 1).over(w).cast("timestamp")))
        .withColumn("is_new", when(col("gap_us").isNull || col("gap_us") > 1800000000L, 1).otherwise(0))
        .withColumn("session_id", sum(col("is_new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"))
        .agg(countDistinct(col("session_id")).as("n_sessions"),
          count(lit(1)).as("n_events"))
    }),

    // ---- text analysis (documents) ----
    "t1_tokens" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
          length(col("text")).cast("long").as("n_chars_m"),
          col("n_chars"))),

    "t2_quality" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          TextAnalysis.stopwordCount(col("text")).cast("long").as("n_stop"),
          round(TextAnalysis.punctRatio(col("text")), 8).as("punct_ratio"))),

    "t3_dedup_exact" -> ((s, dir) =>
      Dedup.exact(s.read.parquet(s"$dir/documents.parquet"))),

    "t4_langid" -> ((s, dir) => // value-exact: DuckDB list_filter twin
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_guess"),
          col("lang"))),

    // value-exact: MD5 over the same whitespace-normalized form the
    // xxhash64 fingerprint uses (that one stays the hot-path kernel,
    // covered by PipelineSpec) + the composite quality score, both
    // recomputed by DuckDB from raw text
    "t5_fingerprint" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          TextAnalysis.fingerprintMd5(col("text")).as("fp_md5"),
          TextAnalysis.qualityScore(col("text")).as("quality"))),

    // ---- dedup family ----
    // value-exact vs the EXHAUSTIVE char-shingle-Jaccard DuckDB twin: at
    // sf0.01 the banded minhash candidate stage has full recall, so the
    // verified output must equal the all-pairs set — completeness AND
    // soundness both oracled (scale recall behavior is PipelineSpec's job)
    "d1_minhash_neardup" -> ((s, dir) =>
      // shared-shingle pipeline: one shingling pass feeds both LSH and verify
      Dedup.minhashNearDup(s.read.parquet(s"$dir/documents.parquet"), threshold = 0.5)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))),

    // simhash-BLOCKED exact-Jaccard near-dup, value-exact vs the SAME
    // exhaustive all-pairs DuckDB twin as d1: with 4-bit chunks the
    // pigeonhole bound covers hamming ≤ 15, which at this scale catches
    // every J ≥ 0.5 pair (verified exhaustively — blocking recall 1.0,
    // guarded by a PipelineSpec test), so with the hamming filter wide open
    // the output equals the exhaustive ground truth and the oracle needs NO
    // engine-pinned candidate list. The hamming-≤-3 sharpening (the
    // production fast path) keeps its coverage in PipelineSpec.
    "d2_simhash_neardup" -> ((s, dir) =>
      Dedup.simhashNearDup(s.read.parquet(s"$dir/documents.parquet"),
        maxHamming = 63, threshold = 0.5, chunkBits = 4)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))),

    "d3_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(s.read.parquet(s"$dir/documents.parquet"), threshold = 0.5)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))),

    // ---- similarity search (embeddings) ----
    "m1_knn_bruteforce" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val corpus = emb.select(col("vec_id").as("id"), col("embedding"))
      val queries = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding"))
      val joined = corpus.join(broadcast(queries.withColumnRenamed("embedding", "qe")))
        .where(col("id") =!= col("qid"))
        .select(col("qid"), col("id"),
          round(Similarity.cosine(col("embedding"), col("qe")), 6).as("cos"))
      val w = Window.partitionBy(col("qid")).orderBy(desc("cos"), asc("id"))
      joined.withColumn("rk", row_number().over(w).cast("long")).where(col("rk") <= 5)
    }),

    // value-exact via pin+verify: the (qid, id, rk) membership is the
    // deterministic LSH output (pinned in the oracle), and DuckDB
    // RE-COMPUTES every emitted cosine from the embeddings — a drifted
    // bucket/probe/ranking kernel changes membership or cos and fails
    "m2_knn_lsh" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      Similarity.lshTopK(
        emb.select(col("vec_id").as("id"), col("embedding")),
        emb.where(col("vec_id") < 10).select(col("vec_id").as("qid"), col("embedding")),
        k = 5, multiprobe = 1)
        .select(col("qid"), col("id"), round(col("cos"), 6).as("cos"),
          col("rk").cast("long").as("rk"))
    }),

    // value-exact via pin+verify (same protocol as m2; centroids are
    // deterministic — hash-ordered sample + fixed Lloyd steps)
    "m4_knn_ivf" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      Similarity.ivfTopK(
        emb.select(col("vec_id").as("id"), col("embedding")),
        emb.where(col("vec_id") < 10).select(col("vec_id").as("qid"), col("embedding")),
        k = 5, nCells = 32, nProbe = 6)
        .select(col("qid"), col("id"), round(col("cos"), 6).as("cos"),
          col("rk").cast("long").as("rk"))
    }),

    "m3_neardup_cosine" -> ((s, dir) => { // value-exact via pin+verify
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("embedding"))
      // testdata embeddings are near-orthogonal random vectors (max pairwise
      // cosine ≈ 0.51) — 0.4 keeps the operator observable at this scale.
      // 63 bands × 1 plane makes the deterministic banding recall-complete
      // here (a cos ≥ 0.4 pair misses all 63 single-plane bands with
      // probability ≤ 0.37^63 ≈ 1e-27; verified exhaustively), so the
      // output equals the all-pairs ground truth and the DuckDB twin needs
      // no engine-pinned membership. Production banding (fewer, wider
      // bands) keeps its recall coverage in PipelineSpec.
      Similarity.cosineNearDup(emb, threshold = 0.4, nBands = 63, planesPerBand = 1)
        .select(col("a"), col("b"), round(col("cos"), 6).as("cos"))
    }),

    // ---- incremental maintenance (streaming extension) ----
    // ~20% of the derived edge pairs arrive "late" as a delta folded into a
    // durable bucketed store via EdgeStore.mergeDelta (bucket-pruned,
    // src-level renormalization). The merged store must equal the batch
    // build VALUE-EXACTLY — the oracle is the full-graph normalization SQL.
    "i1_incremental_merge" -> ((s, dir) => {
      val store = i1BaseStore(s, dir)
      val work = i1CopyStore(s, store)
      ingest.EdgeStore.mergeDelta(s, work,
        s.read.parquet(s"$store/_i1_delta"))
      ingest.EdgeStore.scanNorm(s, work)
        .select(col("src"), col("dst"), round(col("weight"), 8).as("weight"))
    }),

    // ---- multimodal: REAL decode for ALL THREE kinds — image (PNG/
    // ImageIO), audio (WAV/AudioSystem), video (uncompressed RIFF/AVI, DIB
    // frames, hand-rolled parser). d1/d2/d3 are decoded statistics — image
    // (w, h, meanR), audio (rate, nSamples, meanAbs), video (w, h,
    // meanR of the first sampled frame) — that DuckDB reproduces in closed
    // form from media_id, so the oracle fails unless the decode really ran.
    "mm1_media_features" -> ((s, dir) => {
      val media = Multimodal.syntheticMedia(s, 200)
      def d(i: Int) = round(element_at(col("features"), i).cast("double"), 6)
      // d3 back in NATIVE units (0-255 pixel level / PCM amplitude): the
      // float32 feature times the scale rounds exactly to the integer mean,
      // where the normalized float32 itself can cross a decimal-rounding
      // boundary the oracle's float64 doesn't
      val d3 = round(element_at(col("features"), 3).cast("double") *
        when(col("kind") === "audio", lit(32767.0)).otherwise(lit(255.0)))
      Multimodal.extractFeatures(media).toDF()
        .select(col("media_id"), col("kind"), col("feat_dim").cast("long").as("feat_dim"),
          col("frames_sampled").cast("long").as("frames_sampled"), col("ok"),
          d(1).as("d1"), d(2).as("d2"), d3.as("d3"))
    }),

    // ---- ANN quality: recall@5 of the approximate indexes vs the exact
    // top-k, per query. Closes the pin-circularity of m2/m4: the engine
    // computes recall of its LIVE LSH/IVF output against its own brute
    // force, DuckDB computes recall of the PINNED membership against its
    // own exact top-k — the values only agree if membership, exactness, and
    // determinism all hold.
    "m5_knn_recall" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val corpus = emb.select(col("vec_id").as("id"), col("embedding"))
      val queries = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding"))
      val joined = corpus.join(broadcast(queries.withColumnRenamed("embedding", "qe")))
        .where(col("id") =!= col("qid"))
        .select(col("qid"), col("id"),
          round(Similarity.cosine(col("embedding"), col("qe")), 6).as("cos"))
      val w = Window.partitionBy(col("qid")).orderBy(desc("cos"), asc("id"))
      val exact = joined.withColumn("rk", row_number().over(w)).where(col("rk") <= 5)
        .select(col("qid"), col("id"))
      val lsh = Similarity.lshTopK(corpus, queries, k = 5, multiprobe = 1)
        .select(col("qid"), col("id"))
      val ivf = Similarity.ivfTopK(corpus, queries, k = 5, nCells = 32, nProbe = 6)
        .select(col("qid"), col("id"))
      def recall(approx: DataFrame, as: String) =
        exact.join(approx, Seq("qid", "id"), "left_semi")
          .groupBy(col("qid")).agg((count(lit(1)) / 5.0).as(as))
      queries.select(col("qid"))
        .join(recall(lsh, "rl"), Seq("qid"), "left")
        .join(recall(ivf, "ri"), Seq("qid"), "left")
        .select(col("qid"),
          round(coalesce(col("rl"), lit(0.0)), 2).as("recall_lsh"),
          round(coalesce(col("ri"), lit(0.0)), 2).as("recall_ivf"))
    })
  )

  /** Bench-mode variants (consulted by Bench ONLY — Verify always runs
    * `queries`). a3/a4 in `queries` run at oracle-grade tolerances
    * (1e-13 / 1e-12) so the 6-dp DuckDB fixed-point compare is exact; the
    * BENCHMARK should time the solvers at the reference's default tolerance
    * (tol 1e-7, /root/reference/ppagerank.cc:88-89) — deep-tol timings
    * measure the oracle protocol, not the operator.
    */
  def benchOverrides: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a3_inout" -> ((s, dir) => {
      val g = TestdataGraph.linkGraph(s, dir)
      InOutPageRank.run(g, InOutPageRank.InOutConfig(tol = 1e-7))._1.toDF()
    }),
    "a4_arnoldi" -> ((s, dir) => {
      val g = TestdataGraph.linkGraph(s, dir)
      ArnoldiPageRank.run(g, ArnoldiPageRank.ArnoldiConfig(tol = 1e-7))._1.toDF()
    }),
    // d2/m3: the `queries` configs are ORACLE-GRADE — near-exhaustive
    // candidate generation (4-bit simhash chunks / single-plane bands) so
    // the exhaustive all-pairs DuckDB twin is provably matched at sf0.01.
    // Those parameters are deliberately not scale-safe (a single-plane band
    // splits N embeddings into 2 buckets → O(N²) candidates). The bench
    // times the PRODUCTION blocking instead — d2: Manku-standard 4×16-bit
    // chunks, pigeonhole-complete for its hamming ≤ 3 contract; m3: 4
    // bands × 12 planes with the maxBucket guard — whose recall coverage
    // is enforced by PipelineSpec. Same decoupling as a3/a4's deep-tol
    // oracle configs above.
    "d2_simhash_neardup" -> ((s, dir) =>
      Dedup.simhashNearDup(s.read.parquet(s"$dir/documents.parquet"),
        maxHamming = 3, threshold = 0.5, chunkBits = 16)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))),
    "m3_neardup_cosine" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("embedding"))
      Similarity.cosineNearDup(emb, threshold = 0.4)
        .select(col("a"), col("b"), round(col("cos"), 6).as("cos"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "s1_scan_transcripts" -> OracleSql.scanTranscripts,
    "c1_normalize" -> OracleSql.normalize,
    "c1t_normalize_trans" -> OracleSql.normalizeTrans,
    "c2_spmv" -> OracleSql.spmv,
    "k2_stats" -> OracleSql.stats,
    "c6_dangling" -> OracleSql.dangling,
    "a2_pagerank5" -> OracleSql.pagerank(5, 0.85),
    "a5_ppr_multiseed" -> OracleSql.pprMultiSeed(5, 0.85, Seq(1L, 5L)),
    "a3_inout" -> OracleSql.pagerankDeep(160, 0.85, 6),
    "a4_arnoldi" -> OracleSql.pagerankDeep(160, 0.85, 6),
    "t4_langid" -> OracleSql.langId,
    "d3_ngram_jaccard" -> OracleSql.ngramJaccard(3, 0.5, 1000, 6),
    // d1/d2/m3: EXHAUSTIVE all-pairs twins (completeness + soundness — the
    // query-level blocking params are recall-complete at this scale, see
    // the query comments); m2/m4: pin+verify (membership pinned to the
    // deterministic engine output, every value re-computed by DuckDB from
    // raw data) + the m5 recall cross-check
    "d1_minhash_neardup" -> OracleSql.charShingleJaccard(5, 0.5, 6),
    "d2_simhash_neardup" -> OracleSql.charShingleJaccard(5, 0.5, 6),
    "m2_knn_lsh" -> OracleSql.pinnedKnn(OracleSql.Pins.m2Lsh),
    "m4_knn_ivf" -> OracleSql.pinnedKnn(OracleSql.Pins.m4Ivf),
    "m3_neardup_cosine" -> OracleSql.cosinePairsExhaustive(0.4),
    "k3_toprank" -> OracleSql.topRank(5, 0.85, 10),
    "cc_components" -> OracleSql.connectedComponents,
    "lp_labelprop3" -> OracleSql.labelProp(3),
    "tc_triangles" -> OracleSql.triangles,
    "tc2_triangles_pervertex" -> OracleSql.trianglesPerVertex,
    "r1_agg_pushdown" -> OracleSql.aggPushdown,
    "r2_join_agg" -> OracleSql.joinAgg,
    "r3_window_topk" -> OracleSql.windowTopK,
    "r4_setops" -> OracleSql.setOps,
    "r5_sessionize" -> OracleSql.sessionize,
    "t1_tokens" -> OracleSql.tokens,
    "t2_quality" -> OracleSql.quality,
    "t3_dedup_exact" -> OracleSql.dedupExact,
    "m1_knn_bruteforce" -> OracleSql.knn,
    "m5_knn_recall" -> OracleSql.knnRecall(OracleSql.Pins.m2Lsh, OracleSql.Pins.m4Ivf),
    "t5_fingerprint" -> OracleSql.fingerprintQuality,
    "mm1_media_features" -> OracleSql.mediaFeatures(200, 4),
    // the incremental merge must reproduce the batch normalization exactly
    "i1_incremental_merge" -> OracleSql.normalize
  )
}
