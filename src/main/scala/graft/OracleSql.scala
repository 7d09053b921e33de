package graft

/** ANSI SQL oracles (DuckDB dialect-compatible) mirroring each SparkEntry
  * query. The graph oracles share a prelude that re-derives the link graph
  * from `events` with exact-integer arithmetic, so engine/oracle results
  * agree bitwise up to float-rounding (ROUND(x, 8) absorbs summation-order
  * ulps).
  */
object OracleSql {

  /** Shared graph prelude: transcripts view → links (stable turn ordering +
    * consecutive-dup suppression via LAG) → edges/verts/norm.
    * Starts WITH RECURSIVE so CC can extend it.
    */
  val graphPrelude: String = """WITH RECURSIVE t AS (
  SELECT 'u' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
         event_type AS role, props AS text,
         CASE WHEN event_type = 'click' AND user_id % 7 <> 3
              THEN 'invoke:u' || CAST(CAST(FLOOR(value) AS BIGINT) % (SELECT MAX(user_id) + 1 FROM events) AS VARCHAR)
              ELSE NULL END AS tool,
         ts, user_id
  FROM events),
lnk AS (
  SELECT user_id AS src, CAST(SUBSTR(tool, 9) AS BIGINT) AS dst
  FROM (SELECT user_id, tool, turn_idx, conv_id,
               LAG(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_tool
        FROM t) x
  WHERE tool LIKE 'invoke:u%' AND (prev_tool IS NULL OR prev_tool <> tool)),
edges AS (
  SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS mult
  FROM lnk WHERE src <> dst GROUP BY src, dst),
verts AS (
  -- explicit DISTINCT over UNION ALL: under WITH RECURSIVE DuckDB does not
  -- deduplicate a bare UNION in a non-recursive CTE
  SELECT DISTINCT id FROM (
    SELECT user_id AS id FROM events
    UNION ALL
    SELECT dst AS id FROM edges) u),
norm AS (
  SELECT src, dst, mult / SUM(mult) OVER (PARTITION BY src) AS weight FROM edges),
nv AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts)"""

  /** Unrolled power iterations r0..rK as additional CTEs. */
  def pagerankCtes(iters: Int, alpha: Double): String = {
    val sb = new StringBuilder
    sb.append(",\nr0 AS (SELECT id, 1.0 / (SELECT n FROM nv) AS rank FROM verts)")
    for (k <- 1 to iters) {
      sb.append(s""",
y$k AS (SELECT e.dst AS id, SUM(e.weight * r.rank) AS y
        FROM norm e JOIN r${k - 1} r ON e.src = r.id GROUP BY e.dst),
r$k AS (SELECT v.id,
               $alpha * COALESCE(y.y, 0) + (1 - $alpha * (SELECT COALESCE(SUM(y), 0) FROM y$k)) / (SELECT n FROM nv) AS rank
        FROM verts v LEFT JOIN y$k y ON v.id = y.id)""")
    }
    sb.toString
  }

  /** The prelude with every CTE materialized — REQUIRED for deep iteration
    * chains: DuckDB inlines single-referenced CTEs, so an unrolled chain
    * where y_k references r_{k-1} twice re-derives the whole graph 2^k
    * times (file-handle exhaustion ~20 iterations, optimizer blowup later).
    */
  val graphPreludeMat: String = {
    val names = Seq("t", "lnk", "edges", "verts", "norm", "nv")
    names.foldLeft(graphPrelude) { (s, n) =>
      s.replace(s"$n AS (", s"$n AS MATERIALIZED (")
    }
  }

  /** Unrolled power iterations with materialized per-iteration CTEs. */
  def pagerankCtesMat(iters: Int, alpha: Double): String = {
    val sb = new StringBuilder
    sb.append(",\nr0 AS MATERIALIZED (SELECT id, 1.0 / (SELECT n FROM nv) AS rank FROM verts)")
    for (k <- 1 to iters) {
      sb.append(s""",
y$k AS MATERIALIZED (SELECT e.dst AS id, SUM(e.weight * r.rank) AS y
        FROM norm e JOIN r${k - 1} r ON e.src = r.id GROUP BY e.dst),
r$k AS MATERIALIZED (SELECT v.id,
               $alpha * COALESCE(y.y, 0) + (1 - $alpha * (SELECT COALESCE(SUM(y), 0) FROM y$k)) / (SELECT n FROM nv) AS rank
        FROM verts v LEFT JOIN y$k y ON v.id = y.id)""")
    }
    sb.toString
  }

  /** Converged power fixed point (iters deep enough that the iterate is at
    * the float fixed point — 0.85^160 ≈ 5e-12, and measured r160 == r162 to
    * 12 dp on sf0.01), rounded to dp decimals. Oracle for the inout and
    * arnoldi solvers, which converge to the same fixed point.
    */
  def pagerankDeep(iters: Int, alpha: Double, dp: Int): String =
    s"$graphPreludeMat${pagerankCtesMat(iters, alpha)}\n" +
      s"SELECT id, ROUND(rank, $dp) AS rank FROM r$iters"

  val scanTranscripts: String =
    s"$graphPrelude SELECT conv_id, turn_idx, role, text, tool, ts FROM t"

  /** Transposed normalization (-trans): reversed edges, weights divided by
    * the ORIGINAL column sums (the window partitions by pre-alias dst).
    */
  val normalizeTrans: String =
    s"""$graphPrelude
SELECT src, dst, ROUND(weight, 8) AS weight FROM (
  SELECT dst AS src, src AS dst, mult / SUM(mult) OVER (PARTITION BY dst) AS weight
  FROM edges) z"""

  val normalize: String =
    s"$graphPrelude SELECT src, dst, ROUND(weight, 8) AS weight FROM norm"

  val spmv: String =
    s"""$graphPrelude
SELECT e.dst AS id, ROUND(SUM(e.weight * (1.0 / (SELECT n FROM nv))), 8) AS y
FROM norm e GROUP BY e.dst"""

  val stats: String =
    s"""$graphPrelude
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM verts) AS n_vertices,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM norm) AS n_edges,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM verts v
         WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = v.id)) AS n_dangling,
       (SELECT ROUND(MAX(s), 8) FROM (SELECT SUM(weight) AS s FROM norm GROUP BY dst) z) AS norm_1,
       (SELECT ROUND(MAX(s), 8) FROM (SELECT SUM(weight) AS s FROM norm GROUP BY src) z) AS norm_inf,
       (SELECT CAST(MIN(c) AS BIGINT) FROM (SELECT COUNT(*) AS c FROM norm GROUP BY src) z) AS min_outdeg,
       (SELECT CAST(MAX(c) AS BIGINT) FROM (SELECT COUNT(*) AS c FROM norm GROUP BY src) z) AS max_outdeg,
       (SELECT CAST(MIN(c) AS BIGINT) FROM (SELECT COUNT(*) AS c FROM norm GROUP BY dst) z) AS min_indeg,
       (SELECT CAST(MAX(c) AS BIGINT) FROM (SELECT COUNT(*) AS c FROM norm GROUP BY dst) z) AS max_indeg"""

  val dangling: String =
    s"""$graphPrelude
SELECT v.id FROM verts v WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = v.id)"""

  def pagerank(iters: Int, alpha: Double): String =
    s"$graphPrelude${pagerankCtes(iters, alpha)}\nSELECT id, ROUND(rank, 8) AS rank FROM r$iters"

  /** Personalized PageRank unrolled per seed (teleport vector = indicator of
    * the seed vertex; x₀ = v, ω-fold identical to the uniform case but the
    * teleport mass lands only on the seed row), UNION ALL over seeds —
    * the oracle twin of PageRank.runMultiSeed.
    */
  def pprMultiSeed(iters: Int, alpha: Double, seeds: Seq[Long]): String = {
    val ctes = seeds.zipWithIndex.map { case (seed, j) =>
      val sb = new StringBuilder
      sb.append(s""",
r${j}_0 AS (SELECT id, CASE WHEN id = $seed THEN 1.0 ELSE 0.0 END AS rank FROM verts)""")
      for (kk <- 1 to iters) {
        sb.append(s""",
y${j}_$kk AS (SELECT e.dst AS id, SUM(e.weight * r.rank) AS y
        FROM norm e JOIN r${j}_${kk - 1} r ON e.src = r.id GROUP BY e.dst),
r${j}_$kk AS (SELECT v.id,
               $alpha * COALESCE(y.y, 0) + (1 - $alpha * (SELECT COALESCE(SUM(y), 0) FROM y${j}_$kk)) * (CASE WHEN v.id = $seed THEN 1.0 ELSE 0.0 END) AS rank
        FROM verts v LEFT JOIN y${j}_$kk y ON v.id = y.id)""")
      }
      sb.toString
    }.mkString
    val sel = seeds.zipWithIndex.map { case (seed, j) =>
      s"SELECT id, CAST($seed AS BIGINT) AS seed, ROUND(rank, 8) AS rank FROM r${j}_$iters"
    }.mkString("\n", "\nUNION ALL\n", "")
    s"$graphPrelude$ctes$sel"
  }

  def topRank(iters: Int, alpha: Double, k: Int): String =
    s"""$graphPrelude${pagerankCtes(iters, alpha)}
SELECT id, rank, rk FROM (
  SELECT id, ROUND(rank, 8) AS rank,
         CAST(ROW_NUMBER() OVER (ORDER BY ROUND(rank, 8) DESC, id ASC) AS BIGINT) AS rk
  FROM r$iters) z
WHERE rk <= $k"""

  val connectedComponents: String =
    s"""$graphPrelude,
und AS (SELECT DISTINCT a, b FROM (
  SELECT src AS a, dst AS b FROM edges
  UNION ALL
  SELECT dst AS a, src AS b FROM edges) z),
reach AS (
  SELECT id, id AS r FROM verts
  UNION
  SELECT u.b AS id, reach.r FROM reach JOIN und u ON u.a = reach.id
)
SELECT id, CAST(MIN(r) AS BIGINT) AS component FROM reach GROUP BY id"""

  def labelProp(rounds: Int): String = {
    val sb = new StringBuilder(graphPrelude)
    sb.append(""",
dedges AS (SELECT DISTINCT src, dst FROM edges),
l0 AS (SELECT id, id AS label FROM verts)""")
    for (k <- 1 to rounds) {
      sb.append(s""",
v$k AS (SELECT e.dst AS id, l.label, COUNT(*) AS n
        FROM dedges e JOIN l${k - 1} l ON e.src = l.id GROUP BY e.dst, l.label),
w$k AS (SELECT id, label FROM (
          SELECT id, label, ROW_NUMBER() OVER (PARTITION BY id ORDER BY n DESC, label ASC) AS rn
          FROM v$k) z WHERE rn = 1),
l$k AS (SELECT v.id, COALESCE(w.label, l.label) AS label
        FROM verts v JOIN l${k - 1} l ON v.id = l.id LEFT JOIN w$k w ON v.id = w.id)""")
    }
    sb.append(s"\nSELECT id, label FROM l$rounds")
    sb.toString
  }

  val triangles: String =
    s"""$graphPrelude,
und2 AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v FROM edges WHERE src <> dst)
SELECT CAST(COUNT(*) AS BIGINT) AS triangles
FROM und2 e1
JOIN und2 e2 ON e1.u = e2.u AND e1.v < e2.v
JOIN und2 e3 ON e3.u = e1.v AND e3.v = e2.v"""

  /** Per-vertex triangle participation. The engine enumerates each triangle
    * once under its degree orientation; the corner multiset is
    * orientation-invariant, so a plain u<v<w enumeration agrees exactly.
    */
  val trianglesPerVertex: String =
    s"""$graphPrelude,
und2 AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v FROM edges WHERE src <> dst),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM und2 e1
  JOIN und2 e2 ON e1.u = e2.u AND e1.v < e2.v
  JOIN und2 e3 ON e3.u = e1.v AND e3.v = e2.v),
corners AS (
  SELECT a AS id FROM tri
  UNION ALL SELECT b AS id FROM tri
  UNION ALL SELECT c AS id FROM tri),
pc AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS triangles FROM corners GROUP BY id)
SELECT v.id, CAST(COALESCE(pc.triangles, 0) AS BIGINT) AS triangles
FROM verts v LEFT JOIN pc ON v.id = pc.id"""

  // ---- relational coverage (TPC-H-ish) ----

  val aggPushdown: String = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 4) AS sum_qty,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       ROUND(AVG(l_discount), 8) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus"""

  val joinAgg: String = """
SELECT n.n_name AS nation, r.r_name AS region,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name, r.r_name"""

  val windowTopK: String = """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS BIGINT) AS rk
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
      FROM orders) z
WHERE rk <= 3"""

  val setOps: String = """
SELECT c_custkey FROM customer
INTERSECT
SELECT o_custkey AS c_custkey FROM orders
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'"""

  val sessionize: String = """
SELECT user_id,
       CAST(COUNT(DISTINCT session_id) AS BIGINT) AS n_sessions,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM (
  SELECT user_id,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM (
    SELECT user_id, ts, event_id,
           CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  OR epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
                THEN 1 ELSE 0 END AS is_new
    FROM events) a) b
GROUP BY user_id"""

  // ---- text / dedup over documents ----

  val tokens: String = """
SELECT doc_id,
       CAST(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                 ELSE LENGTH(string_split_regex(TRIM(text), '\s+')) END AS BIGINT) AS n_tokens,
       CAST(LENGTH(text) AS BIGINT) AS n_chars_m,
       n_chars
FROM documents"""

  val quality: String = """
SELECT doc_id,
       CAST(len(list_filter(string_split_regex(LOWER(TRIM(text)), '\s+'),
            x -> x IN ('the','a','an','of','and','to','in','is','it','that'))) AS BIGINT) AS n_stop,
       ROUND(CASE WHEN LENGTH(text) = 0 THEN 0
                  ELSE CAST(LENGTH(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) / LENGTH(text) END, 8) AS punct_ratio
FROM documents"""

  val dedupExact: String = """
SELECT doc_id AS id,
       MIN(doc_id) OVER (PARTITION BY regexp_replace(LOWER(TRIM(text)), '\s+', ' ', 'g')) AS keep_id,
       CAST(COUNT(*) OVER (PARTITION BY regexp_replace(LOWER(TRIM(text)), '\s+', ' ', 'g')) AS BIGINT) AS group_size
FROM documents"""

  /** Exact twin of TextAnalysis.langId: per-language marker-token counts,
    * argmax with lexicographically-LARGEST-language tiebreak (Spark's
    * greatest(struct(score, lang)) compares lang on score ties), 'und' when
    * every score is 0.
    */
  val langId: String = """
SELECT doc_id,
       CASE WHEN GREATEST(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
            WHEN s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
            WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
            WHEN s_en >= s_de THEN 'en'
            ELSE 'de' END AS lang_guess,
       lang
FROM (
  SELECT doc_id, lang,
         len(list_filter(toks, x -> x IN ('the','and','of','to','is','that','for','with'))) AS s_en,
         len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','mit','ein'))) AS s_de,
         len(list_filter(toks, x -> x IN ('le','la','les','et','est','que','pour','dans'))) AS s_fr,
         len(list_filter(toks, x -> x IN ('el','la','los','que','es','por','con','para'))) AS s_es
  FROM (SELECT doc_id, lang, string_split_regex(LOWER(text), '\s+') AS toks FROM documents) z) zz"""

  /** Exact twin of Dedup.ngramJaccardPairs: distinct word n-gram sets,
    * df-capped inverted-index candidates, full-set Jaccard ≥ threshold.
    * (The engine joins on xxhash64(gram); identical output barring a 64-bit
    * collision within the corpus.)
    */
  def ngramJaccard(n: Int, threshold: Double, maxDf: Int, dp: Int): String = s"""
WITH d AS MATERIALIZED (
  SELECT doc_id AS id,
         list_distinct(list_transform(range(len(toks) - ${n - 1}),
           i -> array_to_string(list_slice(toks, i + 1, i + $n), ' '))) AS grams
  FROM (SELECT doc_id, string_split_regex(LOWER(TRIM(text)), '\\s+') AS toks FROM documents) z
  WHERE len(toks) >= $n),
inv AS MATERIALIZED (SELECT id, unnest(grams) AS g FROM d),
rare AS MATERIALIZED (SELECT g FROM inv GROUP BY g HAVING COUNT(*) <= $maxDf),
capped AS MATERIALIZED (SELECT i.id, i.g FROM inv i JOIN rare r ON i.g = r.g),
cand AS MATERIALIZED (
  SELECT DISTINCT l.id AS a, r.id AS b
  FROM capped l JOIN capped r ON l.g = r.g AND l.id < r.id),
scored AS (
  SELECT c.a, c.b,
         CAST(len(list_intersect(da.grams, db.grams)) AS DOUBLE) /
           len(list_distinct(list_concat(da.grams, db.grams))) AS j
  FROM cand c JOIN d da ON da.id = c.a JOIN d db ON db.id = c.b)
SELECT a, b, ROUND(j, $dp) AS jaccard FROM scored WHERE j >= $threshold"""

  /** Exhaustive char-k-shingle Jaccard near-dup twin of
    * Dedup.minhashNearDup: ALL pairs (no LSH), distinct k-gram sets of the
    * whitespace-normalized lowercased text, threshold filter. The engine
    * computes Jaccard over xxhash64'd shingles (identical barring a 64-bit
    * within-pair collision). Value-exact AND complete: at sf0.01 the banded
    * minhash candidate stage has full recall, so the engine's verified
    * output must equal this exhaustive set pair-for-pair — any lost
    * candidate or drifted Jaccard fails the compare.
    */
  def charShingleJaccard(k: Int, threshold: Double, dp: Int): String = s"""
WITH d AS MATERIALIZED (
  SELECT doc_id AS id,
         list_distinct(list_transform(range(1, GREATEST(LENGTH(norm) - ${k - 1}, 0) + 1),
           i -> norm[i : i + ${k - 1}])) AS sh
  FROM (SELECT doc_id, regexp_replace(LOWER(TRIM(text)), '\\s+', ' ', 'g') AS norm FROM documents) z
  WHERE LENGTH(norm) >= $k)
SELECT a.id AS a, b.id AS b,
       ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         len(list_distinct(list_concat(a.sh, b.sh))), $dp) AS jaccard
FROM d a JOIN d b ON a.id < b.id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
      len(list_distinct(list_concat(a.sh, b.sh))) >= $threshold"""

  /** Exhaustive all-pairs embedding-cosine near-dup twin (the m3 oracle):
    * 500 vectors → 125k pairs is trivial for DuckDB, and the engine's
    * query-level banding is recall-complete at this scale (63 single-plane
    * bands), so the engine output must EQUAL this ground truth — no
    * engine-pinned membership anywhere in the check.
    */
  def cosinePairsExhaustive(threshold: Double): String = s"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
SELECT a.vec_id AS a, b.vec_id AS b,
       ROUND(list_cosine_similarity(a.emb, b.emb), 6) AS cos
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.emb, b.emb) >= $threshold"""

  /** Pin+verify oracle for ANN top-k (LSH / IVF): (qid, id, rk) membership
    * is the engine's deterministic output (deterministic hyperplanes /
    * hash-ordered centroid sample), pinned; DuckDB re-computes every
    * emitted cosine from the embeddings table.
    */
  def pinnedKnn(rows: Seq[(Long, Long, Int)]): String = {
    val vals = rows.map { case (q, i, r) => s"($q, $i, $r)" }.mkString(", ")
    s"""
WITH pins(qid, id, rk) AS (VALUES $vals),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
SELECT CAST(p.qid AS BIGINT) AS qid, CAST(p.id AS BIGINT) AS id,
       ROUND(list_cosine_similarity(c.emb, q.emb), 6) AS cos,
       CAST(p.rk AS BIGINT) AS rk
FROM pins p JOIN e q ON q.vec_id = p.qid JOIN e c ON c.vec_id = p.id"""
  }

  /** Engine outputs pinned for the REMAINING pin+verify oracles (m2/m4 ANN
    * top-k, whose quality is additionally cross-checked against exact
    * ground truth by m5's recall oracle) — regenerate with
    * `tools/gen_pins.py` after any change to the hash kernels, LSH/IVF
    * parameters, or thresholds (the queries are deterministic functions of
    * the sf0.01 testdata, independent of partitioning and core count).
    * d2/m3 retired their pins in round 5: their oracles are exhaustive
    * all-pairs twins.
    */
  object Pins {
    val m2Lsh: Seq[(Long, Long, Int)] = Seq(
      (0, 257, 1), (0, 270, 2), (0, 130, 3), (0, 266, 4), (0, 351, 5),
      (1, 210, 1), (1, 129, 2), (1, 242, 3), (1, 466, 4), (1, 367, 5),
      (2, 198, 1), (2, 307, 2), (2, 327, 3), (2, 209, 4), (2, 351, 5),
      (3, 437, 1), (3, 428, 2), (3, 403, 3), (3, 457, 4), (3, 350, 5),
      (4, 280, 1), (4, 237, 2), (4, 139, 3), (4, 419, 4), (4, 99, 5),
      (5, 419, 1), (5, 379, 2), (5, 46, 3), (5, 24, 4), (5, 451, 5),
      (6, 260, 1), (6, 78, 2), (6, 179, 3), (6, 404, 4), (6, 443, 5),
      (7, 86, 1), (7, 137, 2), (7, 108, 3), (7, 275, 4), (7, 362, 5),
      (8, 102, 1), (8, 44, 2), (8, 379, 3), (8, 225, 4), (8, 472, 5),
      (9, 414, 1), (9, 449, 2), (9, 427, 3), (9, 253, 4), (9, 399, 5))
      .map { case (q, i, r) => (q.toLong, i.toLong, r) }

    val m4Ivf: Seq[(Long, Long, Int)] = Seq(
      (0, 365, 1), (0, 387, 2), (0, 423, 3), (0, 73, 4), (0, 320, 5),
      (1, 386, 1), (1, 27, 2), (1, 407, 3), (1, 195, 4), (1, 64, 5),
      (2, 117, 1), (2, 450, 2), (2, 145, 3), (2, 320, 4), (2, 418, 5),
      (3, 130, 1), (3, 149, 2), (3, 343, 3), (3, 174, 4), (3, 231, 5),
      (4, 114, 1), (4, 496, 2), (4, 482, 3), (4, 280, 4), (4, 249, 5),
      (5, 419, 1), (5, 359, 2), (5, 316, 3), (5, 225, 4), (5, 453, 5),
      (6, 252, 1), (6, 270, 2), (6, 403, 3), (6, 271, 4), (6, 381, 5),
      (7, 340, 1), (7, 425, 2), (7, 209, 3), (7, 334, 4), (7, 445, 5),
      (8, 497, 1), (8, 173, 2), (8, 207, 3), (8, 321, 4), (8, 326, 5),
      (9, 49, 1), (9, 489, 2), (9, 414, 3), (9, 198, 4), (9, 259, 5))
      .map { case (q, i, r) => (q.toLong, i.toLong, r) }
  }

  /** Twin of TextAnalysis.fingerprintMd5 + qualityScore: MD5 of the
    * whitespace-normalized lowercased text, and the composite quality score
    * recomputed term by term (token count / stopword ratio / punctuation
    * ratio / mean token length gates — same thresholds, same weights). The
    * score's value set is a small grid of one- and two-decimal sums, so
    * ROUND(…, 6) can never sit on a rounding boundary.
    */
  val fingerprintQuality: String = """
SELECT doc_id,
       md5(regexp_replace(LOWER(TRIM(text)), '\s+', ' ', 'g')) AS fp_md5,
       ROUND(
         (CASE WHEN n_tok BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.25 END) * 0.4 +
         (CASE WHEN (CASE WHEN n_tok = 0 THEN 0.0 ELSE CAST(n_stop AS DOUBLE) / n_tok END) >= 0.01 THEN 1.0 ELSE 0.5 END) * 0.2 +
         (CASE WHEN punct <= 0.2 THEN 1.0 ELSE 0.5 END) * 0.2 +
         (CASE WHEN mean_tok_len >= 2.0 AND mean_tok_len <= 12.0 THEN 1.0 ELSE 0.5 END) * 0.2,
         6) AS quality
FROM (
  SELECT doc_id, text,
         CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
              ELSE LENGTH(string_split_regex(TRIM(text), '\s+')) END AS n_tok,
         len(list_filter(string_split_regex(LOWER(TRIM(text)), '\s+'),
             x -> x IN ('the','a','an','of','and','to','in','is','it','that'))) AS n_stop,
         CASE WHEN LENGTH(text) = 0 THEN 0.0
              ELSE CAST(LENGTH(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) / LENGTH(text) END AS punct,
         CASE WHEN (CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                         ELSE LENGTH(string_split_regex(TRIM(text), '\s+')) END) = 0 THEN 0.0
              ELSE CAST(LENGTH(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) /
                   (CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                         ELSE LENGTH(string_split_regex(TRIM(text), '\s+')) END) END AS mean_tok_len
  FROM documents) z"""

  /** Twin of the mm1 media-features query: the synthetic media content is a
    * closed-form function of media_id (solid-color PNG, constant-amplitude
    * WAV — Multimodal.scala keeps the formulas in sync), so the DECODED
    * statistics are reproducible without any codec: the engine's values can
    * only match if ImageIO/AudioSystem actually parsed the payloads. Video
    * (the one stubbed kind) contributes NULL decoded columns.
    */
  def mediaFeatures(n: Int, frameCount: Int): String = s"""
WITH m AS (
  SELECT range AS media_id,
         CASE range % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind
  FROM range(0, $n))
SELECT media_id, kind,
       CAST(CASE kind WHEN 'image' THEN 5 WHEN 'audio' THEN 3
                      ELSE 2 + 3 * LEAST($frameCount, 2 + media_id % 4) END AS BIGINT) AS feat_dim,
       CAST(CASE kind WHEN 'video' THEN LEAST($frameCount, 2 + media_id % 4)
                      ELSE 1 END AS BIGINT) AS frames_sampled,
       TRUE AS ok,
       CASE kind WHEN 'image' THEN CAST(8 + media_id % 9 AS DOUBLE)
                 WHEN 'audio' THEN 8000.0
                 ELSE CAST(8 + media_id % 5 AS DOUBLE) END AS d1,
       CASE kind WHEN 'image' THEN CAST(8 + media_id % 7 AS DOUBLE)
                 WHEN 'audio' THEN CAST(800 + (media_id % 5) * 160 AS DOUBLE)
                 ELSE CAST(6 + media_id % 3 AS DOUBLE) END AS d2,
       CASE kind WHEN 'image' THEN CAST((media_id * 7) % 256 AS DOUBLE)
                 WHEN 'audio' THEN CAST(1000 + (media_id % 100) * 10 AS DOUBLE)
                 ELSE CAST((media_id * 7) % 256 AS DOUBLE) END AS d3
FROM m"""

  /** Recall@k cross-check for the ANN indexes: DuckDB computes the EXACT
    * top-5 from the embeddings and scores the PINNED engine memberships
    * against it; the engine (SparkEntry m5) scores its LIVE LSH/IVF output
    * against its own brute force. Equal values prove the pinned membership
    * is the live membership AND quantify its quality against ground truth —
    * this is the non-circular completeness check the pin+verify protocol
    * alone lacks.
    */
  def knnRecall(lsh: Seq[(Long, Long, Int)], ivf: Seq[(Long, Long, Int)]): String = {
    def vals(rows: Seq[(Long, Long, Int)]) =
      rows.map { case (q, i, r) => s"($q, $i, $r)" }.mkString(", ")
    s"""
WITH exact AS (
  SELECT qid, id FROM (
    SELECT q.vec_id AS qid, c.vec_id AS id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY ROUND(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 6) DESC, c.vec_id ASC) AS rk
    FROM embeddings c, embeddings q
    WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id) z
  WHERE rk <= 5),
lsh(qid, id, rk) AS (VALUES ${vals(lsh)}),
ivf(qid, id, rk) AS (VALUES ${vals(ivf)}),
q AS (SELECT DISTINCT qid FROM exact)
SELECT q.qid,
       ROUND((SELECT COUNT(*) FROM lsh l JOIN exact e ON e.qid = l.qid AND e.id = l.id
              WHERE l.qid = q.qid) / 5.0, 2) AS recall_lsh,
       ROUND((SELECT COUNT(*) FROM ivf i JOIN exact e ON e.qid = i.qid AND e.id = i.id
              WHERE i.qid = q.qid) / 5.0, 2) AS recall_ivf
FROM q"""
  }

  val knn: String = """
SELECT qid, id, cos, rk FROM (
  SELECT q.vec_id AS qid, c.vec_id AS id,
         ROUND(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 6) AS cos,
         CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id
              ORDER BY ROUND(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 6) DESC, c.vec_id ASC) AS BIGINT) AS rk
  FROM embeddings c, embeddings q
  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id) z
WHERE rk <= 5"""
}
