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
