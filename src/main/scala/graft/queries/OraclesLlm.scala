package graft.queries

/** DuckDB oracles for the §2c LLM-pipeline queries. dedup_minhash,
  * dedup_simhash and ann_lsh_topk are intentionally absent (hash
  * families aren't SQL-expressible) — they get the driver's rows-only
  * check plus ScalaTest specs.
  */
object OraclesLlm {

  /** double-precision dot with explicit element order, mirroring
    * Similarity.dot's zip_with+aggregate left fold.
    */
  private def dot(a: String, b: String) =
    s"list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
  private def cos(a: String, b: String) =
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"

  private val stopEn = "'the','and','of','to','a','in','is','that'"

  // mirror of Search.bm25TopK (terms spark/merge/window, k=10):
  // identical exact-long tf/dl/N/S/df, the SAME cleared-rational
  // tf-saturation 22·S·tf/(10·S·tf+3·S+9·N·dl), idf rounded to 6dp
  // before use on BOTH engines (pins the ≤1-ulp libm ln drift), and
  // the same left-to-right 3-term sum. Shared verbatim by
  // search_bm25_indexed — the persisted-postings spelling must be
  // hash-IDENTICAL to the from-scratch one.
  private def bm25SqlK(limit: Int,
                       where: String = "text IS NOT NULL") =
      s"""WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        |  FROM documents WHERE $where
        |), perdoc AS (
        |  SELECT doc_id, count(*) AS dl,
        |         sum(CASE WHEN tok = 'spark' THEN 1 ELSE 0 END) AS tf0,
        |         sum(CASE WHEN tok = 'merge' THEN 1 ELSE 0 END) AS tf1,
        |         sum(CASE WHEN tok = 'window' THEN 1 ELSE 0 END) AS tf2
        |  FROM tok GROUP BY doc_id
        |), gl0 AS (
        |  SELECT count(*) AS n, sum(dl) AS s,
        |         sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
        |         sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
        |         sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
        |  FROM perdoc
        |), gl AS (
        |  SELECT doc_id,
        |    (CASE WHEN tf0 > 0 THEN
        |       round(ln(CAST(2*n + 2 AS DOUBLE) / CAST(2*df0 + 1 AS DOUBLE)), 6)
        |       * (CAST(22*s*tf0 AS DOUBLE) / CAST(10*s*tf0 + 3*s + 9*n*dl AS DOUBLE))
        |     ELSE CAST(0 AS DOUBLE) END
        |     + CASE WHEN tf1 > 0 THEN
        |       round(ln(CAST(2*n + 2 AS DOUBLE) / CAST(2*df1 + 1 AS DOUBLE)), 6)
        |       * (CAST(22*s*tf1 AS DOUBLE) / CAST(10*s*tf1 + 3*s + 9*n*dl AS DOUBLE))
        |     ELSE CAST(0 AS DOUBLE) END
        |     + CASE WHEN tf2 > 0 THEN
        |       round(ln(CAST(2*n + 2 AS DOUBLE) / CAST(2*df2 + 1 AS DOUBLE)), 6)
        |       * (CAST(22*s*tf2 AS DOUBLE) / CAST(10*s*tf2 + 3*s + 9*n*dl AS DOUBLE))
        |     ELSE CAST(0 AS DOUBLE) END) AS score
        |  FROM perdoc CROSS JOIN gl0
        |)
        |SELECT CAST(row_number() OVER (ORDER BY round(score, 6) DESC, doc_id)
        |            AS BIGINT) AS rnk,
        |       doc_id, round(score, 6) AS score
        |FROM gl WHERE round(score, 6) > 0
        |ORDER BY round(score, 6) DESC, doc_id LIMIT $limit""".stripMargin

  private val bm25Sql = bm25SqlK(10)

  // mirror of Curation.dsirScores (target = lang 'en', K=1024
  // hashed-bigram buckets): exact long bucket counts, the cleared
  // rational (2t+1)(2C+K)/((2T+K)(2c+1)), per-bucket ln pinned to
  // integer micro-units, exact long per-doc sum, one final divide.
  // Shared verbatim by score_importance and score_importance_indexed;
  // the store-incremental spelling passes the lifecycle's live-row
  // predicate (both the fit and the scoring run over the live set).
  private def dsirSqlW(where: String) =
      s"""WITH bg AS (
        |  SELECT doc_id, lang = 'en' AS is_t,
        |         ('0x' || substr(md5(g), 1, 15))::BIGINT % 1024 AS b
        |  FROM (
        |    SELECT doc_id, lang, unnest(
        |      [array_to_string(toks[i:i+1], ' ')
        |       FOR i IN range(1, greatest(len(toks)-2, 0)+2)]) AS g
        |    FROM (SELECT doc_id, lang, string_split(lower(text), ' ') AS toks
        |          FROM documents WHERE $where)
        |  )
        |), cnt AS (
        |  SELECT b, count(*) AS c,
        |         sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS t
        |  FROM bg GROUP BY b
        |), tot AS (
        |  SELECT sum(c) AS ctot, sum(t) AS ttot FROM cnt
        |), lw AS (
        |  SELECT b, CAST(round(ln(
        |      CAST((2*t + 1) * (2*ctot + 1024) AS DOUBLE) /
        |      CAST((2*ttot + 1024) * (2*c + 1) AS DOUBLE)) * 1000000, 0)
        |      AS BIGINT) AS lw
        |  FROM cnt CROSS JOIN tot
        |)
        |SELECT bg.doc_id, count(*) AS n_bigrams,
        |       round(CAST(sum(lw.lw) AS DOUBLE) / 1000000, 6) AS logratio
        |FROM bg JOIN lw ON bg.b = lw.b
        |GROUP BY bg.doc_id ORDER BY bg.doc_id""".stripMargin

  private val dsirSql = dsirSqlW("TRUE")

  /** the lifecycle store's live-row predicate (see
    * LlmOps.lifecycleDocsStore): the %17 tombstone scopes over the
    * first three quarters only
    */
  private val lifecycleLive =
    "NOT (doc_id % 17 = 3 AND doc_id % 4 < 3)"

  val all: Map[String, String] = mapped +
    // the index-only incremental spelling serves IDENTICAL rows to
    // the from-scratch incremental (the extent's tokens are
    // exactly-equal on both sides, so the b-side slice hashes the
    // same text) — same mirror, so artifact-vs-fresh drift is a hash
    // mismatch, the bm25_indexed convention
    ("dedup_exact_substring_indexed" -> mapped("dedup_exact_substring_incr"))

  private lazy val mapped: Map[String, String] = Map(
    "search_bm25" -> bm25Sql,

    // the store-incremental spelling serves the LIVE docs: the %17
    // keys were deleted BEFORE the %4==3 quarter was appended, so
    // exactly the (%17 ∧ %4<3) docs are gone — same shared mirror
    // over that predicate, hash-identical end-to-end
    "search_bm25_store_incr" -> bm25SqlK(10,
      "text IS NOT NULL AND NOT (doc_id % 17 = 3 AND doc_id % 4 < 3)"),
    // the persisted-postings spelling serves the IDENTICAL result —
    // same mirror, so any drift between the from-scratch and indexed
    // plans is a hash mismatch
    "search_bm25_indexed" -> bm25Sql,

    // mirror of Search.hybridRrf: the bm25SqlK(50) leg verbatim, the
    // ann_cosine leg for qid=7 (same order-preserving dot fold),
    // RRF fusion 1/(60+rank) as CAST(1 AS DOUBLE)/(60+r) — one IEEE
    // division of exact ints per leg, absent legs contribute 0 and
    // report rank 0.
    "search_hybrid_rrf" ->
      s"""WITH lex AS (
        |  SELECT doc_id, rnk AS lex_rnk FROM (${bm25SqlK(50)}) t
        |), sem AS (
        |  SELECT doc_id, sem_rnk FROM (
        |    SELECT c.vec_id AS doc_id,
        |      CAST(row_number() OVER (
        |        ORDER BY round(${cos("qv", "c.embedding")}, 6) DESC,
        |                 c.vec_id ASC) AS BIGINT) AS sem_rnk
        |    FROM embeddings c,
        |         (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7) q
        |    WHERE c.vec_id <> 7
        |  ) WHERE sem_rnk <= 50
        |), fused AS (
        |  SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
        |    coalesce(l.lex_rnk, 0) AS lex_rnk,
        |    coalesce(s.sem_rnk, 0) AS sem_rnk,
        |    round(CASE WHEN l.doc_id IS NOT NULL
        |            THEN CAST(1 AS DOUBLE) / (60 + l.lex_rnk) ELSE 0 END
        |        + CASE WHEN s.doc_id IS NOT NULL
        |            THEN CAST(1 AS DOUBLE) / (60 + s.sem_rnk) ELSE 0 END,
        |        9) AS rrf
        |  FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
        |)
        |SELECT CAST(row_number() OVER (ORDER BY rrf DESC, doc_id)
        |            AS BIGINT) AS rnk,
        |       doc_id, lex_rnk, sem_rnk, rrf
        |FROM fused ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,

    // mirror of Search.phraseSearch("merge sort"): 1-based positional
    // posting lists joined on consecutive positions, counts per doc.
    "search_phrase" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks
        |  FROM documents WHERE text IS NOT NULL
        |), pos AS (
        |  SELECT doc_id, toks[i] AS tok, i
        |  FROM base CROSS JOIN LATERAL
        |    unnest(range(1, len(toks) + 1)) t(i)
        |)
        |SELECT a.doc_id, count(*) AS n_matches
        |FROM pos a JOIN pos b
        |  ON a.doc_id = b.doc_id AND b.i = a.i + 1
        |WHERE a.tok = 'merge' AND b.tok = 'sort'
        |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS keep_id
        |FROM documents GROUP BY h ORDER BY h""".stripMargin,

    // end-to-end mirror of Dedup.minhashLshPortable: md5-based token
    // hash (top 60 bits mod p) through the SAME (a·x+b) mod p family
    // as the native kernel — the constants are interpolated from
    // graft.functions.MinHash.permParams so Spark and oracle can
    // never drift — then 8×4 banding, candidate pairs from shared
    // band buckets, matching-position verification. k=32 ⟹
    // est ≥ 0.5 ⟺ matches ≥ 16.
    "dedup_minhash_banded" -> {
      val p = graft.functions.MinHash.MersenneP
      val perms = graft.functions.MinHash.permParams(32).zipWithIndex
        .map { case ((a, b), i) => s"($i, ${a}::BIGINT, ${b}::BIGINT)" }
        .mkString(", ")
      s"""WITH base AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
         |), sh AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    [array_to_string(toks[i:i+2], ' ')
         |     FOR i IN range(1, greatest(len(toks)-3, 0)+2)])) AS shingle
         |  FROM base
         |), xs AS (
         |  SELECT doc_id,
         |         ('0x' || substr(md5(shingle), 1, 15))::BIGINT % $p AS x
         |  FROM sh
         |), perms(i, pa, pb) AS (
         |  SELECT * FROM (VALUES $perms) t(i, pa, pb)
         |), sig AS (
         |  SELECT doc_id, p.i,
         |         min(((x * p.pa) % $p + p.pb) % $p) AS h
         |  FROM xs CROSS JOIN perms p
         |  GROUP BY doc_id, p.i
         |), sigarr AS (
         |  SELECT doc_id, list(h ORDER BY i) AS sig FROM sig GROUP BY doc_id
         |), banded AS (
         |  SELECT doc_id, sig, t.bd,
         |         md5(array_to_string(sig[t.bd*4+1:t.bd*4+4], ',')) AS bucket
         |  FROM sigarr CROSS JOIN range(0, 8) t(bd)
         |  QUALIFY count(*) OVER (PARTITION BY bd, bucket) <= 10000
         |), cand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
         |                  x.sig AS siga, y.sig AS sigb
         |  FROM banded x JOIN banded y
         |    ON x.bd = y.bd AND x.bucket = y.bucket AND x.doc_id < y.doc_id
         |), m AS (
         |  SELECT a, b, unnest(siga) AS ha, unnest(sigb) AS hb FROM cand
         |), v AS (
         |  SELECT a, b, sum(CASE WHEN ha = hb THEN 1 ELSE 0 END) AS matches
         |  FROM m GROUP BY a, b
         |)
         |SELECT a, b, round(matches / 32.0, 6) AS est_jaccard
         |FROM v WHERE matches >= 16
         |ORDER BY a, b""".stripMargin
    },

    // mirror of Dedup.minhashEstimatorEval: the dedup_minhash_banded
    // signature/banding chain, then per candidate pair the exact
    // shingle-set intersection/union beside the estimate — exact
    // integer micro-units, floored division on both engines
    "dedup_est_eval" -> {
      val p = graft.functions.MinHash.MersenneP
      val perms = graft.functions.MinHash.permParams(32).zipWithIndex
        .map { case ((a, b), i) => s"($i, ${a}::BIGINT, ${b}::BIGINT)" }
        .mkString(", ")
      s"""WITH base AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
         |), sh AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    [array_to_string(toks[i:i+2], ' ')
         |     FOR i IN range(1, greatest(len(toks)-3, 0)+2)])) AS shingle
         |  FROM base
         |), xs AS (
         |  SELECT doc_id,
         |         ('0x' || substr(md5(shingle), 1, 15))::BIGINT % $p AS x
         |  FROM sh
         |), perms(i, pa, pb) AS (
         |  SELECT * FROM (VALUES $perms) t(i, pa, pb)
         |), sig AS (
         |  SELECT doc_id, p.i,
         |         min(((x * p.pa) % $p + p.pb) % $p) AS h
         |  FROM xs CROSS JOIN perms p
         |  GROUP BY doc_id, p.i
         |), sigarr AS (
         |  SELECT doc_id, list(h ORDER BY i) AS sig FROM sig GROUP BY doc_id
         |), banded AS (
         |  SELECT doc_id, sig, t.bd,
         |         md5(array_to_string(sig[t.bd*4+1:t.bd*4+4], ',')) AS bucket
         |  FROM sigarr CROSS JOIN range(0, 8) t(bd)
         |  QUALIFY count(*) OVER (PARTITION BY bd, bucket) <= 10000
         |), cand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
         |                  x.sig AS siga, y.sig AS sigb
         |  FROM banded x JOIN banded y
         |    ON x.bd = y.bd AND x.bucket = y.bucket AND x.doc_id < y.doc_id
         |), m AS (
         |  SELECT a, b, unnest(siga) AS ha, unnest(sigb) AS hb FROM cand
         |), v AS (
         |  SELECT a, b,
         |    CAST(sum(CASE WHEN ha = hb THEN 1 ELSE 0 END) AS BIGINT)
         |      AS matches
         |  FROM m GROUP BY a, b
         |), sz AS (
         |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
         |), ix AS (
         |  SELECT v.a, v.b, count(*) AS inter
         |  FROM v
         |  JOIN sh sa ON sa.doc_id = v.a
         |  JOIN sh sb ON sb.doc_id = v.b AND sb.shingle = sa.shingle
         |  GROUP BY v.a, v.b
         |)
         |SELECT v.a, v.b, v.matches,
         |  CAST(coalesce(ix.inter, 0) AS BIGINT) AS inter,
         |  CAST(za.n + zb.n - coalesce(ix.inter, 0) AS BIGINT) AS uni,
         |  v.matches * 31250 AS est_micro,
         |  CAST((coalesce(ix.inter, 0) * 1000000)
         |    // (za.n + zb.n - coalesce(ix.inter, 0)) AS BIGINT) AS jac_micro,
         |  v.matches * 31250 - CAST((coalesce(ix.inter, 0) * 1000000)
         |    // (za.n + zb.n - coalesce(ix.inter, 0)) AS BIGINT) AS err_micro
         |FROM v
         |LEFT JOIN ix ON ix.a = v.a AND ix.b = v.b
         |JOIN sz za ON za.doc_id = v.a
         |JOIN sz zb ON zb.doc_id = v.b
         |ORDER BY v.a, v.b""".stripMargin
    },

    // end-to-end mirror of Dedup.minhashLshCrossPortable: the same
    // md5 signature + banding CTEs as dedup_minhash_banded, then the
    // INCREMENTAL shape — doc_id % 5 = 3 plays the ingest batch, the
    // rest the persisted corpus; candidates are new-vs-corpus only;
    // the corpus-side Skew.dropHotKeys cap mirrors as a QUALIFY
    // count window over the same (band, bucket) grouping.
    "dedup_incremental_portable" -> {
      val p = graft.functions.MinHash.MersenneP
      val perms = graft.functions.MinHash.permParams(32).zipWithIndex
        .map { case ((a, b), i) => s"($i, ${a}::BIGINT, ${b}::BIGINT)" }
        .mkString(", ")
      s"""WITH base AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
         |), sh AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    [array_to_string(toks[i:i+2], ' ')
         |     FOR i IN range(1, greatest(len(toks)-3, 0)+2)])) AS shingle
         |  FROM base
         |), xs AS (
         |  SELECT doc_id,
         |         ('0x' || substr(md5(shingle), 1, 15))::BIGINT % $p AS x
         |  FROM sh
         |), perms(i, pa, pb) AS (
         |  SELECT * FROM (VALUES $perms) t(i, pa, pb)
         |), sig AS (
         |  SELECT doc_id, p.i,
         |         min(((x * p.pa) % $p + p.pb) % $p) AS h
         |  FROM xs CROSS JOIN perms p
         |  GROUP BY doc_id, p.i
         |), sigarr AS (
         |  SELECT doc_id, list(h ORDER BY i) AS sig FROM sig GROUP BY doc_id
         |), banded AS (
         |  SELECT doc_id, sig, t.bd,
         |         md5(array_to_string(sig[t.bd*4+1:t.bd*4+4], ',')) AS bucket
         |  FROM sigarr CROSS JOIN range(0, 8) t(bd)
         |), newb AS (
         |  SELECT * FROM banded WHERE doc_id % 5 = 3
         |), corpb AS (
         |  SELECT * FROM banded WHERE doc_id % 5 <> 3
         |  QUALIFY count(*) OVER (PARTITION BY bd, bucket) <= 10000
         |), cand AS (
         |  SELECT DISTINCT x.doc_id AS new_id, y.doc_id AS corpus_id,
         |                  x.sig AS siga, y.sig AS sigb
         |  FROM newb x JOIN corpb y
         |    ON x.bd = y.bd AND x.bucket = y.bucket AND x.doc_id <> y.doc_id
         |), m AS (
         |  SELECT new_id, corpus_id, unnest(siga) AS ha, unnest(sigb) AS hb
         |  FROM cand
         |), v AS (
         |  SELECT new_id, corpus_id,
         |         sum(CASE WHEN ha = hb THEN 1 ELSE 0 END) AS matches
         |  FROM m GROUP BY new_id, corpus_id
         |)
         |SELECT new_id, corpus_id, round(matches / 32.0, 6) AS est_jaccard
         |FROM v WHERE matches >= 16
         |ORDER BY new_id, corpus_id""".stripMargin
    },

    // brute-force mirror of Dedup.simhashPortablePairs: md5-top-60-bit
    // token hashes → per-bit votes → fingerprint → ALL-pairs hamming.
    // Brute force is the STRONGER oracle here: pigeonhole banding is
    // exact, so banded(Spark) == brute(DuckDB) must hold bit-for-bit.
    "dedup_simhash_banded" ->
      """WITH base AS (
        |  SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS toks
        |  FROM documents
        |), tok AS (
        |  SELECT doc_id, unnest(toks) AS tok FROM base
        |), xs AS (
        |  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS x
        |  FROM tok
        |), votes AS (
        |  SELECT doc_id, j.j,
        |         sum(CASE WHEN (x >> j.j) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM xs CROSS JOIN range(0, 60) j(j)
        |  GROUP BY doc_id, j.j
        |), fp AS (
        |  SELECT doc_id,
        |         CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << j) ELSE 0 END)
        |              AS BIGINT) AS simhash
        |  FROM votes GROUP BY doc_id
        |)
        |SELECT x.doc_id AS a, y.doc_id AS b,
        |       bit_count(xor(x.simhash, y.simhash)) AS hamming
        |FROM fp x JOIN fp y ON x.doc_id < y.doc_id
        |WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
        |ORDER BY a, b""".stripMargin,

    // end-to-end mirror of Dedup.substringPairsPortable over the
    // plantSpanDups corpus: the aug CTE re-derives the planted docs
    // (240-byte prefix slice wrapped in md5 filler at doc_id+2000000),
    // then k-gram md5-top-60-bit hashes, 0-mod-16 sampling, per-doc
    // distinct, hot-fingerprint cap, shared-count pairing.
    "dedup_substring_mod" ->
      """WITH aug AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id,
        |         repeat(md5(CAST(doc_id + 2000000 AS VARCHAR)) || ' ', 8)
        |           || substr(text, 1, 240) || ' '
        |           || repeat(md5(CAST(doc_id + 2000000 AS VARCHAR)) || ' ', 8)
        |           AS text
        |  FROM documents WHERE doc_id % 20 = 0
        |), g AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(substr(text, i, 16)), 1, 15))::BIGINT AS h
        |  FROM aug CROSS JOIN LATERAL
        |    unnest(range(1, greatest(len(text) - 15, 0) + 1)) t(i)
        |  WHERE len(text) >= 16
        |), sel AS (
        |  SELECT DISTINCT doc_id, h FROM g WHERE h % 16 = 0
        |), capped AS (
        |  SELECT doc_id, h FROM sel
        |  QUALIFY count(*) OVER (PARTITION BY h) <= 1000
        |), p AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared
        |  FROM capped x JOIN capped y ON x.h = y.h AND x.doc_id < y.doc_id
        |  GROUP BY a, b
        |)
        |SELECT a, b, shared FROM p WHERE shared >= 2 ORDER BY a, b""".stripMargin,

    // end-to-end mirror of Dedup.spanDupStatsPortable over the same
    // plantSpanDups corpus as dedup_substring_mod: identical planted
    // docs, k-gram stream, 0-mod-16 sampling and per-doc distinct,
    // then per-hash corpus counts (NO cap — hot fingerprints ARE the
    // signal) and the per-doc duplicated-span fraction.
    "text_spandup_mod" ->
      """WITH aug AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id,
        |         repeat(md5(CAST(doc_id + 2000000 AS VARCHAR)) || ' ', 8)
        |           || substr(text, 1, 240) || ' '
        |           || repeat(md5(CAST(doc_id + 2000000 AS VARCHAR)) || ' ', 8)
        |           AS text
        |  FROM documents WHERE doc_id % 20 = 0
        |), g AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(substr(text, i, 16)), 1, 15))::BIGINT AS h
        |  FROM aug CROSS JOIN LATERAL
        |    unnest(range(1, greatest(len(text) - 15, 0) + 1)) t(i)
        |  WHERE len(text) >= 16
        |), sel AS (
        |  SELECT DISTINCT doc_id, h FROM g WHERE h % 16 = 0
        |), cnt AS (
        |  SELECT h, count(*) AS hc FROM sel GROUP BY h
        |)
        |SELECT sel.doc_id, count(*) AS n_fps,
        |       round(CAST(sum(CASE WHEN cnt.hc > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |             / count(*), 6) AS dup_fraction
        |FROM sel JOIN cnt ON sel.h = cnt.h
        |GROUP BY sel.doc_id ORDER BY sel.doc_id""".stripMargin,

    // end-to-end mirror of Dedup.exactSubstrExtents over the same
    // plantSpanDups corpus: 12-token window md5s, row-count cap 1000,
    // doc-pair window matches, gaps-and-islands merge per alignment
    // diagonal, maximal extent + md5 of the extent text itself.
    "dedup_exact_substring" ->
      """WITH aug AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id,
        |         repeat(md5(CAST(doc_id + 2000000 AS VARCHAR)) || ' ', 8)
        |           || substr(text, 1, 240) || ' '
        |           || repeat(md5(CAST(doc_id + 2000000 AS VARCHAR)) || ' ', 8)
        |           AS text
        |  FROM documents WHERE doc_id % 20 = 0
        |), toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM aug WHERE text IS NOT NULL
        |), win AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS p,
        |         md5(array_to_string(toks[i:i+11], ' ')) AS w
        |  FROM toks CROSS JOIN LATERAL
        |    unnest(range(1, greatest(len(toks) - 11, 0) + 1)) t(i)
        |  WHERE len(toks) >= 12
        |), capped AS (
        |  SELECT doc_id, p, w FROM win
        |  QUALIFY count(*) OVER (PARTITION BY w) <= 1000
        |), pr AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, x.p AS pa, y.p AS pb
        |  FROM capped x JOIN capped y
        |    ON x.w = y.w AND x.doc_id < y.doc_id
        |), isl AS (
        |  SELECT a, b, pa, pb, pa - pb AS diag,
        |    pa - row_number() OVER (PARTITION BY a, b, pa - pb ORDER BY pa)
        |      AS g
        |  FROM pr
        |), ext AS (
        |  SELECT a, b, min(pa) AS a_start, min(pb) AS b_start,
        |         CAST(max(pa) - min(pa) + 12 AS BIGINT) AS len_tokens
        |  FROM isl GROUP BY a, b, diag, g
        |)
        |SELECT e.a, e.b, e.a_start, e.b_start, e.len_tokens,
        |       md5(array_to_string(
        |         t.toks[e.a_start : e.a_start + e.len_tokens - 1], ' '))
        |         AS extent_md5
        |FROM ext e JOIN toks t ON t.doc_id = e.a
        |ORDER BY a, b, a_start, b_start, len_tokens""".stripMargin,

    // end-to-end mirror of Dedup.exactSubstrIncremental: the planted
    // docs (doc_id ≥ 2000000) as the arriving batch vs the base
    // corpus; corpus-side-only hot cap, no self-pairing.
    "dedup_exact_substring_incr" -> exactSubstrIncrSqlW("TRUE"),

    // the store-incremental spelling: the corpus side is the
    // lifecycle store's LIVE rows (windows maintained as a
    // SegmentedArtifact family); the batch side is unchanged
    "dedup_exact_substring_store_incr" ->
      exactSubstrIncrSqlW(lifecycleLive)) ++ midSql

  private def exactSubstrIncrSqlW(corpusWhere: String) =
      s"""WITH aug AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id,
        |         repeat(md5(CAST(doc_id + 2000000 AS VARCHAR)) || ' ', 8)
        |           || substr(text, 1, 240) || ' '
        |           || repeat(md5(CAST(doc_id + 2000000 AS VARCHAR)) || ' ', 8)
        |           AS text
        |  FROM documents WHERE doc_id % 20 = 0
        |), toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM aug WHERE text IS NOT NULL
        |), win AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS p,
        |         md5(array_to_string(toks[i:i+11], ' ')) AS w
        |  FROM toks CROSS JOIN LATERAL
        |    unnest(range(1, greatest(len(toks) - 11, 0) + 1)) t(i)
        |  WHERE len(toks) >= 12
        |), wc AS (
        |  SELECT doc_id, p, w FROM win
        |  WHERE doc_id < 2000000 AND ($corpusWhere)
        |  QUALIFY count(*) OVER (PARTITION BY w) <= 1000
        |), wb AS (
        |  SELECT doc_id, p, w FROM win WHERE doc_id >= 2000000
        |), pr AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, x.p AS pa, y.p AS pb
        |  FROM wc x JOIN wb y ON x.w = y.w
        |), isl AS (
        |  SELECT a, b, pa, pb, pa - pb AS diag,
        |    pa - row_number() OVER (PARTITION BY a, b, pa - pb ORDER BY pa)
        |      AS g
        |  FROM pr
        |), ext AS (
        |  SELECT a, b, min(pa) AS a_start, min(pb) AS b_start,
        |         CAST(max(pa) - min(pa) + 12 AS BIGINT) AS len_tokens
        |  FROM isl GROUP BY a, b, diag, g
        |)
        |SELECT e.a, e.b, e.a_start, e.b_start, e.len_tokens,
        |       md5(array_to_string(
        |         t.toks[e.a_start : e.a_start + e.len_tokens - 1], ' '))
        |         AS extent_md5
        |FROM ext e JOIN toks t ON t.doc_id = e.a
        |ORDER BY a, b, a_start, b_start, len_tokens""".stripMargin

  /** the middle of the query mirrors (split from `mapped` so the
    * extent-incremental builder def can sit between the halves)
    */
  private lazy val midSql: Map[String, String] = Map(
    // end-to-end mirror of Dedup.exactSubstrScrub over the same
    // corpus: keep-lowest-doc per window, covered positions = union
    // of scrubbed 12-token window spans, scrubbed text rebuilt from
    // the surviving tokens in position order.
    "dedup_exact_substring_scrub" ->
      """WITH aug AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id,
        |         repeat(md5(CAST(doc_id + 2000000 AS VARCHAR)) || ' ', 8)
        |           || substr(text, 1, 240) || ' '
        |           || repeat(md5(CAST(doc_id + 2000000 AS VARCHAR)) || ' ', 8)
        |           AS text
        |  FROM documents WHERE doc_id % 20 = 0
        |), toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM aug WHERE text IS NOT NULL
        |), win AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS p,
        |         md5(array_to_string(toks[i:i+11], ' ')) AS w
        |  FROM toks CROSS JOIN LATERAL
        |    unnest(range(1, greatest(len(toks) - 11, 0) + 1)) t(i)
        |  WHERE len(toks) >= 12
        |), capped AS (
        |  SELECT doc_id, p, w FROM win
        |  QUALIFY count(*) OVER (PARTITION BY w) <= 1000
        |), mindoc AS (
        |  SELECT w, min(doc_id) AS keep_id FROM capped GROUP BY w
        |), covered AS (
        |  SELECT DISTINCT c.doc_id, c.p + q.q AS p
        |  FROM capped c JOIN mindoc m ON c.w = m.w
        |  CROSS JOIN LATERAL unnest(range(0, 12)) q(q)
        |  WHERE c.doc_id > m.keep_id
        |), tokpos AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS p, toks[i] AS tok
        |  FROM toks CROSS JOIN LATERAL
        |    unnest(range(1, len(toks) + 1)) t(i)
        |)
        |SELECT t.doc_id, count(*) AS n_tokens,
        |       CAST(sum(CASE WHEN c.p IS NOT NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_scrubbed,
        |       md5(coalesce(array_to_string(
        |         list(t.tok ORDER BY t.p) FILTER (WHERE c.p IS NULL), ' '),
        |         '')) AS scrubbed_md5
        |FROM tokpos t LEFT JOIN covered c
        |  ON t.doc_id = c.doc_id AND t.p = c.p
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    // mirror of Dedup.containmentPairs over plantContainedDocs: the
    // aug CTE re-derives the planted truncated re-crawls (200-char
    // prefixes at doc_id+3000000), then the ngram_jaccard machinery
    // verbatim with the asymmetric |A∩B|/min(|A|,|B|) ratio and the
    // smaller-set doc as contained_id (ties → a).
    "dedup_containment" ->
      """WITH aug AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 3000000 AS doc_id, substr(text, 1, 200) AS text
        |  FROM documents WHERE doc_id % 25 = 0
        |), base AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM aug
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [array_to_string(toks[i:i+2], ' ')
        |     FOR i IN range(1, greatest(len(toks)-3, 0)+2)])) AS shingle
        |  FROM base
        |), capped AS (
        |  SELECT doc_id, shingle FROM sh
        |  QUALIFY count(*) OVER (PARTITION BY shingle) <= 1000
        |), sz AS (
        |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
        |), pairs AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS common
        |  FROM capped x JOIN capped y
        |    ON x.shingle = y.shingle AND x.doc_id < y.doc_id
        |  GROUP BY a, b
        |)
        |SELECT a, b,
        |  round(CAST(common AS DOUBLE) / least(za.sz, zb.sz), 6) AS containment,
        |  CASE WHEN za.sz <= zb.sz THEN a ELSE b END AS contained_id
        |FROM pairs p JOIN sz za ON p.a = za.doc_id JOIN sz zb ON p.b = zb.doc_id
        |WHERE round(CAST(common AS DOUBLE) / least(za.sz, zb.sz), 6) >= 0.9
        |ORDER BY a, b""".stripMargin,

    // mirror of Curation.qualityTopPercent (per-lang top 30%): the
    // text_quality score expression verbatim, ranked per language
    // with the exact integer cut rnk*10 <= 3*n.
    "sample_quality_top" ->
      s"""WITH q AS (
        |  SELECT lang AS stratum, doc_id,
        |    round(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
        |            / nullif(length(text), 0) * 0.5
        |          + least(CAST(len(list_filter(string_split(lower(text), ' '),
        |              t -> t IN ($stopEn))) AS DOUBLE)
        |              / nullif(len(string_split(text, ' ')), 0) * 5.0, 1.0) * 0.5, 6)
        |      AS quality
        |  FROM documents
        |), qq AS (
        |  SELECT * FROM q WHERE quality IS NOT NULL
        |), r AS (
        |  SELECT stratum, doc_id, quality,
        |    CAST(row_number() OVER (PARTITION BY stratum
        |           ORDER BY quality DESC NULLS LAST, doc_id) AS BIGINT) AS rnk,
        |    count(*) OVER (PARTITION BY stratum) AS n
        |  FROM qq
        |)
        |SELECT stratum, doc_id, quality, rnk FROM r
        |WHERE rnk * 10 <= 3 * n ORDER BY stratum, rnk""".stripMargin,

    "score_importance" -> dsirSql,

    // the segment-incremental fit + live scoring over the lifecycle
    // store — the same DSIR mirror under the live predicate
    "score_importance_store_incr" -> dsirSqlW(lifecycleLive),
    // the persisted-weights spelling serves the IDENTICAL result —
    // same mirror (the search_bm25_indexed precedent), so any drift
    // between the indexed and from-scratch DSIR plans is a hash
    // mismatch
    "score_importance_indexed" -> dsirSql,

    // mirror of Dedup.plantLinedDocs + Dedup.lineDedup: 12-token line
    // folds + planted footer lines (doc_id%5 / %7), distinct-doc
    // count per md5(line), per-doc stats + md5 of the kept lines
    // re-joined in original order (empty keep-set pinned to md5('')).
    "dedup_lines" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), lined AS (
        |  SELECT doc_id,
        |    [array_to_string(toks[(i-1)*12+1 : (i-1)*12+12], ' ')
        |     FOR i IN range(1, CAST(ceil(len(toks) / 12.0) AS BIGINT) + 1)]
        |    || CASE WHEN doc_id % 5 = 0
        |            THEN ['subscribe to our newsletter for updates']
        |            ELSE CAST([] AS VARCHAR[]) END
        |    || CASE WHEN doc_id % 7 = 0
        |            THEN ['all rights reserved copyright notice']
        |            ELSE CAST([] AS VARCHAR[]) END AS lines
        |  FROM base
        |), ln AS (
        |  SELECT doc_id, i - 1 AS line_no, lines[i] AS line,
        |         md5(lines[i]) AS lh
        |  FROM lined, unnest(range(1, len(lines) + 1)) t(i)
        |), cnt AS (
        |  SELECT lh, count(DISTINCT doc_id) AS nd FROM ln GROUP BY lh
        |)
        |SELECT ln.doc_id, count(*) AS n_lines,
        |  CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_lines,
        |  round(CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |        / count(*), 6) AS dup_frac,
        |  md5(coalesce(
        |    string_agg(line, chr(10) ORDER BY line_no)
        |      FILTER (WHERE nd < 2), '')) AS kept_md5
        |FROM ln JOIN cnt USING (lh)
        |GROUP BY ln.doc_id ORDER BY ln.doc_id""".stripMargin,

    "dedup_ngram_jaccard" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [array_to_string(toks[i:i+2], ' ')
        |     FOR i IN range(1, greatest(len(toks)-3, 0)+2)])) AS shingle
        |  FROM base
        |), capped AS (
        |  SELECT doc_id, shingle FROM sh
        |  QUALIFY count(*) OVER (PARTITION BY shingle) <= 1000
        |), sz AS (
        |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
        |), pairs AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS common
        |  FROM capped x JOIN capped y
        |    ON x.shingle = y.shingle AND x.doc_id < y.doc_id
        |  GROUP BY a, b
        |)
        |SELECT a, b,
        |  round(CAST(common AS DOUBLE) / (za.sz + zb.sz - common), 6) AS jaccard
        |FROM pairs p JOIN sz za ON p.a = za.doc_id JOIN sz zb ON p.b = zb.doc_id
        |WHERE round(CAST(common AS DOUBLE) / (za.sz + zb.sz - common), 6) >= 0.5
        |ORDER BY a, b""".stripMargin,

    // the CC operator over the exact ngram-Jaccard pair graph: the
    // recursive CTE computes each node's full reachable set (the
    // graph is symmetrized, so min over reachables == component min ==
    // exactly the label both Spark routes produce)
    "dedup_clusters_exact" ->
      """WITH RECURSIVE base AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [array_to_string(toks[i:i+2], ' ')
        |     FOR i IN range(1, greatest(len(toks)-3, 0)+2)])) AS shingle
        |  FROM base
        |), capped AS (
        |  SELECT doc_id, shingle FROM sh
        |  QUALIFY count(*) OVER (PARTITION BY shingle) <= 1000
        |), sz AS (
        |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
        |), pairs AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS common
        |  FROM capped x JOIN capped y
        |    ON x.shingle = y.shingle AND x.doc_id < y.doc_id
        |  GROUP BY a, b
        |), jac AS (
        |  SELECT a, b FROM pairs p
        |  JOIN sz za ON p.a = za.doc_id JOIN sz zb ON p.b = zb.doc_id
        |  WHERE round(CAST(common AS DOUBLE) / (za.sz + zb.sz - common), 6) >= 0.5
        |), sym AS (
        |  SELECT a AS src, b AS dst FROM jac
        |  UNION ALL SELECT b, a FROM jac
        |), reach AS (
        |  SELECT src AS id, dst AS r FROM sym
        |  UNION
        |  SELECT reach.id, sym.dst FROM reach JOIN sym ON reach.r = sym.src
        |)
        |SELECT id, least(id, min(r)) AS label
        |FROM reach GROUP BY id ORDER BY id""".stripMargin,

    "dedup_embedding_exact" ->
      s"""WITH c AS (
        |  SELECT x.vec_id AS a, y.vec_id AS b,
        |    round(${cos("x.embedding", "y.embedding")}, 6) AS cos
        |  FROM embeddings x, embeddings y WHERE x.vec_id < y.vec_id
        |)
        |SELECT a, b, cos FROM c WHERE cos >= 0.4 ORDER BY a, b""".stripMargin,

    // end-to-end mirror of Similarity.lshCosinePairsPortable over
    // plantNearDupsPortable: the aug CTE re-derives the planted
    // near-dups (±0.03 jitter by md5("(vec_id+1000000):dim") parity,
    // float-cast like the Spark side), the pl/sb CTEs re-derive the
    // 64 md5-parity hyperplanes and 64 sign bits per vector via the
    // order-preserving double fold, then width-8 band buckets, the
    // 10000-bucket cap (QUALIFY — mirroring Skew.dropHotKeys), the
    // bucket self-join and the exact-cosine ≥ 0.8 verify.
    // end-to-end mirror of Similarity.semDedup over the portable
    // planted corpus: the aug CTE is plantNearDupsPortable verbatim,
    // cents/dists/assign are the ann_ivf_topk_portable quantizer
    // route (argmin of cc − 2·dot, ties → lowest list) over the
    // AUGMENTED frame (leading 8 of aug == leading 8 of embeddings —
    // planted ids sit at +1000000), then within-list earlier-id
    // pairs with exact cosine ≥ 0.8 name each dropped row's dup_of.
    "dedup_semantic" ->
      s"""WITH aug AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000 AS vec_id,
        |         list_transform(range(1, 65), i -> CAST(
        |           CAST(embedding[i] AS DOUBLE) +
        |           CASE WHEN ('0x' || substr(md5(CAST(vec_id + 1000000 AS VARCHAR)
        |                        || ':' || CAST(i AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
        |                THEN 0.03 ELSE -0.03 END AS FLOAT)) AS embedding
        |  FROM embeddings WHERE vec_id % 10 = 0
        |), cents AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list,
        |         embedding AS cv,
        |         list_sum(list_transform(range(1, 65),
        |           i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) AS cc
        |  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)
        |), dists AS (
        |  SELECT e.vec_id, c.list,
        |         c.cc - 2 * list_sum(list_transform(range(1, 65),
        |           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE))) AS dd
        |  FROM aug e CROSS JOIN cents c
        |), assign AS (
        |  SELECT vec_id, list FROM (
        |    SELECT vec_id, list,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dd, list) AS rn
        |    FROM dists) WHERE rn = 1
        |), dup AS (
        |  SELECT b.vec_id AS v, min(a.vec_id) AS dup_of
        |  FROM assign a JOIN assign b ON a.list = b.list AND a.vec_id < b.vec_id
        |  JOIN aug ea ON ea.vec_id = a.vec_id
        |  JOIN aug eb ON eb.vec_id = b.vec_id
        |  WHERE round(${cos("ea.embedding", "eb.embedding")}, 6) >= 0.8
        |  GROUP BY b.vec_id
        |)
        |SELECT s.vec_id, s.list, d.v IS NULL AS kept,
        |       CAST(coalesce(d.dup_of, -1) AS BIGINT) AS dup_of
        |FROM assign s LEFT JOIN dup d ON d.v = s.vec_id
        |ORDER BY s.vec_id""".stripMargin,

    "dedup_embedding_banded" ->
      s"""WITH aug AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000 AS vec_id,
        |         list_transform(range(1, 65), i -> CAST(
        |           CAST(embedding[i] AS DOUBLE) +
        |           CASE WHEN ('0x' || substr(md5(CAST(vec_id + 1000000 AS VARCHAR)
        |                        || ':' || CAST(i AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
        |                THEN 0.03 ELSE -0.03 END AS FLOAT)) AS embedding
        |  FROM embeddings WHERE vec_id % 10 = 0
        |), pl AS (
        |  SELECT b.b AS bit,
        |         list(CASE WHEN ('0x' || substr(md5(b.b::VARCHAR || ':' || i.i::VARCHAR), 1, 15))::BIGINT % 2 = 0
        |                   THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END
        |              ORDER BY i.i) AS ps
        |  FROM range(0, 64) b(b) CROSS JOIN range(1, 65) i(i)
        |  GROUP BY b.b
        |), sb AS (
        |  SELECT e.vec_id, pl.bit,
        |         CASE WHEN list_sum(list_transform(range(1, 65),
        |                i -> CAST(e.embedding[i] AS DOUBLE) * pl.ps[i])) >= 0
        |              THEN 1 ELSE 0 END AS bit_on
        |  FROM aug e CROSS JOIN pl
        |), cb AS (
        |  SELECT vec_id, bit // 8 AS bd,
        |         CAST(sum(bit_on << (bit % 8)) AS BIGINT) AS bucket
        |  FROM sb GROUP BY vec_id, bit // 8
        |), capped AS (
        |  SELECT vec_id, bd, bucket FROM cb
        |  QUALIFY count(*) OVER (PARTITION BY bd, bucket) <= 10000
        |), pairs AS (
        |  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
        |  FROM capped x JOIN capped y
        |    ON x.bd = y.bd AND x.bucket = y.bucket AND x.vec_id < y.vec_id
        |)
        |SELECT p.a, p.b, round(${cos("ea.embedding", "eb.embedding")}, 6) AS cos
        |FROM pairs p
        |JOIN aug ea ON ea.vec_id = p.a
        |JOIN aug eb ON eb.vec_id = p.b
        |WHERE round(${cos("ea.embedding", "eb.embedding")}, 6) >= 0.8
        |ORDER BY a, b""".stripMargin,

    // end-to-end mirror of Similarity.lshTopKPortable: the ±1
    // hyperplanes are RE-DERIVED here from DuckDB's own md5 (parity
    // of the top 60 bits of md5("bit:i")) — no interpolated plane
    // constants — then 16 sign bits per vector via an order-preserving
    // double fold (list_sum over list_transform, mirroring VecLshSig's
    // d-loop: ±1.0 multiplication is exact, so the projections are
    // bit-identical), width-2 band buckets, corpus×query candidates
    // from shared (band, bucket), exact-cosine rerank top-5.
    "ann_lsh_topk_portable" ->
      s"""WITH pl AS (
        |  SELECT b.b AS bit,
        |         list(CASE WHEN ('0x' || substr(md5(b.b::VARCHAR || ':' || i.i::VARCHAR), 1, 15))::BIGINT % 2 = 0
        |                   THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END
        |              ORDER BY i.i) AS ps
        |  FROM range(0, 16) b(b) CROSS JOIN range(1, 65) i(i)
        |  GROUP BY b.b
        |), sb AS (
        |  SELECT e.vec_id, pl.bit,
        |         CASE WHEN list_sum(list_transform(range(1, 65),
        |                i -> CAST(e.embedding[i] AS DOUBLE) * pl.ps[i])) >= 0
        |              THEN 1 ELSE 0 END AS bit_on
        |  FROM embeddings e CROSS JOIN pl
        |), cb AS (
        |  SELECT vec_id, bit // 2 AS bd,
        |         CAST(sum(bit_on << (bit % 2)) AS BIGINT) AS bucket
        |  FROM sb GROUP BY vec_id, bit // 2
        |), qb AS (
        |  SELECT vec_id AS qid, bd, bucket FROM cb WHERE vec_id < 10
        |), cand AS (
        |  SELECT DISTINCT c.vec_id AS nbr, q.qid
        |  FROM cb c JOIN qb q
        |    ON c.bd = q.bd AND c.bucket = q.bucket AND c.vec_id <> q.qid
        |), s AS (
        |  SELECT cand.qid, cand.nbr,
        |         round(${cos("eq.embedding", "ec.embedding")}, 6) AS cos
        |  FROM cand
        |  JOIN embeddings eq ON eq.vec_id = cand.qid
        |  JOIN embeddings ec ON ec.vec_id = cand.nbr
        |), r AS (
        |  SELECT qid, nbr, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr ASC) AS rnk
        |  FROM s
        |)
        |SELECT qid, rnk, nbr, cos FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,

    // end-to-end mirror of Similarity.ivfTopK over the PORTABLE
    // leading-vector quantizer (first nlist=8 corpus vectors by id,
    // re-derived here from the same parquet — no interpolated centroid
    // constants). The coarse distance is the Spark side's
    // centApproxDist: ‖c‖² − 2·⟨v,c⟩ with EXACT float→double products
    // summed in component order on both engines (list_sum is an
    // ordered fold, VecDot an in-order double loop), so assignment
    // argmin and the nprobe=4 probe ranking are bit-identical;
    // candidates = corpus vectors in probed lists, exact-cosine
    // rerank top-5 with (cos DESC, nbr ASC) tie-break.
    // the 29b2 route under the LIVE-ROWS predicate: quantizer = the
    // leading 8 of the ORIGINAL corpus (frozen at initial ingest),
    // assignment restricted to rows surviving the store's
    // delete(%7)/re-append(%21) cycle, queries the original vec_id<10
    // vectors. This is what serving from the segment-incremental
    // codes artifact must equal.
    "ann_ivf_store_incr" ->
      s"""WITH cents AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list,
        |         embedding AS cv,
        |         list_sum(list_transform(range(1, 65),
        |           i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) AS cc
        |  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)
        |), live AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  WHERE vec_id % 7 <> 0 OR vec_id % 21 = 0
        |), dists AS (
        |  SELECT e.vec_id, c.list,
        |         c.cc - 2 * list_sum(list_transform(range(1, 65),
        |           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE))) AS dd
        |  FROM live e CROSS JOIN cents c
        |), qdists AS (
        |  SELECT e.vec_id, c.list,
        |         c.cc - 2 * list_sum(list_transform(range(1, 65),
        |           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE))) AS dd
        |  FROM embeddings e CROSS JOIN cents c WHERE e.vec_id < 10
        |), assign AS (
        |  SELECT vec_id, list FROM (
        |    SELECT vec_id, list,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dd, list) AS rn
        |    FROM dists) WHERE rn = 1
        |), probes AS (
        |  SELECT vec_id AS qid, list FROM (
        |    SELECT vec_id, list,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dd, list) AS rn
        |    FROM qdists) WHERE rn <= 4
        |), cand AS (
        |  SELECT p.qid, a.vec_id AS nbr
        |  FROM probes p JOIN assign a ON a.list = p.list AND a.vec_id <> p.qid
        |), s AS (
        |  SELECT cand.qid, cand.nbr,
        |         round(${cos("eq.embedding", "ec.embedding")}, 6) AS cos
        |  FROM cand
        |  JOIN embeddings eq ON eq.vec_id = cand.qid
        |  JOIN embeddings ec ON ec.vec_id = cand.nbr
        |), r AS (
        |  SELECT qid, nbr, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr ASC) AS rnk
        |  FROM s
        |)
        |SELECT qid, rnk, nbr, cos FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,

    "ann_ivf_topk_portable" ->
      s"""WITH cents AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list,
        |         embedding AS cv,
        |         list_sum(list_transform(range(1, 65),
        |           i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) AS cc
        |  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)
        |), dists AS (
        |  SELECT e.vec_id, c.list,
        |         c.cc - 2 * list_sum(list_transform(range(1, 65),
        |           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE))) AS dd
        |  FROM embeddings e CROSS JOIN cents c
        |), assign AS (
        |  SELECT vec_id, list FROM (
        |    SELECT vec_id, list,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dd, list) AS rn
        |    FROM dists) WHERE rn = 1
        |), probes AS (
        |  SELECT vec_id AS qid, list FROM (
        |    SELECT vec_id, list,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dd, list) AS rn
        |    FROM dists WHERE vec_id < 10) WHERE rn <= 4
        |), cand AS (
        |  SELECT p.qid, a.vec_id AS nbr
        |  FROM probes p JOIN assign a ON a.list = p.list AND a.vec_id <> p.qid
        |), s AS (
        |  SELECT cand.qid, cand.nbr,
        |         round(${cos("eq.embedding", "ec.embedding")}, 6) AS cos
        |  FROM cand
        |  JOIN embeddings eq ON eq.vec_id = cand.qid
        |  JOIN embeddings ec ON ec.vec_id = cand.nbr
        |), r AS (
        |  SELECT qid, nbr, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr ASC) AS rnk
        |  FROM s
        |)
        |SELECT qid, rnk, nbr, cos FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,

    // end-to-end mirror of Similarity.pqTopK over the PORTABLE
    // leading-vector codebooks (entry (j,c) = subspace j of the
    // unitized (c+1)-th corpus vector — re-derived here, no
    // interpolated constants). Unitization repeats the Spark side's
    // arithmetic (ordered double dot → sqrt → max 1e-30 → double
    // divide → FLOAT cast); sub-space distances are the shared
    // centApproxDist spelling with exact float→double products in
    // component order; the ADC score folds the query's distance-table
    // entries in subspace order (list over ORDER BY j — matching
    // adcScore's left fold); shortlist = top-80 by (adc, nbr), then
    // exact-cosine rerank top-5. No code PACKING here: (vec_id, j,
    // code) rows are the unpacked form of the 8-byte code, and the
    // ADC lookup is identical either way.
    "ann_pq_topk_portable" ->
      s"""WITH nrm AS (
        |  SELECT vec_id, embedding,
        |    greatest(sqrt(list_sum(list_transform(range(1, 65),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))),
        |      1e-30) AS n
        |  FROM embeddings
        |), uall AS (
        |  SELECT vec_id, list_transform(range(1, 65),
        |    i -> CAST(CAST(embedding[i] AS DOUBLE) / n AS FLOAT)) AS u
        |  FROM nrm
        |), cbsrc AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, u
        |  FROM (SELECT vec_id, u FROM uall ORDER BY vec_id LIMIT 16)
        |), cb AS (
        |  SELECT j.j AS j, s.c AS c,
        |    list_transform(range(1, 5), t -> s.u[j.j * 4 + t]) AS cv,
        |    list_sum(list_transform(range(1, 5),
        |      t -> CAST(s.u[j.j * 4 + t] AS DOUBLE) * CAST(s.u[j.j * 4 + t] AS DOUBLE))) AS cc
        |  FROM range(0, 16) j(j) CROSS JOIN cbsrc s
        |), dist AS (
        |  SELECT e.vec_id, cb.j, cb.c,
        |    cb.cc - 2 * list_sum(list_transform(range(1, 5),
        |      t -> CAST(e.u[cb.j * 4 + t] AS DOUBLE) * CAST(cb.cv[t] AS DOUBLE))) AS dd
        |  FROM uall e CROSS JOIN cb
        |), enc AS (
        |  SELECT vec_id, j, c AS code FROM (
        |    SELECT vec_id, j, c,
        |      row_number() OVER (PARTITION BY vec_id, j ORDER BY dd, c) AS rn
        |    FROM dist) WHERE rn = 1
        |), adc AS (
        |  SELECT qd.vec_id AS qid, en.vec_id AS nbr,
        |    list_sum(list(qd.dd ORDER BY en.j)) AS adc
        |  FROM enc en
        |  JOIN dist qd ON qd.j = en.j AND qd.c = en.code
        |  WHERE qd.vec_id < 10 AND en.vec_id <> qd.vec_id
        |  GROUP BY qd.vec_id, en.vec_id
        |), short AS (
        |  SELECT qid, nbr FROM (
        |    SELECT qid, nbr,
        |      row_number() OVER (PARTITION BY qid ORDER BY adc, nbr) AS rn
        |    FROM adc) WHERE rn <= 80
        |), s AS (
        |  SELECT short.qid, short.nbr,
        |    round(${cos("eq.embedding", "ec.embedding")}, 6) AS cos
        |  FROM short
        |  JOIN embeddings eq ON eq.vec_id = short.qid
        |  JOIN embeddings ec ON ec.vec_id = short.nbr
        |), r AS (
        |  SELECT qid, nbr, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr ASC) AS rnk
        |  FROM s
        |)
        |SELECT qid, rnk, nbr, cos FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,

    // the IVF-PQ composition mirror: the pq_topk_portable CTEs
    // (unitize → codebooks → sub-space distances → encode) plus
    // unit-geometry coarse routing (first 8 UNIT vectors as
    // centroids, assignment argmin + nprobe=4 probe ranking — the
    // ivf_topk_portable shape on unit vectors), ADC restricted to
    // probed lists, top-80 shortlist, exact rerank top-5.
    "ann_ivfpq_topk_portable" ->
      s"""WITH nrm AS (
        |  SELECT vec_id, embedding,
        |    greatest(sqrt(list_sum(list_transform(range(1, 65),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))),
        |      1e-30) AS n
        |  FROM embeddings
        |), uall AS (
        |  SELECT vec_id, list_transform(range(1, 65),
        |    i -> CAST(CAST(embedding[i] AS DOUBLE) / n AS FLOAT)) AS u
        |  FROM nrm
        |), cbsrc AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, u
        |  FROM (SELECT vec_id, u FROM uall ORDER BY vec_id LIMIT 16)
        |), cb AS (
        |  SELECT j.j AS j, s.c AS c,
        |    list_transform(range(1, 5), t -> s.u[j.j * 4 + t]) AS cv,
        |    list_sum(list_transform(range(1, 5),
        |      t -> CAST(s.u[j.j * 4 + t] AS DOUBLE) * CAST(s.u[j.j * 4 + t] AS DOUBLE))) AS cc
        |  FROM range(0, 16) j(j) CROSS JOIN cbsrc s
        |), dist AS (
        |  SELECT e.vec_id, cb.j, cb.c,
        |    cb.cc - 2 * list_sum(list_transform(range(1, 5),
        |      t -> CAST(e.u[cb.j * 4 + t] AS DOUBLE) * CAST(cb.cv[t] AS DOUBLE))) AS dd
        |  FROM uall e CROSS JOIN cb
        |), enc AS (
        |  SELECT vec_id, j, c AS code FROM (
        |    SELECT vec_id, j, c,
        |      row_number() OVER (PARTITION BY vec_id, j ORDER BY dd, c) AS rn
        |    FROM dist) WHERE rn = 1
        |), ccents AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list, u AS cv,
        |    list_sum(list_transform(range(1, 65),
        |      t -> CAST(u[t] AS DOUBLE) * CAST(u[t] AS DOUBLE))) AS cc
        |  FROM (SELECT vec_id, u FROM uall ORDER BY vec_id LIMIT 8)
        |), cdist AS (
        |  SELECT e.vec_id, c.list,
        |    c.cc - 2 * list_sum(list_transform(range(1, 65),
        |      t -> CAST(e.u[t] AS DOUBLE) * CAST(c.cv[t] AS DOUBLE))) AS dd
        |  FROM uall e CROSS JOIN ccents c
        |), assign AS (
        |  SELECT vec_id, list FROM (
        |    SELECT vec_id, list,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dd, list) AS rn
        |    FROM cdist) WHERE rn = 1
        |), probes AS (
        |  SELECT vec_id AS qid, list FROM (
        |    SELECT vec_id, list,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dd, list) AS rn
        |    FROM cdist WHERE vec_id < 10) WHERE rn <= 4
        |), adc AS (
        |  SELECT qd.vec_id AS qid, en.vec_id AS nbr,
        |    list_sum(list(qd.dd ORDER BY en.j)) AS adc
        |  FROM enc en
        |  JOIN assign a ON a.vec_id = en.vec_id
        |  JOIN dist qd ON qd.j = en.j AND qd.c = en.code
        |  JOIN probes p ON p.qid = qd.vec_id AND p.list = a.list
        |  WHERE en.vec_id <> qd.vec_id
        |  GROUP BY qd.vec_id, en.vec_id
        |), short AS (
        |  SELECT qid, nbr FROM (
        |    SELECT qid, nbr,
        |      row_number() OVER (PARTITION BY qid ORDER BY adc, nbr) AS rn
        |    FROM adc) WHERE rn <= 80
        |), s AS (
        |  SELECT short.qid, short.nbr,
        |    round(${cos("eq.embedding", "ec.embedding")}, 6) AS cos
        |  FROM short
        |  JOIN embeddings eq ON eq.vec_id = short.qid
        |  JOIN embeddings ec ON ec.vec_id = short.nbr
        |), r AS (
        |  SELECT qid, nbr, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr ASC) AS rnk
        |  FROM s
        |)
        |SELECT qid, rnk, nbr, cos FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,

    "ann_cosine_topk" ->
      s"""WITH q AS (
        |  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10
        |), s AS (
        |  SELECT qid, c.vec_id AS nbr,
        |    round(${cos("qv", "c.embedding")}, 6) AS cos
        |  FROM embeddings c, q WHERE c.vec_id <> qid
        |), r AS (
        |  SELECT qid, nbr, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr ASC) AS rnk
        |  FROM s
        |)
        |SELECT qid, rnk, nbr, cos FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,

    // same oracle shape as ann_cosine_topk — the custom physical
    // operator must produce bit-identical results
    "ann_topk_native" ->
      s"""WITH q AS (
        |  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10
        |), s AS (
        |  SELECT qid, c.vec_id AS nbr,
        |    round(${cos("qv", "c.embedding")}, 6) AS cos
        |  FROM embeddings c, q WHERE c.vec_id <> qid
        |), r AS (
        |  SELECT qid, nbr, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr ASC) AS rnk
        |  FROM s
        |)
        |SELECT qid, rnk, nbr, cos FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,

    "text_quality" ->
      s"""SELECT doc_id,
        |  length(text) AS n_chars,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  round(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
        |        / nullif(length(text), 0), 6) AS alpha_ratio,
        |  round(CAST(len(list_filter(string_split(lower(text), ' '),
        |        t -> t IN ($stopEn))) AS DOUBLE)
        |        / nullif(len(string_split(text, ' ')), 0), 6) AS stop_ratio,
        |  round(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
        |          / nullif(length(text), 0) * 0.5
        |        + least(CAST(len(list_filter(string_split(lower(text), ' '),
        |            t -> t IN ($stopEn))) AS DOUBLE)
        |            / nullif(len(string_split(text, ' ')), 0) * 5.0, 1.0) * 0.5, 6) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,

    // mirror of TextAnalysis.topNgrams (trigrams, k=30): non-distinct
    // trigram stream per doc (len−2 of them for len ≥ 3), corpus
    // count + distinct-doc support, ties broken ngram ASC.
    "text_ngrams_top" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    unnest([array_to_string(toks[i:i+2], ' ')
        |            FOR i IN range(1, len(toks) - 1)]) AS ngram
        |  FROM base WHERE len(toks) >= 3
        |), c AS (
        |  SELECT ngram, count(*) AS n, count(DISTINCT doc_id) AS n_docs
        |  FROM g GROUP BY ngram
        |)
        |SELECT CAST(row_number() OVER (ORDER BY n DESC, ngram) AS BIGINT) AS rnk,
        |       ngram, n, n_docs
        |FROM c ORDER BY n DESC, ngram LIMIT 30""".stripMargin,

    // mirror of TextAnalysis.gopherRules over plantGopherDocs: the
    // planting (12-token folds, bullet/ellipsis/symbol lines at
    // id%4/%6/%9) is re-derived, then every counter and the
    // integer-only pass comparisons are restated 1:1. sum_len uses
    // the same separator identity (len − (n_words − 1)); '...'
    // counting shares replace()'s left-to-right non-overlap scan.
    "quality_gopher" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), lined AS (
        |  SELECT doc_id,
        |    [array_to_string(toks[(i-1)*12+1 : (i-1)*12+12], ' ')
        |     FOR i IN range(1, CAST(ceil(len(toks) / 12.0) AS BIGINT) + 1)]
        |    || CASE WHEN doc_id % 4 = 0
        |            THEN ['- subscribe - follow - share']
        |            ELSE CAST([] AS VARCHAR[]) END
        |    || CASE WHEN doc_id % 6 = 0
        |            THEN ['click here to read more ...']
        |            ELSE CAST([] AS VARCHAR[]) END
        |    || CASE WHEN doc_id % 9 = 0
        |            THEN ['### sponsored ###']
        |            ELSE CAST([] AS VARCHAR[]) END AS lines
        |  FROM base
        |), doc AS (
        |  SELECT doc_id, lower(array_to_string(lines, chr(10))) AS t FROM lined
        |), m AS (
        |  SELECT doc_id, t,
        |    string_split_regex(t, '[ \n]') AS words,
        |    string_split(t, chr(10)) AS lns
        |  FROM doc
        |), c AS (
        |  SELECT doc_id,
        |    CAST(len(words) AS BIGINT) AS n_words,
        |    CAST(len(lns) AS BIGINT) AS n_lines,
        |    CAST(len(t) - (len(words) - 1) AS BIGINT) AS sum_len,
        |    CAST(len(t) - len(replace(t, '#', '')) AS BIGINT) AS n_hash,
        |    CAST((len(t) - len(replace(t, '...', ''))) // 3 AS BIGINT) AS n_ell,
        |    CAST(len(list_filter(lns, l -> starts_with(l, '- '))) AS BIGINT) AS n_bullet,
        |    CAST(len(list_filter(lns, l -> ends_with(l, '...'))) AS BIGINT) AS n_ellline,
        |    CAST(len(list_filter(words, w -> regexp_matches(w, '[a-z]'))) AS BIGINT) AS n_alpha,
        |    CAST(list_contains(words, 'the') AS BIGINT)
        |      + CAST(list_contains(words, 'be') AS BIGINT)
        |      + CAST(list_contains(words, 'to') AS BIGINT)
        |      + CAST(list_contains(words, 'of') AS BIGINT)
        |      + CAST(list_contains(words, 'and') AS BIGINT)
        |      + CAST(list_contains(words, 'that') AS BIGINT)
        |      + CAST(list_contains(words, 'have') AS BIGINT)
        |      + CAST(list_contains(words, 'with') AS BIGINT) AS stop_hits
        |  FROM m
        |)
        |SELECT doc_id, n_words, n_lines,
        |  round(CAST(sum_len AS DOUBLE) / n_words, 6) AS mean_word_len,
        |  round(CAST(n_hash + n_ell AS DOUBLE) / n_words, 6) AS symbol_ratio,
        |  round(CAST(n_bullet AS DOUBLE) / n_lines, 6) AS bullet_frac,
        |  round(CAST(n_ellline AS DOUBLE) / n_lines, 6) AS ellipsis_frac,
        |  round(CAST(n_alpha AS DOUBLE) / n_words, 6) AS alpha_frac,
        |  stop_hits,
        |  (n_words >= 50 AND n_words <= 100000
        |   AND sum_len >= 3 * n_words AND sum_len <= 10 * n_words
        |   AND 10 * (n_hash + n_ell) <= n_words
        |   AND 10 * n_bullet <= 9 * n_lines
        |   AND 10 * n_ellline <= 3 * n_lines
        |   AND 5 * n_alpha >= 4 * n_words
        |   AND stop_hits >= 2) AS pass
        |FROM c ORDER BY doc_id""".stripMargin,

    // mirror of quality_c4: the planting (10-token lines, punct by
    // (id+i)%3, four residue-class artifact lines) is restated 1:1,
    // then the C4 line rules (ends_with on 4 literal chars, ≥5
    // single-space words, no 'javascript') and page rules — the
    // scrubbed text md5 proves the whole line-filter pipeline, not
    // just the counts
    "quality_c4" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), lined AS (
        |  SELECT doc_id,
        |    [array_to_string(toks[(i-1)*10+1 : (i-1)*10+10], ' ')
        |       || CASE WHEN (doc_id + (i-1)) % 3 = 0 THEN '.'
        |               WHEN (doc_id + (i-1)) % 3 = 2 THEN '?'
        |               ELSE '' END
        |     FOR i IN range(1, CAST(ceil(len(toks) / 10.0) AS BIGINT) + 1)]
        |    || CASE WHEN doc_id % 3 = 0
        |            THEN ['please enable javascript to view this page.']
        |            ELSE CAST([] AS VARCHAR[]) END
        |    || CASE WHEN doc_id % 4 = 0
        |            THEN ['terms of use.'] ELSE CAST([] AS VARCHAR[]) END
        |    || CASE WHEN doc_id % 7 = 0
        |            THEN ['lorem ipsum dolor sit amet.']
        |            ELSE CAST([] AS VARCHAR[]) END
        |    || CASE WHEN doc_id % 11 = 0
        |            THEN ['function() { return 0; }']
        |            ELSE CAST([] AS VARCHAR[]) END AS lines
        |  FROM base
        |), doc AS (
        |  SELECT doc_id, lower(array_to_string(lines, chr(10))) AS t FROM lined
        |), m AS (
        |  SELECT doc_id, t, string_split(t, chr(10)) AS lns,
        |    list_filter(string_split(t, chr(10)), l ->
        |      (ends_with(l, '.') OR ends_with(l, '!') OR ends_with(l, '?')
        |         OR ends_with(l, '"'))
        |      AND len(string_split(l, ' ')) >= 5
        |      AND NOT contains(l, 'javascript')) AS kept
        |  FROM doc
        |), c AS (
        |  SELECT doc_id, t, lns, kept,
        |    -- array_to_string([]) is NULL in DuckDB; Spark's
        |    -- array_join([]) is '' — coalesce to match
        |    coalesce(array_to_string(kept, chr(10)), '') AS kt
        |  FROM m
        |), s AS (
        |  SELECT doc_id,
        |    CAST(len(lns) AS BIGINT) AS n_lines,
        |    CAST(len(kept) AS BIGINT) AS kept_lines,
        |    CAST(len(list_filter(lns, l ->
        |      NOT (ends_with(l, '.') OR ends_with(l, '!')
        |           OR ends_with(l, '?') OR ends_with(l, '"'))))
        |      AS BIGINT) AS drop_no_punct,
        |    CAST(len(list_filter(lns, l ->
        |      (ends_with(l, '.') OR ends_with(l, '!') OR ends_with(l, '?')
        |         OR ends_with(l, '"'))
        |      AND len(string_split(l, ' ')) < 5)) AS BIGINT) AS drop_short,
        |    CAST(len(list_filter(lns, l ->
        |      (ends_with(l, '.') OR ends_with(l, '!') OR ends_with(l, '?')
        |         OR ends_with(l, '"'))
        |      AND len(string_split(l, ' ')) >= 5
        |      AND contains(l, 'javascript'))) AS BIGINT) AS drop_js,
        |    CAST(len(kt) - len(replace(kt, '.', ''))
        |       + len(kt) - len(replace(kt, '!', ''))
        |       + len(kt) - len(replace(kt, '?', '')) AS BIGINT) AS n_sentences,
        |    contains(t, 'lorem ipsum') AS has_lorem,
        |    contains(t, '{') AS has_brace,
        |    md5(kt) AS scrub_md5
        |  FROM c
        |)
        |SELECT doc_id, n_lines, kept_lines, drop_no_punct, drop_short,
        |  drop_js, n_sentences, has_lorem, has_brace,
        |  (n_sentences >= 3 AND NOT has_lorem AND NOT has_brace) AS pass,
        |  scrub_md5
        |FROM s ORDER BY doc_id""".stripMargin,

    // mirror of clf_train_moments: the quality_c4 planting + signal
    // derivation restated 1:1, features unpivoted (8 signals, 8
    // md5-top-60-bit token buckets, intercept), XᵀX upper triangle +
    // Xᵀy as exact-integer pair products — the whole training input
    // of the ridge solve, cross-engine
    "clf_train_moments" -> clfMomentsSqlW("TRUE"),

    // the SEGMENT-INCREMENTAL moments over the lifecycle store serve
    // the live rows — same mirror under the live predicate, so any
    // drift in the netted partials is a hash mismatch
    "clf_moments_store_incr" -> clfMomentsSqlW(lifecycleLive)) ++ tailSql

  // mirror of clf_train_moments (parameterized by the corpus
  // predicate): the quality_c4 planting + signal derivation restated
  // 1:1, features unpivoted (8 signals, 8 md5-top-60-bit token
  // buckets, intercept), XᵀX upper triangle + Xᵀy as exact-integer
  // pair products — the whole training input of the ridge solve,
  // cross-engine
  private def clfMomentsSqlW(where: String) =
      s"""WITH base AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  WHERE $where
        |), lined AS (
        |  SELECT doc_id,
        |    [array_to_string(toks[(i-1)*10+1 : (i-1)*10+10], ' ')
        |       || CASE WHEN (doc_id + (i-1)) % 3 = 0 THEN '.'
        |               WHEN (doc_id + (i-1)) % 3 = 2 THEN '?'
        |               ELSE '' END
        |     FOR i IN range(1, CAST(ceil(len(toks) / 10.0) AS BIGINT) + 1)]
        |    || CASE WHEN doc_id % 3 = 0
        |            THEN ['please enable javascript to view this page.']
        |            ELSE CAST([] AS VARCHAR[]) END
        |    || CASE WHEN doc_id % 4 = 0
        |            THEN ['terms of use.'] ELSE CAST([] AS VARCHAR[]) END
        |    || CASE WHEN doc_id % 7 = 0
        |            THEN ['lorem ipsum dolor sit amet.']
        |            ELSE CAST([] AS VARCHAR[]) END
        |    || CASE WHEN doc_id % 11 = 0
        |            THEN ['function() { return 0; }']
        |            ELSE CAST([] AS VARCHAR[]) END AS lines
        |  FROM base
        |), doc AS (
        |  SELECT doc_id, lower(array_to_string(lines, chr(10))) AS t FROM lined
        |), m AS (
        |  SELECT doc_id, t, string_split(t, chr(10)) AS lns,
        |    list_filter(string_split(t, chr(10)), l ->
        |      (ends_with(l, '.') OR ends_with(l, '!') OR ends_with(l, '?')
        |         OR ends_with(l, '"'))
        |      AND len(string_split(l, ' ')) >= 5
        |      AND NOT contains(l, 'javascript')) AS kept
        |  FROM doc
        |), c AS (
        |  SELECT doc_id, t, lns, kept,
        |    coalesce(array_to_string(kept, chr(10)), '') AS kt
        |  FROM m
        |), s AS (
        |  SELECT doc_id,
        |    CAST(len(lns) AS BIGINT) AS n_lines,
        |    CAST(len(kept) AS BIGINT) AS kept_lines,
        |    CAST(len(list_filter(lns, l ->
        |      NOT (ends_with(l, '.') OR ends_with(l, '!')
        |           OR ends_with(l, '?') OR ends_with(l, '"'))))
        |      AS BIGINT) AS drop_no_punct,
        |    CAST(len(list_filter(lns, l ->
        |      (ends_with(l, '.') OR ends_with(l, '!') OR ends_with(l, '?')
        |         OR ends_with(l, '"'))
        |      AND len(string_split(l, ' ')) < 5)) AS BIGINT) AS drop_short,
        |    CAST(len(list_filter(lns, l ->
        |      (ends_with(l, '.') OR ends_with(l, '!') OR ends_with(l, '?')
        |         OR ends_with(l, '"'))
        |      AND len(string_split(l, ' ')) >= 5
        |      AND contains(l, 'javascript'))) AS BIGINT) AS drop_js,
        |    CAST(len(kt) - len(replace(kt, '.', ''))
        |       + len(kt) - len(replace(kt, '!', ''))
        |       + len(kt) - len(replace(kt, '?', '')) AS BIGINT) AS n_sentences,
        |    contains(t, 'lorem ipsum') AS has_lorem,
        |    contains(t, '{') AS has_brace
        |  FROM c
        |), feat AS (
        |  SELECT doc_id, 0 AS j, n_lines AS x FROM s
        |  UNION ALL SELECT doc_id, 1, kept_lines FROM s
        |  UNION ALL SELECT doc_id, 2, drop_no_punct FROM s
        |  UNION ALL SELECT doc_id, 3, drop_short FROM s
        |  UNION ALL SELECT doc_id, 4, drop_js FROM s
        |  UNION ALL SELECT doc_id, 5, n_sentences FROM s
        |  UNION ALL SELECT doc_id, 6,
        |    CASE WHEN has_lorem THEN 1 ELSE 0 END FROM s
        |  UNION ALL SELECT doc_id, 7,
        |    CASE WHEN has_brace THEN 1 ELSE 0 END FROM s
        |  UNION ALL
        |  SELECT doc_id,
        |    CAST(8 + (('0x' || substr(md5(tok), 1, 15))::BIGINT % 8) AS INT),
        |    count(*)
        |  FROM (SELECT doc_id, unnest(string_split(t, ' ')) AS tok FROM doc)
        |  GROUP BY 1, 2
        |  UNION ALL SELECT doc_id, 16, 1 FROM s
        |), lab AS (
        |  SELECT doc_id,
        |    CASE WHEN n_sentences >= 3 AND NOT has_lorem AND NOT has_brace
        |         THEN 1 ELSE 0 END AS y
        |  FROM s
        |), xtx AS (
        |  SELECT a.j AS i, b.j AS j, CAST(sum(a.x * b.x) AS BIGINT) AS v
        |  FROM feat a JOIN feat b
        |    ON a.doc_id = b.doc_id AND a.j <= b.j
        |  GROUP BY 1, 2
        |), xty AS (
        |  SELECT f.j AS i, 17 AS j, CAST(sum(f.x * y) AS BIGINT) AS v
        |  FROM feat f JOIN lab USING (doc_id) GROUP BY 1
        |)
        |SELECT i, j, v FROM (SELECT * FROM xtx UNION ALL SELECT * FROM xty)
        |ORDER BY i, j""".stripMargin

  /** the tail of the query mirrors (split from `mapped` so the
    * clf-moments builder def can sit between the two halves)
    */
  private lazy val tailSql: Map[String, String] = Map(
    // mirror of text_tfidf_terms: the row_number() spelling of the
    // bounded-heap top-k, same micro-ln idf longs
    "text_tfidf_terms" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents WHERE text IS NOT NULL
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
        |), dfq AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY term
        |), nd AS (
        |  SELECT count(*) AS n_docs FROM documents WHERE text IS NOT NULL
        |), s AS (
        |  SELECT doc_id, tf.term AS term, tf, df,
        |    tf * (CAST(round(ln(CAST(n_docs + 1 AS DOUBLE)) * 1e6, 0) AS BIGINT)
        |        - CAST(round(ln(CAST(df + 1 AS DOUBLE)) * 1e6, 0) AS BIGINT))
        |      AS score_micro
        |  FROM tf JOIN dfq USING (term) CROSS JOIN nd
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score_micro DESC, term ASC) AS rnk
        |  FROM s
        |)
        |SELECT doc_id, rnk, term, tf, df, score_micro
        |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,

    // mirror of text_lm_score: bigram pairs by position, add-1
    // conditional log-probs in exact micro-ln longs, one display
    // division
    "text_lm_score" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks
        |  FROM documents
        |), bg AS (
        |  SELECT doc_id, u.w1, u.w2 FROM base,
        |    LATERAL unnest([struct_pack(w1 := toks[i], w2 := toks[i+1])
        |                    FOR i IN range(1, len(toks))]) AS t(u)
        |  WHERE len(toks) >= 2
        |), c12 AS (
        |  SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2
        |), c1 AS (
        |  SELECT w1, count(*) AS c1 FROM bg GROUP BY w1
        |), v AS (
        |  SELECT count(DISTINCT t) AS v
        |  FROM (SELECT unnest(toks) AS t FROM base)
        |), s AS (
        |  SELECT doc_id, count(*) AS n_bigrams,
        |    sum(CAST(round(ln(CAST(c12 + 1 AS DOUBLE)) * 1e6, 0) AS BIGINT)
        |      - CAST(round(ln(CAST(c1 + v AS DOUBLE)) * 1e6, 0) AS BIGINT))
        |      AS sum_lp_micro
        |  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
        |  GROUP BY doc_id
        |)
        |SELECT doc_id, n_bigrams, CAST(sum_lp_micro AS BIGINT) AS sum_lp_micro,
        |  round(CAST(sum_lp_micro AS DOUBLE) /
        |        (CAST(n_bigrams AS DOUBLE) * 1e6), 6) AS avg_logp
        |FROM s ORDER BY doc_id""".stripMargin,

    // mirror of TextAnalysis.tokenEntropy: exact-long token counts,
    // integer micro-ln weights, one final division.
    "text_entropy" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        |  FROM documents WHERE text IS NOT NULL
        |), cnt AS (
        |  SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok
        |), agg AS (
        |  SELECT doc_id,
        |         CAST(sum(c) AS BIGINT) AS n,
        |         count(*) AS n_distinct,
        |         CAST(sum(c * CAST(round(ln(CAST(c AS DOUBLE)) * 1000000, 0)
        |                           AS BIGINT)) AS BIGINT) AS sum_clnc
        |  FROM cnt GROUP BY doc_id
        |)
        |SELECT doc_id, n, n_distinct,
        |  round(CAST(n * CAST(round(ln(CAST(n AS DOUBLE)) * 1000000, 0) AS BIGINT)
        |             - sum_clnc AS DOUBLE)
        |        / (CAST(n AS DOUBLE) * 1000000), 6) AS entropy
        |FROM agg ORDER BY doc_id""".stripMargin,

    "text_langid" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(lower(text),' '), t -> t IN ('the','and','of','to','a','in','is','that'))) AS c_en,
        |    len(list_filter(string_split(lower(text),' '), t -> t IN ('le','la','et','de','un','une','est','que'))) AS c_fr,
        |    len(list_filter(string_split(lower(text),' '), t -> t IN ('el','la','y','de','un','una','es','que'))) AS c_es,
        |    len(list_filter(string_split(lower(text),' '), t -> t IN ('der','die','und','das','ein','ist','zu','den'))) AS c_de
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CASE WHEN greatest(c_en, c_fr, c_es, c_de) <= 0 THEN 'und'
        |       WHEN c_en = greatest(c_en, c_fr, c_es, c_de) THEN 'en'
        |       WHEN c_fr = greatest(c_en, c_fr, c_es, c_de) THEN 'fr'
        |       WHEN c_es = greatest(c_en, c_fr, c_es, c_de) THEN 'es'
        |       ELSE 'de' END AS pred_lang,
        |  greatest(c_en, c_fr, c_es, c_de) AS score
        |FROM c ORDER BY doc_id""".stripMargin,

    // mirror of text_langid_confusion: the langid CTE joined to the
    // labeled lang, row-normalized over the confusion table
    "text_langid_confusion" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(lower(text),' '), t -> t IN ('the','and','of','to','a','in','is','that'))) AS c_en,
        |    len(list_filter(string_split(lower(text),' '), t -> t IN ('le','la','et','de','un','une','est','que'))) AS c_fr,
        |    len(list_filter(string_split(lower(text),' '), t -> t IN ('el','la','y','de','un','una','es','que'))) AS c_es,
        |    len(list_filter(string_split(lower(text),' '), t -> t IN ('der','die','und','das','ein','ist','zu','den'))) AS c_de
        |  FROM documents
        |), p AS (
        |  SELECT doc_id,
        |    CASE WHEN greatest(c_en, c_fr, c_es, c_de) <= 0 THEN 'und'
        |         WHEN c_en = greatest(c_en, c_fr, c_es, c_de) THEN 'en'
        |         WHEN c_fr = greatest(c_en, c_fr, c_es, c_de) THEN 'fr'
        |         WHEN c_es = greatest(c_en, c_fr, c_es, c_de) THEN 'es'
        |         ELSE 'de' END AS pred_lang
        |  FROM c
        |), m AS (
        |  SELECT d.lang, p.pred_lang, count(*) AS n
        |  FROM documents d JOIN p ON d.doc_id = p.doc_id
        |  GROUP BY d.lang, p.pred_lang
        |)
        |SELECT lang, pred_lang, n,
        |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY lang), 6)
        |    AS frac
        |FROM m ORDER BY lang, pred_lang""".stripMargin,

    "text_tokencount" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS re_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(
        |    string_split(lower(text), ' '))), ' ')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "pipeline_curate" ->
      s"""WITH q AS (
        |  SELECT doc_id FROM documents
        |  WHERE round(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
        |          / nullif(length(text), 0) * 0.5
        |        + least(CAST(len(list_filter(string_split(lower(text), ' '),
        |            t -> t IN ($stopEn))) AS DOUBLE)
        |            / nullif(len(string_split(text, ' ')), 0) * 5.0, 1.0) * 0.5, 6) >= 0.6
        |), good AS (
        |  SELECT d.* FROM documents d JOIN q USING (doc_id)
        |), kept AS (
        |  SELECT min(doc_id) AS doc_id FROM good GROUP BY md5(text)
        |)
        |SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars
        |FROM good JOIN kept USING (doc_id)
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // mirror of pipeline_report: the same stage flags (corpus-wide
    // min-id dedup keep + the pipeline_curate quality expression)
    // left-joined and aggregated per source
    "pipeline_report" ->
      s"""WITH kept AS (
        |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
        |), q AS (
        |  SELECT doc_id,
        |    (round(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
        |        / nullif(length(text), 0) * 0.5
        |      + least(CAST(len(list_filter(string_split(lower(text), ' '),
        |          t -> t IN ($stopEn))) AS DOUBLE)
        |          / nullif(len(string_split(text, ' ')), 0) * 5.0, 1.0) * 0.5,
        |      6) >= 0.6) AS ok
        |  FROM documents
        |)
        |SELECT source,
        |  count(*) AS n_total,
        |  CAST(sum(CASE WHEN k.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_dedup,
        |  CAST(sum(CASE WHEN k.doc_id IS NOT NULL AND q.ok THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_quality,
        |  round(CAST(sum(CASE WHEN k.doc_id IS NOT NULL AND q.ok
        |                      THEN 1 ELSE 0 END) AS DOUBLE)
        |        / count(*), 6) AS retention,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_total,
        |  CAST(sum(CASE WHEN k.doc_id IS NOT NULL AND q.ok THEN n_chars
        |                ELSE 0 END) AS BIGINT) AS chars_kept
        |FROM documents d
        |LEFT JOIN kept k ON d.doc_id = k.doc_id
        |JOIN q ON d.doc_id = q.doc_id
        |GROUP BY source ORDER BY source""".stripMargin,

    "text_repetition" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
        |), b AS (
        |  SELECT doc_id,
        |    round(CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE)
        |      / len(toks), 6) AS dup_word_frac,
        |    CASE WHEN len(toks) >= 2 THEN
        |      [array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks))]
        |    ELSE [] END AS bgs
        |  FROM base
        |), c AS (
        |  SELECT doc_id, bg, count(*) AS c FROM (
        |    SELECT doc_id, unnest(bgs) AS bg FROM b
        |  ) GROUP BY doc_id, bg
        |), t AS (
        |  SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 6)
        |    AS top_bigram_frac
        |  FROM c GROUP BY doc_id
        |)
        |SELECT b.doc_id, b.dup_word_frac,
        |  coalesce(t.top_bigram_frac, 0.0) AS top_bigram_frac
        |FROM b LEFT JOIN t ON b.doc_id = t.doc_id
        |ORDER BY b.doc_id""".stripMargin,

    "pipeline_shards" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
        |  FROM documents
        |), c AS (
        |  SELECT source, doc_id, ntok,
        |    sum(ntok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t
        |)
        |SELECT source AS part,
        |  CAST(floor((cum - ntok) / 2000.0) AS BIGINT) AS shard,
        |  count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS n_tokens
        |FROM c GROUP BY part, shard ORDER BY part, shard""".stripMargin,

    // concat-and-chunk: each doc occupies token span [st, e) of its
    // part's concatenated stream and touches chunks ⌊st/128⌋..⌊(e-1)/128⌋
    "pipeline_chunks" ->
      """WITH t AS (
        |  SELECT source AS part, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
        |  FROM documents
        |), c AS (
        |  SELECT part, doc_id, ntok,
        |    sum(ntok) OVER (PARTITION BY part ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS e
        |  FROM t
        |), s AS (
        |  SELECT part, ntok, e, e - ntok AS st FROM c WHERE ntok > 0
        |), x AS (
        |  SELECT part, e, st,
        |    unnest(range(CAST(st // 128 AS BIGINT),
        |                 CAST((e - 1) // 128 + 1 AS BIGINT))) AS chunk
        |  FROM s
        |)
        |SELECT part, CAST(chunk AS BIGINT) AS chunk,
        |  count(*) AS n_docs,
        |  CAST(sum(CASE WHEN st // 128 = chunk THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_starts,
        |  CAST(sum(least(e, (chunk + 1) * 128) - greatest(st, chunk * 128))
        |    AS BIGINT) AS n_tokens
        |FROM x GROUP BY part, chunk ORDER BY part, chunk""".stripMargin,

    // flat per-(group, dim) embedding moments; double-widened element
    // math and round(,6) mirror the Spark side exactly
    "embed_group_stats" ->
      """WITH x AS (
        |  SELECT vec_id % 8 AS grp, embedding,
        |    unnest(range(1, len(embedding) + 1)) AS i
        |  FROM embeddings
        |)
        |SELECT grp, CAST(i - 1 AS INT) AS dim,
        |  count(*) AS n,
        |  round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS mean,
        |  round(avg(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), 6)
        |    AS mean_sq
        |FROM x GROUP BY grp, dim ORDER BY grp, dim""".stripMargin,

    "multimodal_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS content_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the decode query round-trips REAL PNGs whose dimensions/colour
    // are pure functions of doc_id — so the expected decoder output is
    // plain SQL (solid-colour image: channel mean == the channel value)
    "multimodal_decode" ->
      """SELECT doc_id,
        |  16 + doc_id % 16 AS width,
        |  16 + (doc_id // 16) % 16 AS height,
        |  round((doc_id % 256) / 255.0, 6) AS mean_r,
        |  round((doc_id * 7 % 256) / 255.0, 6) AS mean_g,
        |  round((doc_id * 13 % 256) / 255.0, 6) AS mean_b
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the audio query round-trips REAL WAVs whose amplitude/length are
    // pure functions of doc_id: a Nyquist square wave's |sample| is
    // its amplitude everywhere, so peak == RMS == amp exactly (sqrt
    // of a perfect square is exact in IEEE for amp < 2^26)
    // mirror of Multimodal.syntheticGradientPayload + dHashes: the
    // 9x8 gradient's pixels are closed-form in doc_id, so the decode→
    // dHash→group route is re-derived arithmetically — the global
    // brightness jitter term drops out of the comparisons exactly as
    // it does in the decoded raster.
    "multimodal_phash" ->
      """WITH par AS (
        |  SELECT doc_id,
        |         29 + ((doc_id % 16) * 37) % 151 AS a,
        |         11 + ((doc_id % 16) * 53) % 97 AS b
        |  FROM documents
        |), bits AS (
        |  SELECT doc_id, y, x,
        |    CASE WHEN (x*a + y*b) % 200 < ((x+1)*a + y*b) % 200
        |         THEN 1 ELSE 0 END AS bit
        |  FROM par, range(0, 8) t1(y), range(0, 8) t2(x)
        |), rowbytes AS (
        |  SELECT doc_id, y, CAST(sum(bit * (1 << x)) AS INT) AS rb
        |  FROM bits GROUP BY doc_id, y
        |), hashes AS (
        |  SELECT doc_id, string_agg(printf('%02x', rb), '' ORDER BY y) AS phash
        |  FROM rowbytes GROUP BY doc_id
        |), grp AS (
        |  SELECT phash, count(*) AS n_docs, min(doc_id) AS rep
        |  FROM hashes GROUP BY phash
        |)
        |SELECT h.doc_id, h.phash, n_docs, rep
        |FROM hashes h JOIN grp USING (phash) ORDER BY h.doc_id""".stripMargin,

    // mirror of Multimodal.phashNearDups over the same re-derived
    // payload formula: distinct hashes + mass, 32-bit halves parsed
    // from the hex, 16×4-bit bands, shared-band candidate pairs,
    // exact hamming (xor + bit_count) ≤ 15
    "multimodal_dedup" ->
      """WITH par AS (
        |  SELECT doc_id,
        |         29 + ((doc_id % 16) * 37) % 151 AS a,
        |         11 + ((doc_id % 16) * 53) % 97 AS b
        |  FROM documents
        |), bits AS (
        |  SELECT doc_id, y, x,
        |    CASE WHEN (x*a + y*b) % 200 < ((x+1)*a + y*b) % 200
        |         THEN 1 ELSE 0 END AS bit
        |  FROM par, range(0, 8) t1(y), range(0, 8) t2(x)
        |), rowbytes AS (
        |  SELECT doc_id, y, CAST(sum(bit * (1 << x)) AS INT) AS rb
        |  FROM bits GROUP BY doc_id, y
        |), hashes AS (
        |  SELECT doc_id, string_agg(printf('%02x', rb), '' ORDER BY y) AS phash
        |  FROM rowbytes GROUP BY doc_id
        |), base AS (
        |  SELECT phash, count(*) AS n, min(doc_id) AS rep,
        |         ('0x' || substr(phash, 1, 8))::BIGINT AS hi,
        |         ('0x' || substr(phash, 9, 8))::BIGINT AS lo
        |  FROM hashes GROUP BY phash
        |), banded AS (
        |  SELECT phash, hi, lo, n, rep, i.i AS band,
        |         CASE WHEN i.i < 8 THEN (lo >> (4 * i.i)) & 15
        |              ELSE (hi >> (4 * (i.i - 8))) & 15 END AS key
        |  FROM base CROSS JOIN range(0, 16) i(i)
        |), cand AS (
        |  SELECT DISTINCT a.phash AS pa, b.phash AS pb,
        |         a.hi AS ha, a.lo AS la, b.hi AS hb, b.lo AS lb,
        |         a.n AS n_a, b.n AS n_b, a.rep AS rep_a, b.rep AS rep_b
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.key = b.key AND a.phash < b.phash
        |)
        |SELECT pa AS a_hash, pb AS b_hash,
        |  CAST(bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) AS BIGINT)
        |    AS dist,
        |  n_a, n_b, rep_a, rep_b
        |FROM cand
        |WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= 15
        |ORDER BY a_hash, b_hash""".stripMargin,

    "multimodal_audio" ->
      """SELECT doc_id,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(800 + doc_id % 800 AS BIGINT) AS n_samples,
        |  round(CAST(800 + doc_id % 800 AS DOUBLE) / 8000, 6)
        |    AS duration_s,
        |  CAST((doc_id * 37) % 10000 AS BIGINT) AS peak,
        |  round(CAST((doc_id * 37) % 10000 AS DOUBLE), 6) AS rms
        |FROM documents ORDER BY doc_id""".stripMargin,

    // mirror of multimodal_audio_frames: the alternating ±amp square
    // wave makes every 160-sample frame closed-form — zc = cnt−1 when
    // amp>0 (every adjacent pair flips sign), energy = cnt·amp²
    "multimodal_audio_frames" ->
      """WITH p AS (
        |  SELECT doc_id, 800 + doc_id % 800 AS ns,
        |         (doc_id * 37) % 10000 AS amp
        |  FROM documents
        |), f AS (
        |  SELECT doc_id, ns, amp,
        |    unnest(range(0, (ns + 159) // 160)) AS frame_no
        |  FROM p
        |)
        |SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
        |  CAST(least(160, ns - frame_no * 160) AS BIGINT) AS n,
        |  CAST(CASE WHEN amp > 0
        |            THEN least(160, ns - frame_no * 160) - 1
        |            ELSE 0 END AS BIGINT) AS zc,
        |  CAST(amp * amp * least(160, ns - frame_no * 160) AS BIGINT)
        |    AS energy,
        |  CAST(amp AS BIGINT) AS peak
        |FROM f ORDER BY doc_id, frame_no""".stripMargin,

    // sampled frames 0 and 2 of the 4-frame container; colour/size
    // are pure functions of (doc_id, frame_idx)
    "multimodal_frames" ->
      """SELECT doc_id, frame_idx,
        |  CAST(8 + frame_idx AS BIGINT) AS width,
        |  CAST(8 + doc_id % 8 AS BIGINT) AS height,
        |  round(((doc_id + 31 * frame_idx) % 256) / 255.0, 6) AS mean_r,
        |  round(((doc_id * 7 + 17 * frame_idx) % 256) / 255.0, 6) AS mean_g,
        |  round(((doc_id * 13 + 29 * frame_idx) % 256) / 255.0, 6) AS mean_b
        |FROM documents
        |CROSS JOIN (SELECT CAST(unnest([0, 2]) AS BIGINT) AS frame_idx)
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // solid-colour payloads: each channel's w·h pixels land in ONE
    // 32-wide bin that is a pure function of doc_id
    "multimodal_features" ->
      """SELECT doc_id, channel,
        |  CAST(CASE channel
        |    WHEN 'r' THEN (doc_id % 256) // 32
        |    WHEN 'g' THEN (doc_id * 7 % 256) // 32
        |    ELSE (doc_id * 13 % 256) // 32 END AS BIGINT) AS bin,
        |  CAST((16 + doc_id % 16) * (16 + (doc_id // 16) % 16) AS BIGINT)
        |    AS n_px
        |FROM documents
        |CROSS JOIN (SELECT unnest(['r', 'g', 'b']) AS channel)
        |ORDER BY doc_id, channel, bin""".stripMargin,

    // resize to 8×8 preserves a solid colour's channel means exactly
    "multimodal_resize" ->
      """SELECT doc_id,
        |  CAST(8 AS BIGINT) AS width,
        |  CAST(8 AS BIGINT) AS height,
        |  round((doc_id % 256) / 255.0, 6) AS mean_r,
        |  round((doc_id * 7 % 256) / 255.0, 6) AS mean_g,
        |  round((doc_id * 13 % 256) / 255.0, 6) AS mean_b
        |FROM documents ORDER BY doc_id""".stripMargin,

    // 8-token shingles over NORMALIZED text (lowercase, strip
    // non-alphanumerics, collapse spaces — mirrors the operator);
    // eval slice = doc_id % 20 == 0. DuckDB range(1, n) is
    // end-exclusive and t[i:j] is inclusive — both tuned to mirror
    // Spark's sequence(1, size-7) + slice(t, i, 8).
    "decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(trim(
        |    regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS t
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, doc_id % 20 = 0 AS is_eval,
        |    unnest(list_transform(range(1, len(t) - 6),
        |      i -> array_to_string(t[i:i+7], ' '))) AS sh
        |  FROM toks WHERE len(t) >= 8
        |), ev AS (SELECT DISTINCT sh FROM sh WHERE is_eval)
        |SELECT s.doc_id, count(DISTINCT s.sh) AS n_hits
        |FROM sh s JOIN ev USING (sh) WHERE NOT s.is_eval
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,

    // distinct shingles per doc (list_distinct mirrors the kernel's
    // distinct=true); LEFT join keeps zero-overlap docs, ratio =
    // hits/denominator rounded 6dp on both sides
    "decontaminate_overlap" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(trim(
        |    regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS t
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, doc_id % 20 = 0 AS is_eval,
        |    unnest(list_distinct(list_transform(range(1, len(t) - 6),
        |      i -> array_to_string(t[i:i+7], ' ')))) AS sh
        |  FROM toks WHERE len(t) >= 8
        |), ev AS (SELECT DISTINCT sh FROM sh WHERE is_eval)
        |SELECT doc_id, n_shingles, n_hits, ratio,
        |  ratio >= 0.5 AS contaminated
        |FROM (
        |  SELECT s.doc_id, count(*) AS n_shingles,
        |    count(e.sh) AS n_hits,
        |    round(CAST(count(e.sh) AS DOUBLE) / count(*), 6) AS ratio
        |  FROM sh s LEFT JOIN ev e ON s.sh = e.sh
        |  WHERE NOT s.is_eval GROUP BY s.doc_id
        |) ORDER BY doc_id""".stripMargin,

    // range(1, n) is end-exclusive → pair starts 1..n-1; substring is
    // 1-based on both engines; (n DESC, pair) makes the top-200 cut
    // deterministic under ties
    "text_bpe_pairs" ->
      """WITH words AS (
        |  SELECT unnest(string_split(trim(
        |    regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS w
        |  FROM documents
        |), pairs AS (
        |  SELECT unnest(list_transform(range(1, length(w)),
        |    i -> substring(w, i, 2))) AS pair
        |  FROM words WHERE length(w) >= 2
        |)
        |SELECT pair, count(*) AS n FROM pairs GROUP BY pair
        |ORDER BY n DESC, pair LIMIT 200""".stripMargin,

    // vocab ids dense in (freq DESC, token ASC) order over the top
    // 512; the id window runs over the grouped counts BEFORE the
    // limit on both engines, so ids agree; position only orders the
    // per-doc sequence (Spark's posexplode is 0-based,
    // generate_subscripts 1-based — irrelevant to the ordering)
    "text_tokenize_ids" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(trim(
        |    regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS t
        |  FROM documents
        |), stream AS (
        |  SELECT doc_id, unnest(t) AS tok,
        |    generate_subscripts(t, 1) AS pos
        |  FROM toks
        |), vocab AS (
        |  SELECT tok,
        |    row_number() OVER (ORDER BY count(*) DESC, tok) - 1 AS tok_id
        |  FROM stream GROUP BY tok
        |  ORDER BY count(*) DESC, tok LIMIT 512
        |)
        |SELECT s.doc_id,
        |  string_agg(CAST(coalesce(v.tok_id, -1) AS VARCHAR),
        |             ',' ORDER BY s.pos) AS token_ids,
        |  count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN v.tok_id IS NULL THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_oov
        |FROM stream s LEFT JOIN vocab v ON s.tok = v.tok
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,

    // IDENTICAL oracle to decontaminate: the bloom path is a map-side
    // prefilter + exact verify, so any sketch-induced loss (a missed
    // hit, a surviving false positive) is a hash mismatch here
    "decontaminate_bloom" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(trim(
        |    regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS t
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, doc_id % 20 = 0 AS is_eval,
        |    unnest(list_transform(range(1, len(t) - 6),
        |      i -> array_to_string(t[i:i+7], ' '))) AS sh
        |  FROM toks WHERE len(t) >= 8
        |), ev AS (SELECT DISTINCT sh FROM sh WHERE is_eval)
        |SELECT s.doc_id, count(DISTINCT s.sh) AS n_hits
        |FROM sh s JOIN ev USING (sh) WHERE NOT s.is_eval
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,

    // bigram stream mirrors text_repetition's full-window list
    // comprehension (range is end-exclusive, slices inclusive); the
    // per-doc aggregates are exact long sums with one final division,
    // so doubles are bit-identical across engines
    "text_bigram_lm" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
        |), bg AS (
        |  SELECT doc_id,
        |    unnest([array_to_string(toks[i:i+1], ' ')
        |            FOR i IN range(1, len(toks))]) AS bg
        |  FROM base WHERE len(toks) >= 2
        |), c AS (
        |  SELECT doc_id, count(*) OVER (PARTITION BY bg) AS c FROM bg
        |)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(CAST(sum(c) AS DOUBLE) / count(*), 6) AS avg_bigram_freq,
        |  round(CAST(sum(CASE WHEN c <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |        / count(*), 6) AS novel_frac
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // mirror of Curation.ccnetBuckets: the text_bigram_lm signal CTEs
    // + per-lang rank/count windows + the exact tertile cuts
    "sample_ccnet_buckets" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
        |), bg AS (
        |  SELECT doc_id,
        |    unnest([array_to_string(toks[i:i+1], ' ')
        |            FOR i IN range(1, len(toks))]) AS bg
        |  FROM base WHERE len(toks) >= 2
        |), c AS (
        |  SELECT doc_id, count(*) OVER (PARTITION BY bg) AS c FROM bg
        |), nov AS (
        |  SELECT doc_id,
        |    round(CAST(sum(c) AS DOUBLE) / count(*), 6) AS avg_bigram_freq
        |  FROM c GROUP BY doc_id
        |), j AS (
        |  SELECT d.lang AS stratum, n.doc_id, n.avg_bigram_freq,
        |    CAST(row_number() OVER (PARTITION BY d.lang
        |      ORDER BY n.avg_bigram_freq DESC, n.doc_id) AS BIGINT) AS rnk,
        |    count(*) OVER (PARTITION BY d.lang) AS n
        |  FROM nov n JOIN documents d ON n.doc_id = d.doc_id
        |)
        |SELECT stratum, doc_id, avg_bigram_freq, rnk,
        |  CASE WHEN rnk * 3 <= n THEN 'head'
        |       WHEN rnk * 3 <= n * 2 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM j ORDER BY doc_id""".stripMargin,

    // lexicographic order on fixed-width lowercase md5 hex == numeric
    // hash order, identical in both engines
    "sample_stratified" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents) WHERE rn <= 10 ORDER BY doc_id""".stripMargin,

    // mirror of Curation.domainCap: quality gate first (integer length
    // bounds), then per-source md5-order rank and eligible count, cap
    // 15
    "sample_domain_cap" ->
      """SELECT source, doc_id, rn, n_pass FROM (
        |  SELECT source, doc_id,
        |    CAST(row_number() OVER (
        |      PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
        |      AS rn,
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_pass
        |  FROM documents
        |  WHERE length(text) BETWEEN 100 AND 400
        |) WHERE rn <= 15 ORDER BY source, doc_id""".stripMargin,

    // the naive global-window spelling IS the oracle; the measured
    // query computes the same permutation with the two-phase rank
    "shuffle_global" ->
      """SELECT doc_id, row_number() OVER (
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS pos
        |FROM documents ORDER BY pos""".stripMargin,

    // quota = max(1, floor(4·sqrt(n))) per source: a single
    // correctly-rounded IEEE sqrt times a power-of-two coefficient —
    // bit-identical across engines (no cross-stratum float sum)
    "sample_mixture" ->
      """WITH quota AS (
        |  SELECT source AS s,
        |    greatest(1, CAST(floor(4.0 * sqrt(count(*))) AS BIGINT)) AS q
        |  FROM documents GROUP BY source
        |)
        |SELECT doc_id, source FROM (
        |  SELECT doc_id, source, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents) d JOIN quota ON d.source = quota.s
        |WHERE d.rn <= quota.q ORDER BY doc_id""".stripMargin,

    // same augmented text on both sides; regex subset where Java
    // regex and RE2 agree (no \b, no backrefs); DuckDB needs the
    // explicit 'g' flag to match Spark's replace-all default
    "pii_scrub" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |    concat(text, ' contact user', CAST(doc_id AS VARCHAR),
        |      '@mail.example.org or call 555-',
        |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'), ' now') AS t
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |      '<EMAIL>', 'g'),
        |    '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS scrubbed
        |FROM aug ORDER BY doc_id""".stripMargin,

    // mirror of TextAnalysis.linearClassifier: df≥2 vocab with
    // md5-derived milli-weights (top-60-bit md5 % 2001 − 1000; the
    // hash is positive so plain % == pmod), mean-weight score
    "quality_classifier" -> classifierSql,

    // the persisted-vocab spelling serves the IDENTICAL result (the
    // score_importance_indexed precedent): same mirror, so any drift
    // between indexed and from-scratch plans is a hash mismatch
    "quality_classifier_indexed" -> classifierSql,

    // mirror of KMeans.assign (k=8, 3 Lloyd rounds unrolled): exact
    // integer micro components, argmin tie-broken on cluster id,
    // floored-integer centroid means via the portable
    // (s − ((s%n)+n)%n) // n identity
    "ml_kmeans" -> kmeansSql(k = 8, iters = 3),

    // mirror of Embed.quantizeInt8: round-half-up((x·127)/s) as the
    // floored integer (254·x + s) // 2s; md5 over the canonical
    // comma-joined code string
    "embed_quantize" ->
      """WITH vm AS (
        |  SELECT vec_id, i,
        |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1e6, 0) AS BIGINT) AS v
        |  FROM (SELECT vec_id, embedding,
        |          unnest(range(1, len(embedding) + 1)) AS i
        |        FROM embeddings)
        |), sc AS (
        |  SELECT vec_id, CAST(max(abs(v)) AS BIGINT) AS s
        |  FROM vm GROUP BY vec_id
        |), q AS (
        |  SELECT vm.vec_id, vm.i,
        |    CASE WHEN sc.s = 0 THEN 0 ELSE
        |      (vm.v * 254 + sc.s
        |       - ((((vm.v * 254 + sc.s) % (2 * sc.s)) + 2 * sc.s) % (2 * sc.s)))
        |      // (2 * sc.s) END AS q
        |  FROM vm JOIN sc USING (vec_id)
        |)
        |SELECT q.vec_id, sc.s AS scale_micro,
        |  CAST(sum(CASE WHEN q.q <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_nonzero,
        |  CAST(sum(abs(q.q)) AS BIGINT) AS sum_abs,
        |  md5(string_agg(CAST(q.q AS VARCHAR), ',' ORDER BY q.i)) AS code_md5
        |FROM q JOIN sc USING (vec_id)
        |GROUP BY q.vec_id, sc.s ORDER BY vec_id""".stripMargin,

    // mirror of Curation.sampleNegatives: md5-order position per
    // source stratum, circulant offsets {1,7,31}, self-pairs dropped
    "sample_negatives" ->
      """WITH p AS (
        |  SELECT source AS stratum, doc_id,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT)
        |      AS pos,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM documents
        |), w AS (
        |  SELECT stratum, doc_id, off, (pos + off) % n AS neg_pos, pos
        |  FROM p, unnest([1, 7, 31]) AS t(off)
        |)
        |SELECT w.stratum AS stratum, w.doc_id AS doc_id, w.off AS off,
        |  p2.doc_id AS neg_doc_id
        |FROM w JOIN p p2 ON w.stratum = p2.stratum AND w.neg_pos = p2.pos
        |WHERE w.neg_pos <> w.pos
        |ORDER BY w.stratum, w.doc_id, w.off""".stripMargin,

    // mirror of Embed.pcaPower: centered integer Gram matrix (micro
    // components, floored means), 3 power steps unrolled with the
    // down-scaled-max renormalization; every division is the
    // portable floored identity
    "embed_pca" -> pcaSql(3),

    // mirror of TextAnalysis.naiveBayesConfusion: Laplace-smoothed
    // multinomial NB in micro-ln longs, argmax ties -> first class,
    // confusion matrix
    "ml_naive_bayes" ->
      """WITH docs AS (
        |  SELECT doc_id, lang, string_split(lower(text), ' ') AS toks,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), tok AS (
        |  SELECT doc_id, lang, unnest(toks) AS w FROM docs
        |), cnt AS (
        |  SELECT w, lang AS c, count(*) AS cwc FROM tok GROUP BY w, lang
        |), ct AS (
        |  SELECT c, CAST(sum(cwc) AS BIGINT) AS t_c FROM cnt GROUP BY c
        |), vocab AS (SELECT count(DISTINCT w) AS v FROM cnt
        |), nd AS (SELECT lang AS c, count(*) AS nd FROM docs GROUP BY lang
        |), ndocs AS (SELECT count(*) AS n_docs FROM docs
        |), classes AS (
        |  SELECT nd.c,
        |    CAST(round(ln(CAST(nd.nd AS DOUBLE)) * 1e6, 0) AS BIGINT)
        |    - CAST(round(ln(CAST(ndocs.n_docs AS DOUBLE)) * 1e6, 0) AS BIGINT)
        |      AS prior_micro,
        |    CAST(round(ln(CAST(ct.t_c + vocab.v AS DOUBLE)) * 1e6, 0) AS BIGINT)
        |      AS denom_micro
        |  FROM nd JOIN ct USING (c) CROSS JOIN vocab CROSS JOIN ndocs
        |), obs AS (
        |  SELECT t.doc_id, cnt.c,
        |    CAST(sum(CAST(round(ln(CAST(cnt.cwc + 1 AS DOUBLE)) * 1e6, 0)
        |             AS BIGINT)) AS BIGINT) AS obs_micro
        |  FROM tok t JOIN cnt ON t.w = cnt.w
        |  GROUP BY t.doc_id, cnt.c
        |), scored AS (
        |  SELECT d.doc_id, d.lang, cl.c,
        |    cl.prior_micro + coalesce(o.obs_micro, 0)
        |      - d.n_tokens * cl.denom_micro AS score
        |  FROM docs d CROSS JOIN classes cl
        |  LEFT JOIN obs o ON o.doc_id = d.doc_id AND o.c = cl.c
        |), pred AS (
        |  SELECT lang, c AS pred_lang FROM (
        |    SELECT lang, c, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, c ASC) AS rn
        |    FROM scored) WHERE rn = 1
        |)
        |SELECT lang, pred_lang, count(*) AS n FROM pred
        |GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin,

    // mirror of TextAnalysis.collocations: PMI over adjacent
    // bigrams, each factor its own micro-ln long (never a product
    // of counts), c12 ≥ 5, deterministic top-50
    "text_collocations" ->
      """WITH base AS (
        |  SELECT string_split(lower(text), ' ') AS toks FROM documents
        |), uni AS (
        |  SELECT w, count(*) AS c
        |  FROM (SELECT unnest(toks) AS w FROM base) GROUP BY w
        |), nu AS (SELECT CAST(sum(c) AS BIGINT) AS nu FROM uni
        |), bg AS (
        |  SELECT toks[i] AS w1, toks[i + 1] AS w2
        |  FROM base CROSS JOIN LATERAL unnest(range(1, len(toks))) t(i)
        |  WHERE len(toks) >= 2
        |), nb AS (SELECT count(*) AS nb FROM bg
        |), cand AS (
        |  SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2
        |  HAVING count(*) >= 5
        |)
        |SELECT w1, w2, c12, u1.c AS c1, u2.c AS c2,
        |  CAST(round(ln(CAST(c12 AS DOUBLE)) * 1e6, 0) AS BIGINT)
        |  - CAST(round(ln(CAST(nb AS DOUBLE)) * 1e6, 0) AS BIGINT)
        |  - CAST(round(ln(CAST(u1.c AS DOUBLE)) * 1e6, 0) AS BIGINT)
        |  - CAST(round(ln(CAST(u2.c AS DOUBLE)) * 1e6, 0) AS BIGINT)
        |  + 2 * CAST(round(ln(CAST(nu AS DOUBLE)) * 1e6, 0) AS BIGINT)
        |    AS pmi_micro
        |FROM cand JOIN uni u1 ON u1.w = cand.w1
        |JOIN uni u2 ON u2.w = cand.w2
        |CROSS JOIN nb CROSS JOIN nu
        |ORDER BY pmi_micro DESC, w1 ASC, w2 ASC LIMIT 50""".stripMargin,

    // mirror of TextAnalysis.rollingFingerprintPortable: every
    // 16-char window's md5-top-60-bit hash, folded to the per-doc
    // min; texts shorter than 16 chars hash their full length
    // (greatest(len-15, 1) keeps exactly one window)
    "text_rollinghash_mod" ->
      """SELECT doc_id,
        |  min(('0x' || substr(md5(substr(text, i, 16)), 1, 15))::BIGINT)
        |    AS rfp_mod
        |FROM (SELECT doc_id, coalesce(text, '') AS text FROM documents) d
        |CROSS JOIN LATERAL
        |  unnest(range(1, greatest(len(text) - 15, 1) + 1)) t(i)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // mirror of dedup_survivor: the ngramJaccard pair CTE verbatim
    // (same shingling, stop-shingle cap and 6dp-rounded threshold),
    // then each pair drops its shorter member (tie → larger id) and
    // every loser reports min(winner) — exact-integer logic
    "dedup_survivor" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [array_to_string(toks[i:i+2], ' ')
        |     FOR i IN range(1, greatest(len(toks)-3, 0)+2)])) AS shingle
        |  FROM base
        |), capped AS (
        |  SELECT doc_id, shingle FROM sh
        |  QUALIFY count(*) OVER (PARTITION BY shingle) <= 1000
        |), sz AS (
        |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
        |), pairs AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS common
        |  FROM capped x JOIN capped y
        |    ON x.shingle = y.shingle AND x.doc_id < y.doc_id
        |  GROUP BY a, b
        |), jp AS (
        |  SELECT a, b
        |  FROM pairs p JOIN sz za ON p.a = za.doc_id
        |               JOIN sz zb ON p.b = zb.doc_id
        |  WHERE round(CAST(common AS DOUBLE) / (za.sz + zb.sz - common), 6)
        |        >= 0.5
        |), lw AS (
        |  SELECT CASE WHEN la.n_chars > lb.n_chars THEN p.b
        |              WHEN la.n_chars < lb.n_chars THEN p.a
        |              ELSE greatest(p.a, p.b) END AS doc_id,
        |         CASE WHEN la.n_chars > lb.n_chars THEN p.a
        |              WHEN la.n_chars < lb.n_chars THEN p.b
        |              ELSE least(p.a, p.b) END AS winner
        |  FROM jp p JOIN documents la ON p.a = la.doc_id
        |            JOIN documents lb ON p.b = lb.doc_id
        |)
        |SELECT doc_id, min(winner) AS kept_by
        |FROM lw GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // mirror of search_diverse_topk: same exact-cosine protocol as
    // ann_cosine_topk, label cap via row_number ≤ 2 per (qid, label),
    // then the global top-15 — both of the Spark side's bounded-heap
    // stages are the row_number spelling here
    "search_diverse_topk" ->
      s"""WITH q AS (
        |  SELECT vec_id AS qid, embedding AS qv
        |  FROM embeddings WHERE vec_id < 10
        |), s AS (
        |  SELECT qid, c.vec_id AS nbr, CAST(c.label AS BIGINT) AS label,
        |    round(${cos("qv", "c.embedding")}, 6) AS cos
        |  FROM embeddings c, q WHERE c.vec_id <> qid
        |), l AS (
        |  SELECT qid, nbr, label, cos,
        |    row_number() OVER (PARTITION BY qid, label
        |                       ORDER BY cos DESC, nbr ASC) AS lr
        |  FROM s
        |), r AS (
        |  SELECT qid, nbr, label, cos,
        |    row_number() OVER (PARTITION BY qid
        |                       ORDER BY cos DESC, nbr ASC) AS rnk
        |  FROM l WHERE lr <= 2
        |)
        |SELECT qid, rnk, nbr, label, cos FROM r WHERE rnk <= 15
        |ORDER BY qid, rnk""".stripMargin,

    "search_mmr" -> mmrSql(k = 5, c = 20),

    // mirror of Sharding.lengthBatches: same whitespace token count,
    // (ntok DESC, doc_id) sort, fixed ⌊(rn−1)/32⌋ batches, exact
    // integer waste
    "pipeline_batches" ->
      """WITH t AS (
        |  SELECT source AS part, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
        |  FROM documents
        |), b AS (
        |  SELECT part, ntok,
        |    CAST(floor(CAST(row_number() OVER (
        |        PARTITION BY part ORDER BY ntok DESC, doc_id) - 1
        |      AS DOUBLE) / 32.0) AS BIGINT) AS batch
        |  FROM t
        |)
        |SELECT part, batch, count(*) AS n_docs, max(ntok) AS max_tok,
        |  CAST(sum(ntok) AS BIGINT) AS n_tokens,
        |  CAST(count(*) * max(ntok) - sum(ntok) AS BIGINT) AS pad_waste
        |FROM b GROUP BY part, batch ORDER BY part, batch""".stripMargin,

    // mirror of Curation.interleave: per-source md5-order ranks,
    // pos = r/√n_s (one IEEE division — the sampleMixture
    // determinism argument), global schedule head of 500
    "pipeline_interleave" ->
      """WITH counts AS (
        |  SELECT source AS s, count(*) AS n FROM documents GROUP BY source
        |), r AS (
        |  SELECT source, doc_id, CAST(row_number() OVER (
        |      PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS r
        |  FROM documents
        |), p AS (
        |  SELECT source, doc_id, r,
        |    CAST(r AS DOUBLE) / sqrt(CAST(n AS DOUBLE)) AS pos
        |  FROM r JOIN counts ON source = s
        |)
        |SELECT CAST(row_number() OVER (ORDER BY pos, source, r) AS BIGINT)
        |    AS slot,
        |  source, doc_id, r, round(pos, 9) AS pos
        |FROM p ORDER BY pos, source, r LIMIT 500""".stripMargin,

    // mirror of store_zorder: the clustered layout must change
    // NOTHING about query results — the oracle is the plain filter
    "store_zorder" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey
        |FROM lineitem
        |WHERE l_partkey BETWEEN 100 AND 200
        |  AND l_suppkey BETWEEN 10 AND 40
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // mirror of Curation.sampleTokenBudget: same md5 order, same
    // strict cum_before < budget gate, exact long token counts
    "sample_token_budget" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |    coalesce(len(string_split(text, ' ')), 0)::BIGINT AS ntok,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents
        |), c AS (
        |  SELECT source, doc_id, ntok,
        |    CAST(coalesce(sum(ntok) OVER (PARTITION BY source
        |      ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum_before
        |  FROM t
        |)
        |SELECT source, doc_id, ntok, cum_before
        |FROM c WHERE cum_before < 800
        |ORDER BY source, doc_id""".stripMargin,

    // mirror of TextAnalysis.normalize: nfc_normalize ↔ the native
    // UnicodeNormalize(NFC) expression, strip_accents ↔ NFD + drop
    // \p{Mn}, then the same lowercase/whitespace-collapse/trim and
    // md5 digest (the corpus is ASCII, so the unicode-specific steps
    // are identity here — NormalizeSpec pins their non-ASCII behavior
    // with composed/decomposed literals)
    "text_normalize" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(strip_accents(lower(nfc_normalize(text))),
        |      '\s+', ' ', 'g')) AS norm
        |  FROM documents
        |)
        |SELECT doc_id, md5(norm) AS norm_md5,
        |  CAST(length(norm) AS BIGINT) AS n_norm
        |FROM n ORDER BY doc_id""".stripMargin,

    // mirror of HeavyHitters.heavyHitters(k=60): the Misra-Gries +
    // recount route is EXACT (superset guarantee + exact recount +
    // strict cnt·k > N gate), so the oracle is the plain
    // GROUP BY ... HAVING it claims to equal
    "stats_heavyhitters" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS item FROM documents
        |), tot AS (
        |  SELECT count(*) AS n FROM toks
        |), c AS (
        |  SELECT item, count(*) AS cnt FROM toks GROUP BY item
        |)
        |SELECT item, cnt FROM c, tot WHERE cnt * 60 > n
        |ORDER BY cnt DESC, item ASC""".stripMargin,

    // mirror of Similarity.recallEval: the ENTIRE evaluation re-run
    // on DuckDB — the portable-LSH route (md5-derived planes →
    // band buckets → shortlist → exact rerank, the ann_lsh_topk_
    // portable CTE chain) AND the brute-force ground truth, then the
    // same recall@5 / reciprocal-rank-numerator comparison
    "search_recall_eval" ->
      s"""WITH pl AS (
        |  SELECT b.b AS bit,
        |         list(CASE WHEN ('0x' || substr(md5(b.b::VARCHAR || ':' || i.i::VARCHAR), 1, 15))::BIGINT % 2 = 0
        |                   THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END
        |              ORDER BY i.i) AS ps
        |  FROM range(0, 16) b(b) CROSS JOIN range(1, 65) i(i)
        |  GROUP BY b.b
        |), sb AS (
        |  SELECT e.vec_id, pl.bit,
        |         CASE WHEN list_sum(list_transform(range(1, 65),
        |                i -> CAST(e.embedding[i] AS DOUBLE) * pl.ps[i])) >= 0
        |              THEN 1 ELSE 0 END AS bit_on
        |  FROM embeddings e CROSS JOIN pl
        |), cb AS (
        |  SELECT vec_id, bit // 2 AS bd,
        |         CAST(sum(bit_on << (bit % 2)) AS BIGINT) AS bucket
        |  FROM sb GROUP BY vec_id, bit // 2
        |), qb AS (
        |  SELECT vec_id AS qid, bd, bucket FROM cb WHERE vec_id < 10
        |), cand AS (
        |  SELECT DISTINCT c.vec_id AS nbr, q.qid
        |  FROM cb c JOIN qb q
        |    ON c.bd = q.bd AND c.bucket = q.bucket AND c.vec_id <> q.qid
        |), sc AS (
        |  SELECT cand.qid, cand.nbr,
        |         round(${cos("eq.embedding", "ec.embedding")}, 6) AS cos
        |  FROM cand
        |  JOIN embeddings eq ON eq.vec_id = cand.qid
        |  JOIN embeddings ec ON ec.vec_id = cand.nbr
        |), approx AS (
        |  SELECT qid, nbr, rnk FROM (
        |    SELECT qid, nbr,
        |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr ASC) AS rnk
        |    FROM sc
        |  ) WHERE rnk <= 5
        |), es AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS nbr,
        |    round(${cos("q.embedding", "c.embedding")}, 6) AS cos
        |  FROM embeddings c, embeddings q
        |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
        |), exact AS (
        |  SELECT qid, nbr, rnk FROM (
        |    SELECT qid, nbr,
        |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr ASC) AS rnk
        |    FROM es
        |  ) WHERE rnk <= 5
        |), hits AS (
        |  SELECT e.qid, count(*) AS hits
        |  FROM exact e JOIN approx a ON a.qid = e.qid AND a.nbr = e.nbr
        |  GROUP BY e.qid
        |), top1 AS (
        |  SELECT e.qid, coalesce(a.rnk, 0) AS rank_top1
        |  FROM exact e LEFT JOIN approx a ON a.qid = e.qid AND a.nbr = e.nbr
        |  WHERE e.rnk = 1
        |)
        |SELECT qs.qid, coalesce(h.hits, 0) AS hits,
        |  CAST(5 AS BIGINT) AS k, coalesce(t.rank_top1, 0) AS rank_top1
        |FROM (SELECT vec_id AS qid FROM embeddings WHERE vec_id < 10) qs
        |LEFT JOIN hits h ON h.qid = qs.qid
        |LEFT JOIN top1 t ON t.qid = qs.qid
        |ORDER BY qs.qid""".stripMargin
  )

  /** mirror of Search.mmrTopK with the greedy steps UNROLLED as CTEs
    * (the kmeans/pcaSql pattern): 6dp cosines for relevance and
    * pairwise similarity, then each step picks argmax of
    * 0.5·cos − 0.5·max-sim-to-selected (ties → smaller id) among the
    * not-yet-selected shortlist — 0.5·x is exact binary scaling and
    * the subtraction one IEEE op, so the selection sequence is
    * engine-independent.
    */
  private def mmrSql(k: Int, c: Int): String = {
    def step(t: Int): String =
      s"""pick$t AS (
         |  SELECT qid, CAST($t AS BIGINT) AS step, nbr, cos FROM (
         |    SELECT sh.qid, sh.nbr, sh.cos, max(p.sim) AS ms
         |    FROM short sh
         |    JOIN pr p ON p.qid = sh.qid AND p.x = sh.nbr
         |    JOIN acc${t - 1} a ON a.qid = p.qid AND a.nbr = p.y
         |    WHERE NOT EXISTS (SELECT 1 FROM acc${t - 1} z
         |                      WHERE z.qid = sh.qid AND z.nbr = sh.nbr)
         |    GROUP BY sh.qid, sh.nbr, sh.cos
         |  ) QUALIFY row_number() OVER (PARTITION BY qid
         |      ORDER BY 0.5*cos - 0.5*ms DESC, nbr) = 1
         |), acc$t AS (
         |  SELECT * FROM acc${t - 1} UNION ALL SELECT * FROM pick$t
         |)"""
    val steps = (2 to k).map(step).mkString(", ")
    s"""WITH q AS (
       |  SELECT vec_id AS qid, embedding AS qv
       |  FROM embeddings WHERE vec_id < 10
       |), s AS (
       |  SELECT qid, cc.vec_id AS nbr,
       |    round(${cos("qv", "cc.embedding")}, 6) AS cos
       |  FROM embeddings cc, q WHERE cc.vec_id <> qid
       |), short AS (
       |  SELECT qid, nbr, cos FROM s
       |  QUALIFY row_number() OVER (PARTITION BY qid
       |      ORDER BY cos DESC, nbr) <= $c
       |), pr AS (
       |  SELECT a.qid, a.nbr AS x, b.nbr AS y,
       |    round(${cos("ea.embedding", "eb.embedding")}, 6) AS sim
       |  FROM short a JOIN short b ON a.qid = b.qid AND a.nbr <> b.nbr
       |  JOIN embeddings ea ON ea.vec_id = a.nbr
       |  JOIN embeddings eb ON eb.vec_id = b.nbr
       |), acc1 AS (
       |  SELECT qid, CAST(1 AS BIGINT) AS step, nbr, cos FROM short
       |  QUALIFY row_number() OVER (PARTITION BY qid
       |      ORDER BY cos DESC, nbr) = 1
       |), $steps
       |SELECT qid, step, nbr, cos FROM acc$k ORDER BY qid, step""".stripMargin
  }

  /** the unrolled power-iteration mirror of Embed.pcaPower: vm is the
    * k-means (vec_id, dim, micro) form; mu/gram use the portable
    * floored-division identity; each step is one matrix-vector CTE +
    * a 1-row max + the down-scaled renormalization (u·1e6 would
    * overflow BIGINT at u ~ 3e17, so w = u div (m div 1e6) instead —
    * same rule as the Spark side)
    */
  private def pcaSql(iters: Int): String = {
    def step(i: Int): String =
      s"""u$i AS (
         |  SELECT g.i AS dim, CAST(sum(g.s * w.w) AS BIGINT) AS u
         |  FROM gram g JOIN w${i - 1} w ON g.j = w.dim GROUP BY g.i
         |), m$i AS (
         |  SELECT CAST(max(abs(u)) AS BIGINT) AS m FROM u$i
         |), w$i AS (
         |  SELECT u.dim,
         |    CASE WHEN m.m < 1000000 THEN u.u ELSE
         |      (u.u - ((u.u % (m.m // 1000000)) + (m.m // 1000000))
         |             % (m.m // 1000000)) // (m.m // 1000000) END AS w
         |  FROM u$i u CROSS JOIN m$i m
         |)"""
    val steps = (1 to iters).map(step).mkString(", ")
    s"""WITH vm AS (
       |  SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
       |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1e6, 0) AS BIGINT) AS v
       |  FROM (SELECT vec_id, embedding,
       |          unnest(range(1, len(embedding) + 1)) AS i
       |        FROM embeddings)
       |), mu AS (
       |  SELECT dim, (s - ((s % n) + n) % n) // n AS mu FROM (
       |    SELECT dim, CAST(sum(v) AS BIGINT) AS s,
       |      CAST(count(*) AS BIGINT) AS n
       |    FROM vm GROUP BY dim)
       |), cent AS (
       |  SELECT vm.vec_id, vm.dim, vm.v - mu.mu AS c
       |  FROM vm JOIN mu USING (dim)
       |), gram AS (
       |  SELECT i, j,
       |    (s - ((s % 1000000) + 1000000) % 1000000) // 1000000 AS s
       |  FROM (
       |    SELECT p.dim AS i, q.dim AS j, CAST(sum(p.c * q.c) AS BIGINT) AS s
       |    FROM cent p JOIN cent q ON p.vec_id = q.vec_id
       |    GROUP BY i, j)
       |), w0 AS (
       |  SELECT dim, CAST(1000000 AS BIGINT) AS w FROM mu
       |), $steps
       |SELECT dim, w AS w_micro FROM w$iters ORDER BY dim""".stripMargin
  }

  /** mirror of TextAnalysis.linearClassifier — shared by the fresh
    * and persisted-vocab spellings: df≥2 vocab with md5-derived
    * milli-weights (top-60-bit md5 % 2001 − 1000; the hash is
    * positive so plain % == pmod), mean-weight score
    */
  private lazy val classifierSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      |  FROM documents
      |), vocab AS (
      |  SELECT tok,
      |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % 2001 - 1000 AS w_milli
      |  FROM (SELECT tok, count(DISTINCT doc_id) AS df
      |        FROM tok GROUP BY tok)
      |  WHERE df >= 2
      |), s AS (
      |  SELECT t.doc_id, count(*) AS n_tokens,
      |    count(v.w_milli) AS n_hit,
      |    CAST(coalesce(sum(v.w_milli), 0) AS BIGINT) AS score_milli
      |  FROM tok t LEFT JOIN vocab v USING (tok)
      |  GROUP BY t.doc_id
      |)
      |SELECT doc_id, n_tokens, n_hit, score_milli, score_micro,
      |  (score_micro >= 0) AS pass
      |FROM (
      |  SELECT *,
      |    (score_milli * 1000
      |     - (((score_milli * 1000) % n_tokens) + n_tokens) % n_tokens)
      |    // n_tokens AS score_micro
      |  FROM s)
      |ORDER BY doc_id""".stripMargin

  /** the unrolled Lloyd mirror: vectors in long (vec_id, dim, micro)
    * form; each round is one assignment CTE (argmin via row_number
    * over (dist2, cluster)) and, between rounds, one floored-integer
    * centroid-mean CTE. Generated so every round is structurally
    * identical to the Spark loop's.
    */
  private def kmeansSql(k: Int, iters: Int): String = {
    def assignCte(i: Int): String =
      s"""a$i AS (
         |  SELECT vec_id, cluster, dist2 FROM (
         |    SELECT vec_id, cluster, dist2,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY dist2, cluster) AS rn
         |    FROM (
         |      SELECT vm.vec_id, c.cluster,
         |        CAST(sum((vm.v - c.c) * (vm.v - c.c)) AS BIGINT) AS dist2
         |      FROM vm JOIN c${i - 1} c ON vm.dim = c.dim
         |      GROUP BY vm.vec_id, c.cluster
         |    )
         |  ) WHERE rn = 1
         |)"""
    def updateCte(i: Int): String =
      s"""c$i AS (
         |  SELECT cluster, dim, (s - ((s % n) + n) % n) // n AS c FROM (
         |    SELECT a.cluster, vm.dim, CAST(sum(vm.v) AS BIGINT) AS s,
         |      count(*) AS n
         |    FROM a$i a JOIN vm USING (vec_id)
         |    GROUP BY a.cluster, vm.dim
         |  )
         |)"""
    val rounds = (1 until iters).flatMap(i => Seq(assignCte(i), updateCte(i))) :+
      assignCte(iters)
    s"""WITH vm AS (
       |  SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
       |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1e6, 0) AS BIGINT) AS v
       |  FROM (SELECT vec_id, embedding,
       |          unnest(range(1, len(embedding) + 1)) AS i
       |        FROM embeddings)
       |), init AS (
       |  SELECT vec_id,
       |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cluster
       |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $k)
       |), c0 AS (
       |  SELECT i.cluster, v.dim, v.v AS c FROM init i JOIN vm v USING (vec_id)
       |), ${rounds.mkString(", ")}
       |SELECT vec_id, cluster, dist2 FROM a$iters ORDER BY vec_id""".stripMargin
  }
}
