package graft.queries

/** DuckDB oracle SQL for every hash-checkable query (SURVEY §6).
  * Column aliases and ORDER BY match the Spark side exactly; money
  * math mirrors the DECIMAL(18,2)→DOUBLE protocol of [[Analytics]].
  */
object Oracles {

  private val rev =
    "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"

  val refSurface: Map[String, String] = Map(
    "df_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "df_view" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100 OFFSET 100""".stripMargin,

    "df_cell_lookup" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_orderkey = (SELECT min(l_orderkey) FROM lineitem)
        |ORDER BY l_linenumber""".stripMargin,

    "index_colvalues" ->
      "SELECT DISTINCT p_brand AS value FROM part ORDER BY value",

    "index_nav" ->
      """SELECT field, value, idx FROM (
        |  SELECT field, value,
        |    row_number() OVER (ORDER BY field, value) - 1 AS idx
        |  FROM (
        |    SELECT field, value FROM (
        |      SELECT 'l_returnflag' AS field, l_returnflag AS value FROM lineitem
        |      UNION ALL
        |      SELECT 'l_linestatus', l_linestatus FROM lineitem
        |      UNION ALL
        |      SELECT 'l_linenumber', CAST(l_linenumber AS VARCHAR) FROM lineitem
        |    ) GROUP BY field, value
        |  )
        |) WHERE field = 'l_returnflag' ORDER BY idx""".stripMargin,

    // typed ordinal order: p_size entries rank by NUMERIC value (the
    // CASE mirrors IndexedFrame.valueSortKey), after p_brand's offset
    "index_nav_num" ->
      """SELECT field, value, idx FROM (
        |  SELECT field, value,
        |    row_number() OVER (ORDER BY field,
        |      CASE WHEN field = 'p_size' THEN CAST(value AS DOUBLE) END,
        |      value) - 1 AS idx
        |  FROM (
        |    SELECT DISTINCT 'p_brand' AS field, p_brand AS value FROM part
        |    UNION ALL
        |    SELECT DISTINCT 'p_size', CAST(p_size AS VARCHAR) FROM part
        |  )
        |) WHERE field = 'p_size' ORDER BY idx""".stripMargin,

    "index_rowrefs" ->
      """SELECT o_orderkey AS row_key FROM orders
        |WHERE o_orderpriority = '1-URGENT' ORDER BY row_key""".stripMargin,

    // driver-side point read of one (o_custkey, value) refs entry —
    // the probed customer is the one on the smallest order
    // (deterministic at every SF)
    "store_point_read" ->
      """SELECT o_orderkey AS row_key FROM orders
        |WHERE o_custkey = (
        |  SELECT o_custkey FROM orders ORDER BY o_orderkey LIMIT 1)
        |ORDER BY row_key""".stripMargin,

    // ORDER BY mirrors the typed entry order (IndexedFrame.valueSortKey):
    // the numeric l_linenumber field sorts by native value, not string
    // form — coincident for values 1..7, divergent the moment a numeric
    // field crosses a digit-length boundary ("10" vs "2")
    "index_freqs" ->
      """SELECT field, value, count(*) AS f FROM (
        |  SELECT 'l_returnflag' AS field, l_returnflag AS value FROM lineitem
        |  UNION ALL
        |  SELECT 'l_linestatus', l_linestatus FROM lineitem
        |  UNION ALL
        |  SELECT 'l_linenumber', CAST(l_linenumber AS VARCHAR) FROM lineitem
        |) GROUP BY field, value ORDER BY field,
        |  CASE WHEN field = 'l_linenumber' THEN CAST(value AS DOUBLE) END,
        |  value""".stripMargin,

    // list_distinct: f is the number of DOCS containing the token
    // (bitmap-popcount semantics), not the occurrence count
    "index_tokens" ->
      """SELECT value, count(*) AS f FROM (
        |  SELECT unnest(list_distinct(string_split(text, ' '))) AS value
        |  FROM documents
        |) GROUP BY value ORDER BY value""".stripMargin,

    "index_prefix" ->
      """SELECT value, count(*) AS f FROM (
        |  SELECT unnest(list_distinct(string_split(text, ' '))) AS value
        |  FROM documents
        |) WHERE value LIKE 's%' GROUP BY value ORDER BY value""".stripMargin,

    "index_f" ->
      "SELECT count(*) AS f FROM lineitem WHERE l_returnflag = 'R'",

    "salted_agg" ->
      """SELECT l_returnflag AS k, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM lineitem GROUP BY k ORDER BY k""".stripMargin,

    "index_fand" ->
      """SELECT count(*) AS n,
        |  count(*) FILTER (l_returnflag = 'R') AS fa,
        |  count(*) FILTER (l_linestatus = 'F') AS fb,
        |  count(*) FILTER (l_returnflag = 'R' AND l_linestatus = 'F') AS fab
        |FROM lineitem""".stripMargin,

    "index_bool" ->
      """SELECT count(*) AS n,
        |  count(*) FILTER (l_returnflag = 'R' AND l_linestatus = 'F') AS f_and,
        |  count(*) FILTER (l_returnflag = 'R' OR l_linestatus = 'F') AS f_or,
        |  count(*) FILTER (l_returnflag = 'R' AND NOT l_linestatus = 'F') AS f_diff,
        |  count(*) FILTER ((l_returnflag = 'R' AND NOT l_linestatus = 'F')
        |                OR (NOT l_returnflag = 'R' AND l_linestatus = 'F')) AS f_xor,
        |  count(*) FILTER (NOT l_returnflag = 'R') AS f_not_a
        |FROM lineitem""".stripMargin,

    "cofreq_matrix" ->
      """SELECT l_returnflag AS a_value, l_linestatus AS b_value, count(*) AS fab
        |FROM lineitem GROUP BY a_value, b_value ORDER BY a_value, b_value""".stripMargin,

    "costats" ->
      """WITH c AS (
        |  SELECT count(*) AS n,
        |    count(*) FILTER (l_returnflag = 'R') AS fa,
        |    count(*) FILTER (l_linestatus = 'F') AS fb,
        |    count(*) FILTER (l_returnflag = 'R' AND l_linestatus = 'F') AS fab
        |  FROM lineitem
        |), p AS (
        |  SELECT *,
        |    (fa + 0.5 * 4.0) / (n + 4.0) AS pa_,
        |    (fb + 0.5 * 4.0) / (n + 4.0) AS pb_
        |  FROM c
        |), s AS (
        |  SELECT *,
        |    (1-pa_)*(1-pb_) AS nv0, pa_*(1-pb_) AS nv1, (1-pa_)*pb_ AS nv2, pa_*pb_ AS nv3,
        |    (n - fa - fb + fab) AS f0, (fa - fab) AS f1, (fb - fab) AS f2, fab AS f3
        |  FROM p
        |), q AS (
        |  SELECT *,
        |    (f0 + nv0*(2.0/nv0)) / (n + 2.0/nv0) AS p0,
        |    (f1 + nv1*(2.0/nv1)) / (n + 2.0/nv1) AS p1,
        |    (f2 + nv2*(2.0/nv2)) / (n + 2.0/nv2) AS p2,
        |    (f3 + nv3*(2.0/nv3)) / (n + 2.0/nv3) AS p3
        |  FROM s
        |)
        |SELECT n, fa, fb, fab,
        |  round(pa_, 6) AS pa, round(pb_, 6) AS pb,
        |  round(pa_ * -(ln(pa_)/ln(2)) + (1-pa_) * -(ln(1-pa_)/ln(2)), 6) AS ha,
        |  round(pb_ * -(ln(pb_)/ln(2)) + (1-pb_) * -(ln(1-pb_)/ln(2)), 6) AS hb,
        |  round(p0/nv0, 6) AS d00, round(p1/nv1, 6) AS d10,
        |  round(p2/nv2, 6) AS d01, round(p3/nv3, 6) AS d11,
        |  round(  p0 * ln(p0/nv0)/ln(2) + p1 * ln(p1/nv1)/ln(2)
        |        + p2 * ln(p2/nv2)/ln(2) + p3 * ln(p3/nv3)/ln(2), 6) AS mi
        |FROM q""".stripMargin,

    "costats_matrix" ->
      """WITH tot AS (SELECT count(*) AS n FROM lineitem),
        |fa AS (SELECT l_returnflag AS a_value, count(*) AS fa FROM lineitem GROUP BY 1),
        |fb AS (SELECT l_linestatus AS b_value, count(*) AS fb FROM lineitem GROUP BY 1),
        |fab AS (SELECT l_returnflag AS a_value, l_linestatus AS b_value, count(*) AS fab
        |        FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT a_value, b_value, n, fa.fa, fb.fb, fab.fab
        |      FROM fab JOIN fa USING (a_value) JOIN fb USING (b_value), tot),
        |p AS (SELECT *, (fa + 0.5*4.0)/(n+4.0) AS pa_, (fb + 0.5*4.0)/(n+4.0) AS pb_ FROM c),
        |s AS (SELECT *,
        |  (1-pa_)*(1-pb_) AS nv0, pa_*(1-pb_) AS nv1, (1-pa_)*pb_ AS nv2, pa_*pb_ AS nv3,
        |  (n - fa - fb + fab) AS f0, (fa - fab) AS f1, (fb - fab) AS f2, fab AS f3
        |  FROM p),
        |q AS (SELECT *,
        |  (f0 + nv0*(2.0/nv0))/(n + 2.0/nv0) AS p0,
        |  (f1 + nv1*(2.0/nv1))/(n + 2.0/nv1) AS p1,
        |  (f2 + nv2*(2.0/nv2))/(n + 2.0/nv2) AS p2,
        |  (f3 + nv3*(2.0/nv3))/(n + 2.0/nv3) AS p3
        |  FROM s)
        |SELECT a_value, b_value, n, fa, fb, fab,
        |  round(p3/nv3, 6) AS d11,
        |  round(  p0 * ln(p0/nv0)/ln(2) + p1 * ln(p1/nv1)/ln(2)
        |        + p2 * ln(p2/nv2)/ln(2) + p3 * ln(p3/nv3)/ln(2), 6) AS mi
        |FROM q ORDER BY a_value, b_value""".stripMargin,

    "multidf_union" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS total
        |FROM (
        |  SELECT * FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT * FROM orders WHERE o_orderkey % 2 = 1
        |) GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "store_partitioned" ->
      """SELECT doc_id, n_chars FROM documents
        |WHERE source = 'src3' ORDER BY doc_id""".stripMargin,

    "store_roundtrip" ->
      """SELECT field, value, count(*) AS f FROM (
        |  SELECT 'l_returnflag' AS field, l_returnflag AS value FROM lineitem
        |  UNION ALL
        |  SELECT 'l_linestatus', l_linestatus FROM lineitem
        |  UNION ALL
        |  SELECT 'l_linenumber', CAST(l_linenumber AS VARCHAR) FROM lineitem
        |) GROUP BY field, value ORDER BY field, value""".stripMargin,

    // live store after delete(%7 keys) then re-append(%21 subset):
    // the anti-join spelling, with the re-appended rows unioned back
    // (they postdate the tombstone, so the segment scoping keeps them)
    "store_delete" ->
      """SELECT o_orderkey, o_orderpriority, o_orderstatus FROM orders
        |WHERE o_orderkey % 7 <> 0
        |UNION ALL
        |SELECT o_orderkey, o_orderpriority, o_orderstatus FROM orders
        |WHERE o_orderkey % 21 = 0
        |ORDER BY o_orderkey""".stripMargin,

    // merged index after delete = the index of the surviving rows
    "store_delete_index" ->
      """SELECT 'o_orderpriority' AS field, o_orderpriority AS value,
        |       count(*) AS f
        |FROM orders WHERE o_orderkey % 7 <> 0
        |GROUP BY 2 ORDER BY field, value""".stripMargin,

    // upsert(%5 keys with status X) == CASE over the original rows:
    // matched keys replaced, everything else untouched
    "store_upsert" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END
        |    AS o_orderstatus,
        |  o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // evolved store (int ck, rename ck->custmod, widen to long, new
    // oprio column on the second segment only) == one pass over the
    // original rows: custmod is the same value under either segment,
    // oprio is non-null only for the %3<>0 (second-segment) rows
    "store_evolve" ->
      """SELECT o_orderstatus,
        |  count(*) AS n,
        |  CAST(sum(o_custkey % 1000000) AS BIGINT) AS sum_cust,
        |  count(CASE WHEN o_orderkey % 3 <> 0 THEN o_orderpriority END)
        |    AS n_oprio
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    // dropped column: pre-drop rows read NULL under the re-added
    // name, appended rows carry the new values
    "store_evolve_drop" ->
      """SELECT o_orderstatus,
        |  count(*) AS n,
        |  count(CASE WHEN o_orderkey % 3 <> 0 THEN 1 END) AS n_flag,
        |  count(CASE WHEN o_orderkey % 3 <> 0 THEN 1 END) AS n_match
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "merge_index" ->
      """SELECT field, value, count(*) AS f FROM (
        |  SELECT 'l_returnflag' AS field, l_returnflag AS value
        |  FROM lineitem WHERE l_linestatus = 'O'
        |  UNION ALL
        |  SELECT 'l_returnflag', l_returnflag
        |  FROM lineitem WHERE l_linestatus = 'F'
        |) GROUP BY field, value ORDER BY field, value""".stripMargin
  )

  /** shared CTE chain computing per-(field,value) CoStats weight
    * pairs on `part` vs target p_type='ECONOMY' — mirrors
    * graft.ops.Knn.keyValueWeights' op order exactly.
    */
  private def knnWeightCtes(defined: String = "TRUE") =
    s"""WITH tot AS (
      |  SELECT count(*) AS n, count(*) FILTER (p_type = 'ECONOMY') AS fb
      |  FROM part WHERE $defined
      |), ex AS (
      |  SELECT 'p_brand' AS field, p_brand AS value,
      |    count(*) AS fa, count(*) FILTER (p_type = 'ECONOMY') AS fab
      |  FROM part WHERE $defined GROUP BY value
      |  UNION ALL
      |  SELECT 'p_size', CAST(p_size AS VARCHAR),
      |    count(*), count(*) FILTER (p_type = 'ECONOMY')
      |  FROM part WHERE $defined GROUP BY p_size
      |), jj AS (SELECT * FROM ex, tot),
      |pp AS (
      |  SELECT field, value, n, fa, fb, fab,
      |    (fa + 0.5*4.0)/(n+4.0) AS pa_, (fb + 0.5*4.0)/(n+4.0) AS pb_
      |  FROM jj
      |), ss AS (
      |  SELECT *,
      |    (1-pa_)*(1-pb_) AS nv0, pa_*(1-pb_) AS nv1,
      |    (1-pa_)*pb_ AS nv2, pa_*pb_ AS nv3,
      |    (n - fa - fb + fab) AS f0, (fa - fab) AS f1,
      |    (fb - fab) AS f2, fab AS f3
      |  FROM pp
      |), qq AS (
      |  SELECT *,
      |    (f0 + nv0*(2.0/nv0))/(n + 2.0/nv0) AS p0,
      |    (f1 + nv1*(2.0/nv1))/(n + 2.0/nv1) AS p1,
      |    (f2 + nv2*(2.0/nv2))/(n + 2.0/nv2) AS p2,
      |    (f3 + nv3*(2.0/nv3))/(n + 2.0/nv3) AS p3
      |  FROM ss
      |), wt AS (
      |  SELECT field, value,
      |    round(abs(ln((p2/nv2)/(p0/nv0))), 6) AS w1,
      |    round(abs(ln((p3/nv3)/(p1/nv1))), 6) AS w2
      |  FROM qq
      |)""".stripMargin

  val knn: Map[String, String] = Map(
    "knn_weights" ->
      s"""${knnWeightCtes()}
        |SELECT field, value, w1, w2 FROM wt ORDER BY field, value""".stripMargin,

    // segment-incremental weights == from-scratch weights over the
    // LIVE rows: write(%2==0) + append(%2<>0) = all keys once; the %7
    // delete then removes those, the %21 re-append restores that
    // subset — live multiset = (k%7<>0 OR k%21=0), each key once
    "knn_weights_store_incr" ->
      s"""${knnWeightCtes(defined =
             "(p_partkey % 7 <> 0 OR p_partkey % 21 = 0)")}
        |SELECT field, value, w1, w2 FROM wt ORDER BY field, value""".stripMargin,

    "knn_topk" ->
      s"""${knnWeightCtes()}, w AS (
        |  SELECT *, (field = 'p_brand' AND value = 'Brand#13')
        |          OR (field = 'p_size' AND value = '10') AS in_query
        |  FROM wt
        |), rowkv AS (
        |  SELECT p_partkey, 'p_brand' AS field, p_brand AS value FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'p_size', CAST(p_size AS VARCHAR) FROM part
        |), contrib AS (
        |  SELECT p_partkey, sum(CASE WHEN in_query THEN -w2 ELSE w1 END) AS score
        |  FROM rowkv JOIN w USING (field, value) GROUP BY p_partkey
        |), base AS (
        |  SELECT coalesce(sum(w2), 0.0) AS baseline FROM w WHERE in_query
        |)
        |SELECT p_partkey, round(coalesce(score, 0.0) + baseline, 6) AS distance
        |FROM part LEFT JOIN contrib USING (p_partkey) CROSS JOIN base
        |ORDER BY distance, p_partkey LIMIT 10""".stripMargin,

    "knn_weights_masked" ->
      s"""${knnWeightCtes("p_partkey % 10 <> 0")}
        |SELECT field, value, w1, w2 FROM wt ORDER BY field, value""".stripMargin,

    "knn_topk_filtered" ->
      s"""${knnWeightCtes()}, w AS (
        |  SELECT *, (field = 'p_brand' AND value = 'Brand#13')
        |          OR (field = 'p_size' AND value = '10') AS in_query
        |  FROM wt
        |), rowkv AS (
        |  SELECT p_partkey, 'p_brand' AS field, p_brand AS value
        |  FROM part WHERE p_size >= 25
        |  UNION ALL
        |  SELECT p_partkey, 'p_size', CAST(p_size AS VARCHAR)
        |  FROM part WHERE p_size >= 25
        |), contrib AS (
        |  SELECT p_partkey, sum(CASE WHEN in_query THEN -w2 ELSE w1 END) AS score
        |  FROM rowkv JOIN w USING (field, value) GROUP BY p_partkey
        |), base AS (
        |  SELECT coalesce(sum(w2), 0.0) AS baseline FROM w WHERE in_query
        |)
        |SELECT p_partkey, round(coalesce(score, 0.0) + baseline, 6) AS distance
        |FROM part LEFT JOIN contrib USING (p_partkey) CROSS JOIN base
        |WHERE p_size >= 25
        |ORDER BY distance, p_partkey LIMIT 10""".stripMargin
  )

  val analytics: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  $rev AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_join" ->
      s"""SELECT l_orderkey, o_orderdate, $rev AS rev
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY rev DESC, l_orderkey ASC LIMIT 10""".stripMargin,

    "q5_join" ->
      s"""SELECT n_name, $rev AS rev
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |GROUP BY n_name ORDER BY rev DESC, n_name ASC""".stripMargin,

    "point_lookup" ->
      """SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
        |WHERE l_quantity = 50.0 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "window_rank" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    rank() OVER (PARTITION BY o_custkey
        |                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |  FROM orders
        |) WHERE rnk <= 3 ORDER BY o_custkey, rnk, o_orderkey""".stripMargin,

    "events_window" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY hour, event_type ORDER BY hour, event_type""".stripMargin,

    "set_ops" ->
      """SELECT o_custkey AS custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  EXCEPT
        |  SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        |) ORDER BY custkey""".stripMargin,

    // DuckDB ASOF with a <= comparison selects the nearest FOLLOWING
    // right row — the forward direction
    "asof_join_forward" ->
      """WITH r AS (
        |  SELECT user_id, ts, max(event_id) AS event_id
        |  FROM events GROUP BY user_id, ts
        |)
        |SELECT o.o_orderkey, o.o_custkey, r.event_id, r.ts
        |FROM orders o ASOF JOIN r
        |  ON o.o_custkey = r.user_id AND o.o_orderdate <= r.ts
        |ORDER BY o_orderkey""".stripMargin,

    "asof_join" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate
        |)
        |SELECT e.event_id, e.user_id, r.o_orderkey, r.o_orderdate
        |FROM events e ASOF JOIN r
        |  ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
        |ORDER BY event_id""".stripMargin,

    // the skew-guarded bucketed spelling must produce EXACTLY the
    // plain asof result — same oracle
    "asof_join_bucketed" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate
        |)
        |SELECT e.event_id, e.user_id, r.o_orderkey, r.o_orderdate
        |FROM events e ASOF JOIN r
        |  ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
        |ORDER BY event_id""".stripMargin,

    // nearest = ASOF both directions, pick the closer side per row
    // (ties → backward) — mirrors AsOf.scala's takeBack predicate
    "asof_join_nearest" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate
        |), b AS (
        |  SELECT e.event_id, e.user_id, e.ts,
        |         r.o_orderkey AS b_key, r.o_orderdate AS b_date
        |  FROM events e ASOF LEFT JOIN r
        |    ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
        |), f AS (
        |  SELECT e.event_id,
        |         r.o_orderkey AS f_key, r.o_orderdate AS f_date
        |  FROM events e ASOF LEFT JOIN r
        |    ON e.user_id = r.o_custkey AND e.ts <= r.o_orderdate
        |), pick AS (
        |  SELECT b.event_id, b.user_id,
        |    CASE WHEN f.f_date IS NULL OR (b.b_date IS NOT NULL AND
        |           epoch_us(b.ts) - epoch_us(b.b_date)
        |             <= epoch_us(f.f_date) - epoch_us(b.ts))
        |         THEN b.b_key ELSE f.f_key END AS o_orderkey,
        |    CASE WHEN f.f_date IS NULL OR (b.b_date IS NOT NULL AND
        |           epoch_us(b.ts) - epoch_us(b.b_date)
        |             <= epoch_us(f.f_date) - epoch_us(b.ts))
        |         THEN b.b_date ELSE f.f_date END AS o_orderdate
        |  FROM b JOIN f USING (event_id)
        |)
        |SELECT event_id, user_id, o_orderkey, o_orderdate
        |FROM pick WHERE o_orderkey IS NOT NULL
        |ORDER BY event_id""".stripMargin,

    // tolerance = 30 days in micros; out-of-tolerance matches are
    // sentinel-coalesced exactly as the Spark side does
    "asof_join_tolerance" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate
        |)
        |SELECT e.event_id, e.user_id,
        |  CASE WHEN r.o_orderdate IS NOT NULL AND
        |            epoch_us(e.ts) - epoch_us(r.o_orderdate) <= 2592000000000
        |       THEN r.o_orderkey ELSE -1 END AS o_orderkey,
        |  CASE WHEN r.o_orderdate IS NOT NULL AND
        |            epoch_us(e.ts) - epoch_us(r.o_orderdate) <= 2592000000000
        |       THEN r.o_orderdate ELSE TIMESTAMP '1970-01-01 00:00:00'
        |       END AS o_orderdate
        |FROM events e ASOF LEFT JOIN r
        |  ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
        |ORDER BY event_id""".stripMargin,

    "running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |  count(*) OVER w AS running_n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "quantiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |  round(quantile_cont(l_quantity, 0.9), 6) AS p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "pivot_status" ->
      """SELECT l_returnflag,
        |  count(*) FILTER (l_linestatus = 'O') AS n_o,
        |  count(*) FILTER (l_linestatus = 'F') AS n_f
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_collect" ->
      """SELECT p_brand,
        |  string_agg(CAST(p_size AS VARCHAR), ',' ORDER BY p_size) AS sizes
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "events_json" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "semi_join" ->
      """SELECT o_orderstatus, count(*) AS n FROM orders
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin,

    "agg_having" ->
      """SELECT p_brand, count(*) AS n, count(DISTINCT p_type) AS n_types
        |FROM part GROUP BY p_brand HAVING count(*) >= 5
        |ORDER BY p_brand""".stripMargin,

    "scalar_subquery" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |WHERE p_retailprice > (
        |  SELECT CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |  FROM part)
        |ORDER BY p_partkey""".stripMargin,

    "rollup_counts" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "events_sessionize" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CASE WHEN prev_ts IS NULL
        |           OR ts - prev_ts > INTERVAL '30 minutes' THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        |FROM (
        |  SELECT user_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events
        |) GROUP BY user_id ORDER BY user_id""".stripMargin,

    // mirror of events_funnel via the THREE-JOIN spelling (min stage
    // time per user, re-filtered per stage) — deliberately a different
    // formulation than Spark's chained window minima, proving the
    // window chain computes the textbook funnel.
    "events_funnel" ->
      """WITH t1 AS (
        |  SELECT user_id,
        |         min(CASE WHEN event_type = 'view' THEN ts END) AS t1
        |  FROM events GROUP BY user_id
        |), t2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2
        |  FROM events e JOIN t1 ON e.user_id = t1.user_id
        |  WHERE e.event_type = 'click' AND t1.t1 IS NOT NULL AND e.ts > t1.t1
        |  GROUP BY e.user_id
        |), t3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM events e JOIN t2 ON e.user_id = t2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > t2.t2
        |  GROUP BY e.user_id
        |), c AS (
        |  SELECT (SELECT count(*) FROM t1 WHERE t1 IS NOT NULL) AS v,
        |         (SELECT count(*) FROM t2) AS c,
        |         (SELECT count(*) FROM t3) AS p
        |)
        |SELECT stage, users, round(CAST(users AS DOUBLE) / v, 6) AS rate
        |FROM (
        |  SELECT '1_view' AS stage, v AS users, v FROM c
        |  UNION ALL SELECT '2_click', c, v FROM c
        |  UNION ALL SELECT '3_purchase', p, v FROM c
        |) ORDER BY stage""".stripMargin,

    // mirror of events_paths: per-user lead chains, top-20 by
    // (n DESC, path ASC)
    "events_paths" ->
      """WITH seq AS (
        |  SELECT user_id, event_type AS e1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
        |  FROM events
        |)
        |SELECT e1 || '>' || e2 || '>' || e3 AS path, count(*) AS n,
        |       count(DISTINCT user_id) AS users
        |FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY path ORDER BY n DESC, path LIMIT 20""".stripMargin,

    // mirror of events_transitions: one lead window, (src,dst) counts
    // with distinct-user support, p = n/Σn per src rounded 6dp.
    "events_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type AS src,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
        |  FROM events
        |), c AS (
        |  SELECT src, dst, count(*) AS n, count(DISTINCT user_id) AS users
        |  FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
        |)
        |SELECT src, dst, n, users,
        |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY src), 6) AS p
        |FROM c ORDER BY src, dst""".stripMargin,

    // mirror of events_anomaly: exact-long hourly counts, variance as
    // the cleared rational (H·Σn²−(Σn)²)/H², exactly-rounded IEEE
    // sqrt/divides, 6dp rounding — filter on the ROUNDED z both sides
    "events_anomaly" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), stats AS (
        |  SELECT event_type, count(*) AS h, sum(n) AS sn, sum(n*n) AS snn
        |  FROM hourly GROUP BY event_type
        |), z AS (
        |  SELECT hour, ho.event_type AS event_type, n,
        |    round((CAST(n AS DOUBLE) - CAST(sn AS DOUBLE) / h) /
        |          sqrt(CAST(h*snn - sn*sn AS DOUBLE) / CAST(h*h AS DOUBLE)), 6) AS z
        |  FROM hourly ho JOIN stats st ON ho.event_type = st.event_type
        |  WHERE h*snn > sn*sn
        |)
        |SELECT * FROM z WHERE abs(z) >= 2.0 ORDER BY hour, event_type""".stripMargin,

    // mirror of events_retention: first-seen-day cohorts × day offset
    "events_retention" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day FROM events
        |), f AS (
        |  SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id
        |)
        |SELECT f.cohort_day,
        |       CAST(date_diff('day', f.cohort_day, e.day) AS BIGINT) AS day_no,
        |       count(DISTINCT e.user_id) AS users
        |FROM e JOIN f ON e.user_id = f.user_id
        |GROUP BY f.cohort_day, day_no
        |ORDER BY f.cohort_day, day_no""".stripMargin,

    // mirror of events_attribution: last strictly-prior non-purchase
    // row via IGNORE NULLS over the [unbounded, -1] frame — the three
    // picks share one CASE so they come from the same row
    "events_attribution" ->
      """WITH a AS (
        |  SELECT event_id, ts, user_id, event_type,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_id END
        |      IGNORE NULLS) OVER w AS attr_event_id,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |      IGNORE NULLS) OVER w AS attr_type,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN ts END
        |      IGNORE NULLS) OVER w AS attr_ts
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |)
        |SELECT event_id, user_id, attr_event_id, attr_type,
        |       epoch_us(ts) - epoch_us(attr_ts) AS gap_us
        |FROM a
        |WHERE event_type = 'purchase' AND attr_event_id IS NOT NULL
        |ORDER BY event_id""".stripMargin,

    // mirror of events_rolling_active: the inequality-join spelling of
    // the 7-day rolling distinct (the Spark side uses bounded ×7
    // expansion — same row set by construction)
    "events_rolling_active" ->
      """WITH pairs AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
        |), days AS (
        |  SELECT DISTINCT day FROM pairs
        |)
        |SELECT d.day, count(DISTINCT p.user_id) AS wau
        |FROM days d JOIN pairs p ON p.day BETWEEN d.day - 6 AND d.day
        |GROUP BY d.day ORDER BY d.day""".stripMargin,

    // mirror of events_range_join: the naive non-equi self-join the
    // bucketed plan replaces — canonical (t, id) pair order, exact µs
    "events_range_join" ->
      """SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
        |       epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND epoch_us(b.ts) - epoch_us(a.ts) BETWEEN 0 AND 600000000
        | AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
        |ORDER BY id_a, id_b""".stripMargin,

    // mirror of events_changepoint: micro-unit long values, exact
    // long frame sums over the same (ts, event_id) sort, the LONG
    // detection gate, one exactly-rounded IEEE division at 6dp
    "events_changepoint" ->
      """WITH e AS (
        |  SELECT event_id, user_id, ts,
        |         CAST(round(value * 1e6) AS BIGINT) AS mv
        |  FROM events
        |), w AS (
        |  SELECT event_id, user_id,
        |    count(*) OVER wb AS nb, count(*) OVER wa AS na,
        |    sum(mv)  OVER wb AS sb, sum(mv)  OVER wa AS sa
        |  FROM e
        |  WINDOW wb AS (PARTITION BY user_id ORDER BY ts, event_id
        |                ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING),
        |         wa AS (PARTITION BY user_id ORDER BY ts, event_id
        |                ROWS BETWEEN 1 FOLLOWING AND 8 FOLLOWING)
        |)
        |SELECT event_id, user_id,
        |       round(CAST(sa - sb AS DOUBLE) / 8e6, 6) AS shift
        |FROM w
        |WHERE nb = 8 AND na = 8 AND abs(sa - sb) >= 400000000
        |ORDER BY event_id""".stripMargin,

    // mirror of q6_forecast: same predicate set, decimal product sum
    "q6_forecast" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |  CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    // mirror of q14_promo: two exact decimal sums, one rounded ratio
    "q14_promo" ->
      """SELECT round(100.0 *
        |  CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE), 6) AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin,

    // mirror of orders_pareto: exact cents, same total order, the
    // window spelling of the two-phase cumulative sum
    "orders_pareto" ->
      """WITH per AS (
        |  SELECT o_custkey AS custkey,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1
        |), r AS (
        |  SELECT custkey, cents,
        |    CAST(row_number() OVER
        |      (ORDER BY cents DESC, custkey) AS BIGINT) AS rnk,
        |    CAST(sum(cents) OVER (ORDER BY cents DESC, custkey
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM per
        |), t AS (
        |  SELECT CAST(sum(cents) AS BIGINT) AS total FROM per
        |)
        |SELECT custkey, cents, rnk, cum,
        |  round(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share,
        |  (cum - cents) * 2 < total AS top50
        |FROM r, t ORDER BY rnk""".stripMargin,

    // mirror of window_percentiles: identical formulas, total order
    "window_percentiles" ->
      """SELECT o_orderkey,
        |  date_trunc('month', o_orderdate) AS month,
        |  round(percent_rank() OVER w, 9) AS pr,
        |  round(cume_dist() OVER w, 9) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY date_trunc('month', o_orderdate)
        |  ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    // mirror of events_rolling_median: same micro-unit longs, same
    // (ts, event_id) frame, the (lower, upper) middle pair of the
    // sorted 9-row window — integer order statistics on both engines
    "events_rolling_median" ->
      """WITH e AS (
        |  SELECT event_id, user_id, ts,
        |         CAST(round(value * 1e6) AS BIGINT) AS mv
        |  FROM events
        |), w AS (
        |  SELECT event_id, user_id,
        |    list_sort(list(mv) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN 8 PRECEDING AND CURRENT ROW)) AS win
        |  FROM e
        |)
        |SELECT event_id, user_id, CAST(len(win) AS BIGINT) AS n_win,
        |  win[(len(win) + 1) // 2] AS med_lo,
        |  win[len(win) // 2 + 1] AS med_hi
        |FROM w ORDER BY event_id""".stripMargin,

    // mirror of events_lag_features: one named window per frame,
    // exact longs, the rn >= 3 gate drops the null-lag prefix
    "events_lag_features" ->
      """WITH e AS (
        |  SELECT event_id, user_id, ts,
        |         CAST(round(value * 1e6) AS BIGINT) AS mv
        |  FROM events
        |), w AS (
        |  SELECT event_id, user_id,
        |    row_number() OVER win AS rn,
        |    mv - lag(mv, 1) OVER win AS d1,
        |    lag(mv, 1) OVER win - lag(mv, 2) OVER win AS d2,
        |    epoch_us(ts) - epoch_us(lag(ts, 1) OVER win) AS gap_us,
        |    min(mv) OVER win4 AS rmin4,
        |    max(mv) OVER win4 AS rmax4
        |  FROM e
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id),
        |    win4 AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_id, user_id, d1, d2, gap_us, rmin4, rmax4
        |FROM w WHERE rn >= 3 ORDER BY event_id""".stripMargin,

    // mirror of join_salted: the salt is pure partitioning — result
    // rows equal the PLAIN equi-join, which is what the oracle runs
    "join_salted" ->
      s"""SELECT p_brand AS brand, $rev AS rev, count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY brand ORDER BY brand""".stripMargin,

    // mirror of basket_pairs: canonical a<b self-join per order,
    // lift = one IEEE division of two exact long products
    "basket_pairs" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), n AS (
        |  SELECT count(DISTINCT ok) AS n_orders FROM li
        |), sup AS (
        |  SELECT pk, count(*) AS n_p FROM li GROUP BY pk
        |), pairs AS (
        |  SELECT a.pk AS pa, b.pk AS pb, count(*) AS n_ab
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2
        |)
        |SELECT pa, pb, n_ab, sa.n_p AS n_a, sb.n_p AS n_b,
        |  round(CAST(n_ab * n_orders AS DOUBLE) / (sa.n_p * sb.n_p), 6)
        |    AS lift
        |FROM pairs JOIN sup sa ON sa.pk = pa
        |JOIN sup sb ON sb.pk = pb CROSS JOIN n
        |ORDER BY n_ab DESC, pa, pb LIMIT 50""".stripMargin,

    // mirror of events_hop: each event lands in exactly 4 windows of
    // the 15-min slide grid (both engines align buckets to midnight-
    // divisible origins, so the grids coincide)
    "events_hop" ->
      """WITH e AS (
        |  SELECT event_type,
        |         time_bucket(INTERVAL 15 minutes, ts) AS tb
        |  FROM events
        |), w AS (
        |  SELECT event_type, tb - k * INTERVAL 15 minutes AS ws
        |  FROM e, LATERAL unnest(range(0, 4)) AS t(k)
        |)
        |SELECT ws, event_type, count(*) AS n
        |FROM w GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin,

    // mirror of customer_rfm: row_number() total orders (the
    // two-phase globalRank produces identical ranks), integer
    // quintile formula, decimal-exact spend
    "customer_rfm" ->
      """WITH per AS (
        |  SELECT o_custkey AS custkey,
        |    max(CAST(o_orderdate AS DATE)) AS last_day,
        |    count(*) AS frequency,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS monetary
        |  FROM orders GROUP BY o_custkey
        |), mx AS (
        |  SELECT max(last_day) AS mx, count(*) AS n_cust FROM per
        |), base AS (
        |  SELECT custkey,
        |    CAST(date_diff('day', last_day, mx) AS BIGINT) AS recency_days,
        |    frequency, monetary, n_cust
        |  FROM per CROSS JOIN mx
        |), r AS (
        |  SELECT *,
        |    row_number() OVER (ORDER BY recency_days ASC, custkey ASC) AS rnk_r,
        |    row_number() OVER (ORDER BY frequency DESC, custkey ASC) AS rnk_f,
        |    row_number() OVER (ORDER BY monetary DESC, custkey ASC) AS rnk_m
        |  FROM base
        |)
        |SELECT custkey, recency_days, frequency, monetary,
        |  (rnk_r - 1) * 5 // n_cust + 1 AS r_score,
        |  (rnk_f - 1) * 5 // n_cust + 1 AS f_score,
        |  (rnk_m - 1) * 5 // n_cust + 1 AS m_score,
        |  CAST((rnk_r - 1) * 5 // n_cust + 1 AS VARCHAR)
        |    || CAST((rnk_f - 1) * 5 // n_cust + 1 AS VARCHAR)
        |    || CAST((rnk_m - 1) * 5 // n_cust + 1 AS VARCHAR) AS segment
        |FROM r ORDER BY custkey""".stripMargin,

    // mirror of stats_profile: per-column stats UNION'd, min/max on
    // the native type then cast to VARCHAR (date and decimal casts
    // render identically in both engines)
    "stats_profile" ->
      """WITH p1 AS (
        |  SELECT 'l_orderkey' AS "column", count(*) AS n_rows,
        |    count(l_orderkey) AS n_nonnull,
        |    count(DISTINCT l_orderkey) AS n_distinct,
        |    CAST(min(l_orderkey) AS VARCHAR) AS min_s,
        |    CAST(max(l_orderkey) AS VARCHAR) AS max_s
        |  FROM lineitem
        |), p2 AS (
        |  SELECT 'l_linenumber', count(*), count(l_linenumber),
        |    count(DISTINCT l_linenumber),
        |    CAST(min(CAST(l_linenumber AS BIGINT)) AS VARCHAR),
        |    CAST(max(CAST(l_linenumber AS BIGINT)) AS VARCHAR)
        |  FROM lineitem
        |), p3 AS (
        |  SELECT 'l_returnflag', count(*), count(l_returnflag),
        |    count(DISTINCT l_returnflag),
        |    CAST(min(l_returnflag) AS VARCHAR),
        |    CAST(max(l_returnflag) AS VARCHAR)
        |  FROM lineitem
        |), p4 AS (
        |  SELECT 'l_shipdate', count(*), count(l_shipdate),
        |    count(DISTINCT CAST(l_shipdate AS DATE)),
        |    CAST(min(CAST(l_shipdate AS DATE)) AS VARCHAR),
        |    CAST(max(CAST(l_shipdate AS DATE)) AS VARCHAR)
        |  FROM lineitem
        |), p5 AS (
        |  SELECT 'l_quantity', count(*), count(l_quantity),
        |    count(DISTINCT CAST(l_quantity AS DECIMAL(18,2))),
        |    CAST(min(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR),
        |    CAST(max(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR)
        |  FROM lineitem
        |)
        |SELECT * FROM p1 UNION ALL SELECT * FROM p2
        |UNION ALL SELECT * FROM p3 UNION ALL SELECT * FROM p4
        |UNION ALL SELECT * FROM p5
        |ORDER BY "column"""".stripMargin,

    // mirror of Profile.corrMatrix: decimal-exact moments in ONE
    // pass, the Pearson formula in the IDENTICAL double expression
    "corr_matrix" -> corrMatrixSql,

    // mirror of events_cube: hour computed per-row, then CUBE; money
    // protocol on the value sum
    "events_cube" ->
      """SELECT event_type, hr, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr, value
        |      FROM events)
        |GROUP BY CUBE (event_type, hr)
        |ORDER BY event_type ASC NULLS FIRST, hr ASC NULLS FIRST""".stripMargin,

    // mirror of Resample.forwardFill: per-user hourly grid via
    // generate_series between the user's own first/last bucket,
    // last-event-per-bucket pick by (ts, id), IGNORE NULLS forward
    // fill; the value passes through untouched (no float arithmetic)
    "events_resample" ->
      """WITH ev AS (
        |  SELECT user_id AS k, date_trunc('hour', ts) AS bkt, ts,
        |    event_id AS id, value AS v
        |  FROM events
        |), pb AS (
        |  SELECT k, bkt, n_events, v FROM (
        |    SELECT k, bkt, ts, id, v,
        |      count(*) OVER (PARTITION BY k, bkt) AS n_events,
        |      row_number() OVER (PARTITION BY k, bkt
        |        ORDER BY ts DESC, id DESC) AS rn
        |    FROM ev) WHERE rn = 1
        |), grid AS (
        |  SELECT k, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bkt
        |  FROM (SELECT k, min(bkt) AS lo, max(bkt) AS hi FROM ev GROUP BY k)
        |)
        |SELECT g.k AS key, g.bkt AS bkt,
        |  coalesce(pb.n_events, 0) AS n_events,
        |  last_value(pb.v IGNORE NULLS) OVER (PARTITION BY g.k
        |    ORDER BY g.bkt
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
        |  (pb.v IS NULL) AS filled
        |FROM grid g LEFT JOIN pb ON g.k = pb.k AND g.bkt = pb.bkt
        |ORDER BY key, bkt""".stripMargin,

    // mirror of Graph.pageRank over the customer–supplier trade
    // graph: 5 unrolled iterations, pure integer arithmetic
    // (BIGINT // is floored integer division; all operands positive)
    "graph_pagerank" -> pageRankSql(5),

    // mirror of Graph.triangleCounts over the support≥2 co-purchase
    // graph: same degree orientation ((d, node) tuple compare), same
    // oriented wedge join — each triangle once, exploded to its 3
    // nodes
    "graph_triangles" ->
      """WITH e AS (
        |  SELECT a.l_partkey AS x, b.l_partkey AS y
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY x, y HAVING count(*) >= 2
        |), deg AS (
        |  SELECT n, count(*) AS d FROM (
        |    SELECT x AS n FROM e UNION ALL SELECT y FROM e) GROUP BY n
        |), o AS (
        |  SELECT CASE WHEN (da.d, e.x) < (db.d, e.y) THEN e.x ELSE e.y END AS u,
        |         CASE WHEN (da.d, e.x) < (db.d, e.y) THEN e.y ELSE e.x END AS v,
        |         CASE WHEN (da.d, e.x) < (db.d, e.y) THEN db.d ELSE da.d END AS dv
        |  FROM e JOIN deg da ON da.n = e.x JOIN deg db ON db.n = e.y
        |), tri AS (
        |  SELECT p.u AS ta, p.v AS tb, q.v AS tc
        |  FROM o p JOIN o q ON p.u = q.u
        |    AND (p.dv, p.v) < (q.dv, q.v)
        |  JOIN o r ON r.u = p.v AND r.v = q.v
        |), nx AS (
        |  SELECT unnest([ta, tb, tc]) AS node FROM tri
        |)
        |SELECT node, count(*) AS n_tri FROM nx
        |GROUP BY node ORDER BY node""".stripMargin,

    // mirror of Profile.groupTrend over per-nation monthly revenue:
    // exact integer moments (sums CAST BIGINT — DuckDB sum widens to
    // HUGEINT), normal equations as single IEEE divisions, 6dp
    "trend_sales" ->
      """WITH monthly AS (
        |  SELECT n.n_name AS grp,
        |    CAST((year(CAST(o.o_orderdate AS DATE)) - 1992) * 12
        |         + month(CAST(o.o_orderdate AS DATE)) - 1 AS BIGINT) AS x,
        |    CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
        |         AS BIGINT) AS y
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY grp, x
        |), m AS (
        |  SELECT grp, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM monthly GROUP BY grp
        |)
        |SELECT grp, n,
        |  CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE
        |    CAST(n * sxy - sx * sy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope,
        |  CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE
        |    CAST(sy * sxx - sx * sxy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE) END AS intercept
        |FROM m ORDER BY grp""".stripMargin,

    // mirror of graph_components: WITH RECURSIVE transitive closure
    // over the support≥2 co-purchase graph, component label = min
    // reachable node (incl. self)
    "graph_components" ->
      """WITH RECURSIVE e AS (
        |  SELECT la.l_partkey AS a, lb.l_partkey AS b
        |  FROM lineitem la JOIN lineitem lb
        |    ON la.l_orderkey = lb.l_orderkey AND la.l_partkey < lb.l_partkey
        |  WHERE la.l_partkey % 10 = 0 AND lb.l_partkey % 10 = 0
        |  GROUP BY a, b HAVING count(*) >= 2
        |), sym AS (
        |  SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e
        |), reach AS (
        |  SELECT src AS id, dst AS r FROM sym
        |  UNION
        |  SELECT reach.id, sym.dst FROM reach JOIN sym ON reach.r = sym.src
        |)
        |SELECT id, least(id, min(r)) AS label
        |FROM reach GROUP BY id ORDER BY id""".stripMargin,

    // TPC-H Q7 shape: bilateral trade revenue between two nations
    "q7_volume" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS yr, $rev AS rev
        |FROM lineitem, orders, supplier, customer, nation n1, nation n2
        |WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        |  AND o_custkey = c_custkey AND s_nationkey = n1.n_nationkey
        |  AND c_nationkey = n2.n_nationkey
        |  AND n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        |  AND n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        |  AND n1.n_name <> n2.n_name
        |  AND year(CAST(l_shipdate AS DATE)) IN (1995, 1996, 1997, 1998)
        |GROUP BY supp_nation, cust_nation, yr
        |ORDER BY supp_nation, cust_nation, yr""".stripMargin,

    // TPC-H Q9 shape (cost = retail·qty; corpus has no partsupp):
    // decimal-exact profit amounts, rounded once in double
    "q9_profit" ->
      """SELECT n_name AS nation,
        |  CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
        |  round(CAST(sum(
        |    CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |    - CAST(p_retailprice AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS profit
        |FROM lineitem, part, orders, supplier, nation
        |WHERE l_partkey = p_partkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |  AND p_name LIKE '%red%'
        |GROUP BY n_name, yr ORDER BY nation ASC, yr DESC""".stripMargin,

    // TPC-H Q18 shape: large-volume customers via the lineitem-only
    // HAVING aggregate joined back
    "q18_large" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 250
        |)
        |SELECT c_custkey, o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
        |  sum_qty
        |FROM orders JOIN big ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,

    // mirror of Profile.histogram over lineitem price cents: floored
    // integer bucket boundaries off the 1-row min/max
    "stats_histogram" ->
      """WITH v AS (
        |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |              AS BIGINT) AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |), mm AS (SELECT min(v) AS mn, max(v) AS mx FROM v)
        |SELECT least(((v.v - mm.mn) * 10) // (mm.mx - mm.mn + 1),
        |             CAST(9 AS BIGINT)) AS bucket,
        |  count(*) AS n, min(v.v) AS v_min, max(v.v) AS v_max
        |FROM v CROSS JOIN mm
        |GROUP BY bucket ORDER BY bucket""".stripMargin
  )

  /** the 6-pair Pearson mirror, generated so the double formula is
    * typed once (any asymmetry between pairs would be a hash bug)
    */
  private def corrMatrixSql: String = {
    val cols = Seq("l_quantity" -> "q", "l_extendedprice" -> "e",
      "l_discount" -> "d", "l_tax" -> "t")
    val sums = cols.map { case (c, a) =>
      s"sum(CAST($c AS DECIMAL(18,6))) AS s_$a" }
    val prods = for {
      i <- cols.indices; j <- i until cols.size
      (ci, ai) = cols(i); (cj, aj) = cols(j)
    // DECIMAL(28,6) operands: DuckDB multiplies DECIMAL(18,·) in
    // int64 and overflows on price×price; 28 forces int128. The
    // values are identical — Spark's (18,6) product is exact too.
    } yield s"sum(CAST($ci AS DECIMAL(28,6)) * CAST($cj AS DECIMAL(28,6))) AS p_$ai$aj"
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
      (cx, ax) = cols(i); (cy, ay) = cols(j)
    } yield {
      val (sxx, syy, sxy) = (s"p_$ax$ax", s"p_$ay$ay", s"p_$ax$ay")
      s"""SELECT '$cx' AS col_x, '$cy' AS col_y, n,
         |  round((CAST(n AS DOUBLE) * CAST($sxy AS DOUBLE)
         |          - CAST(s_$ax AS DOUBLE) * CAST(s_$ay AS DOUBLE)) /
         |    (sqrt(CAST(n AS DOUBLE) * CAST($sxx AS DOUBLE)
         |          - CAST(s_$ax AS DOUBLE) * CAST(s_$ax AS DOUBLE)) *
         |     sqrt(CAST(n AS DOUBLE) * CAST($syy AS DOUBLE)
         |          - CAST(s_$ay AS DOUBLE) * CAST(s_$ay AS DOUBLE))), 6)
         |    AS corr
         |FROM m""".stripMargin
    }
    s"""WITH m AS (
       |  SELECT count(*) AS n,
       |    ${(sums ++ prods).mkString(",\n    ")}
       |  FROM lineitem
       |)
       |${pairs.mkString("\nUNION ALL\n")}
       |ORDER BY col_x, col_y""".stripMargin
  }

  /** PageRank mirror: r_{i+1}(dst) = 150000 + Σ_{src→dst}
    * (r_i(src)·85) // (100·deg(src)), unrolled `iters` times
    */
  private def pageRankSql(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT ed.dst AS node,
         |    150000 + CAST(sum((r.rank_micro * 85) // (ed.deg * 100))
         |      AS BIGINT) AS rank_micro
         |  FROM ed JOIN r${i - 1} r ON ed.src = r.node
         |  GROUP BY ed.dst
         |)"""
    }.mkString(", ")
    s"""WITH pair AS (
       |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS a,
       |    's' || CAST(l_suppkey AS VARCHAR) AS b
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |), e AS (
       |  SELECT a AS src, b AS dst FROM pair
       |  UNION SELECT b, a FROM pair
       |), deg AS (
       |  SELECT src, count(*) AS deg FROM e GROUP BY src
       |), ed AS (
       |  SELECT e.src, e.dst, deg.deg FROM e JOIN deg USING (src)
       |), r0 AS (
       |  SELECT src AS node, CAST(1000000 AS BIGINT) AS rank_micro FROM deg
       |), $steps
       |SELECT node, rank_micro FROM r$iters ORDER BY node""".stripMargin
  }

  def all: Map[String, String] = refSurface ++ knn ++ analytics
}
