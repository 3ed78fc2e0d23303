package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{IndexSpec, IndexedFrame, Store}

/** BASELINE evidence probe: runs graft's spellings of the exact
  * workloads the reference's committed perf snapshots record
  * (io/test/perf/df/writing-indexed-perf_exp.txt,
  * multidf-colidmemratio_exp.txt — the repo ships its own measured
  * numbers: 262,144 items / 5 indexed columns / 101,304 index
  * entries; index write 33,683 ms; open 1,715-2,463 ms; 1024 entry
  * searches 171 ms; 1024 CoStats 895 ms; 1024 popcounts ≈2 ms and
  * 1024 fAnds ≈3 ms once bitmaps are open).
  *
  * The probe reports the same OPERATION COUNTS on the sf0.1 tables
  * (lineitem: ~600k rows — ~2.3× the snapshot's item count) so
  * BASELINE.md can put a measured graft number next to each recorded
  * reference number. Spark expresses the 1024-point-op loops as ONE
  * batch query each — that is the engine's native shape for them —
  * so each row reports total ms and amortized µs/op.
  *
  * Usage: runMain graft.BaselineProbe [sfDir] [outDir]
  */
object BaselineProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.drop(1).headOption.getOrElse("/tmp/graft_baseline_probe")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // same 5-identity-column index shape as the snapshot's ExampleItem
    val fields = Seq("l_returnflag", "l_linestatus", "l_linenumber",
      "l_tax", "l_quantity")
    val spec = IndexSpec(fields)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
    val nRows = li.count()

    def bestOf(reps: Int)(body: => Unit): Double = {
      var best = Double.MaxValue
      (0 until reps).foreach { _ =>
        val t0 = System.nanoTime()
        body
        best = math.min(best, (System.nanoTime() - t0) / 1e6)
      }
      best
    }

    val results = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Long)]

    // 1. indexed write: rows + (field,value,f) index to parquet
    //    (reference: writing-indexed-perf 33,683 ms for 262k items)
    val wr = bestOf(3) { Store.write(li, s"$outDir/store", spec) }
    results += "write_indexed" -> (wr, nRows)

    // 2. reopen: data + merged index readable, index entry count
    //    (reference: opening multidf 1,715-2,463 ms)
    var nEntries = 0L
    val op = bestOf(3) {
      nEntries = Store.open(spark, s"$outDir/store", spec).persistedIndex.count()
    }
    results += "open_count_index" -> (op, nEntries)

    // 3. 1024 (field,value) frequency lookups from the persisted
    //    index as ONE batch semi-join on a hash-sampled key set
    //    (reference: searching 1024 ids 171 ms + 1024 popcounts 2 ms)
    val st = Store.open(spark, s"$outDir/store", spec)
    // localCheckpoint(eager): count() alone does NOT pin a frame — the
    // sort+limit would silently re-execute inside every measured rep,
    // billing sample construction to the lookup being compared
    val keys = st.persistedIndex
      .orderBy(xxhash64(col("field"), col("value"))).limit(1024)
      .select("field", "value")
      .localCheckpoint(true) // materialize OUTSIDE the measured lookup
    val nKeys = keys.count()
    val fr = bestOf(3) {
      st.persistedIndex.join(broadcast(keys), Seq("field", "value"))
        .select(sum("f")).head()
    }
    results += "freq_1024" -> (fr, nKeys)

    // 4. CoStats for every (l_quantity × ship_month) value pair —
    //    50×~84 ≈ 4,200 pairs ≥ 4× the snapshot's 1024-cofreq loop —
    //    full smoothed stats in one grouped pass
    //    (reference: 1024 CoStats 807-895 ms)
    val ix = IndexedFrame(li, IndexSpec(fields :+ "ship_month"))
    var nPairs = 0L
    val cs = bestOf(3) {
      nPairs = ix.coStatsMatrix("l_quantity", "ship_month").count()
    }
    results += "costats_matrix" -> (cs, nPairs)

    // 5. bitmap-algebra analog: AND/OR/XOR/DIFF counts of two
    //    predicates in ONE conditional-aggregation pass
    //    (reference: 1024 fAnds 1-3 ms on open bitmaps — amortized
    //    per-op is near-zero on both sides; the fixed cost differs)
    val bq = bestOf(3) {
      val a = col("l_returnflag") === "R"
      val b = col("l_linestatus") === "F"
      li.agg(
        sum(when(a && b, 1L).otherwise(0L)),
        sum(when(a || b, 1L).otherwise(0L)),
        sum(when(a =!= b, 1L).otherwise(0L)),
        sum(when(a && !b, 1L).otherwise(0L))).head()
    }
    results += "bool_counts" -> (bq, 4L)

    // 6-8. the reference snapshot's ACTUAL index shape is entry-heavy
    //    (101,304 index entries for 262,144 items — ExampleItem's
    //    tokenized text makes most entries near-unique). The synthetic
    //    documents corpus has a ~50-word vocabulary, so its token
    //    index can't reproduce that shape; the lineitem KEY columns
    //    can: l_orderkey/l_partkey/l_suppkey give ~168k distinct
    //    (field,value) entries over 600k rows (0.28 entries/item vs
    //    the snapshot's 0.39) — same write/open/1024-lookup workload
    //    at the same index-cardinality order of magnitude
    val hiSpec = IndexSpec(Seq("l_orderkey", "l_partkey", "l_suppkey"))
    val hwr = bestOf(3) { Store.write(li, s"$outDir/histore", hiSpec) }
    results += "write_hicard_indexed" -> (hwr, nRows)

    var nHiEntries = 0L
    val hop = bestOf(3) {
      nHiEntries =
        Store.open(spark, s"$outDir/histore", hiSpec).persistedIndex.count()
    }
    results += "open_count_hicard_index" -> (hop, nHiEntries)

    val hst = Store.open(spark, s"$outDir/histore", hiSpec)
    val hkeys = hst.persistedIndex
      .orderBy(xxhash64(col("field"), col("value"))).limit(1024)
      .select("field", "value")
      .localCheckpoint(true) // materialize OUTSIDE the measured lookup
    val nHKeys = hkeys.count()
    val hfr = bestOf(3) {
      hst.persistedIndex.join(broadcast(hkeys), Seq("field", "value"))
        .select(sum("f")).head()
    }
    results += "hicard_freq_1024" -> (hfr, nHKeys)

    // 9-10. the row-refs artifact (the reference's per-entry bitmap
    //    payload): write cost with refs enabled, then 1024 MEMBERSHIP
    //    lookups — each op enumerates the ROWS matching a (field,value)
    //    entry, the workload the reference serves by opening 1024
    //    bitsets and reading their set bits (243-257 ms + µs-scale
    //    reads). Served INDEX-ONLY from the persisted refs parquet;
    //    the 600k-row base table is never scanned.
    val refSpec = hiSpec.withRowRefs("l_orderkey")
    val rwr = bestOf(3) { Store.write(li, s"$outDir/refstore", refSpec) }
    results += "write_hicard_with_refs" -> (rwr, nRows)

    val rst = Store.open(spark, s"$outDir/refstore", refSpec)
    val rrefs = rst.rowRefs.get
    val mr = bestOf(3) {
      rrefs.join(broadcast(hkeys), Seq("field", "value"))
        .select(count(col("row_key"))).head()
    }
    results += "rowrefs_membership_1024" -> (mr, nHKeys)

    // 11. ONE interactive point membership op (not amortized), served
    //    by the library's actual single-op path: the driver-side
    //    footer-pruned parquet read (core/PointRead — no Spark job),
    //    the analog of the reference's warm-mmap single-bitmap open.
    //    First call pays the footer-cache build; bestOf reports the
    //    warm number, like the reference's warm-mmap one.
    val oneKey = hkeys.limit(1).collect().head
    val pr = bestOf(5) {
      rst.rowsOfPoint(oneKey.getString(0), oneKey.getString(1))
    }
    results += "rowrefs_single_point" -> (pr, 1L)

    // 11b. the same op through the Spark plan (what a cluster-side
    //    caller embedded in a larger query pays): floor = scheduler
    //    round-trip — kept for the record next to 11
    val prPlan = bestOf(5) {
      rst.rowsOf(oneKey.getString(0), oneKey.getString(1)).collect()
    }
    results += "rowrefs_single_point_plan" -> (prPlan, 1L)

    // 11c. single-point frequency (one bitmap popcount), driver-side
    val pf = bestOf(5) {
      rst.fPoint(oneKey.getString(0), oneKey.getString(1))
    }
    results += "freq_single_point" -> (pf, 1L)

    // 11d. point CO-OCCURRENCE (the reference's fAnd over two warm
    //    bitmaps — its second-most-used interactive op): two point
    //    membership reads intersected driver-side, no Spark job.
    //    Keys from two DIFFERENT fields so the intersection is a
    //    genuine co-occurrence, not a same-field disjointness.
    val pairKeys = hkeys.collect()
    val kA = pairKeys.head
    val kB = pairKeys.find(_.getString(0) != kA.getString(0)).getOrElse(
      pairKeys.last)
    val pfa = bestOf(5) {
      rst.fAndPoint(kA.getString(0), kA.getString(1),
        kB.getString(0), kB.getString(1))
    }
    results += "rowrefs_point_fand" -> (pfa, 1L)

    // 11e. interactive CoStats (r14 — the reference's hot cofreq
    //    loop, CoStats over the four counts of two opened bitmaps):
    //    the SAME two point reads as 11d plus closed-form math; n is
    //    cached after the first call (frame metadata posture).
    val pcs = bestOf(5) {
      rst.coStatsPoint(kA.getString(0), kA.getString(1),
        kB.getString(0), kB.getString(1)).mi
    }
    results += "costats_point" -> (pcs, 1L)

    // 11f. interactive single-query knn (r14 — reference knn(k, v)):
    //    served from the persisted weight artifact + per-entry
    //    membership streams, driver-side — the reference's own
    //    walk-the-weighted-bitmaps algorithm. Store indexes the
    //    FEATURE fields with a unique row key (the knn contract).
    // the synthetic lineitem has DUPLICATE (orderkey, linenumber)
    // pairs — knnPoint's unique-key contract needs a synthesized id
    // (consistency is per-store: the index/refs are built from the
    // PERSISTED copy, so the id never recomputes differently)
    val liK = li.withColumn("li_key", monotonically_increasing_id())
    val knnSpec = IndexSpec(Seq("l_returnflag", "l_linestatus"))
      .withRowRefs("li_key")
    Store.write(liK, s"$outDir/knnstore", knnSpec)
    val kst = Store.open(spark, s"$outDir/knnstore", knnSpec)
    val knnW = graft.ops.Knn.keyValueWeights(liK,
      Seq("l_returnflag", "l_linestatus"), col("l_quantity") > 25)
    knnW.coalesce(1).write.mode("overwrite").parquet(s"$outDir/knnw")
    val wDrv = Store.readWeightsDriver(spark, s"$outDir/knnw")
    val knnQ = Map("l_returnflag" -> "R", "l_linestatus" -> "F")
    // a None here (ineligible/gated) would time a no-op — fail loud
    require(kst.knnPoint(wDrv, knnQ, 10).exists(_.size == 10),
      "knnPoint probe: fast path ineligible — probe would be vacuous")
    val pkn = bestOf(3) {
      kst.knnPoint(wDrv, knnQ, 10)
    }
    results += "knn_point_single" -> (pkn, 1L)

    // 11g. K-ENTRY interactive boolean algebra (r15 — the reference's
    //    composed bitmap expressions, LBits.scala:141-207
    //    createAnd/createOr over many open bitmaps): a 3-term
    //    AND/OR/NOT count set from ONE simultaneous driver-side walk
    //    of the three entries' row-key streams, n from the cached
    //    nPoint field scan.
    val kC = pairKeys.find(r => r.getString(0) != kA.getString(0) &&
      r.getString(0) != kB.getString(0)).getOrElse(pairKeys.last)
    val terms3 = Seq(kA, kB, kC).map(r => (r.getString(0), r.getString(1)))
    val pbp = bestOf(5) { rst.boolPoint(terms3) }
    results += "bool_point_3term" -> (pbp, 1L)

    // 11h. numeric-range point navigation (r15 — prefixPoint's
    //    numeric sibling over the sorted typed entry ordering): every
    //    l_suppkey entry with value in [100, 200], native numeric
    //    order, from the per-era driver-side field scan.
    require(rst.rangePoint("l_suppkey", 100, 200).nonEmpty,
      "rangePoint probe: empty answer — probe would be vacuous")
    val prg = bestOf(5) { rst.rangePoint("l_suppkey", 100, 200) }
    results += "range_point" -> (prg, 1L)

    val json = results.map { case (k, (ms, n)) =>
      val usPerOp = math.round(ms * 1000.0 / math.max(n, 1) * 100.0) / 100.0
      s""""$k":{"ms":${math.round(ms * 10.0) / 10.0},"ops":$n,"us_per_op":$usPerOp}"""
    }.mkString(",")
    println(s"""{"probe":"baseline","rows":$nRows,"cpus":$cpus,"sf":"$sfDir",$json}""")
    spark.stop()
  }
}
