package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators (SURVEY §2c.36-39): benchmark
  * decontamination, deterministic stratified / mixture sampling, and
  * PII scrubbing — the corpus-hygiene passes a large-scale training
  * pipeline runs between dedup and shard packing.
  *
  * Every operator here is deterministic by construction (hash order,
  * not RNG), so each one carries a full DuckDB hash oracle — no
  * rows-only rows in this family.
  */
object Curation {

  /** normalized tokens: lowercase, then every run of
    * non-alphanumerics (punctuation, newlines, tabs, spaces) becomes
    * ONE separator — the ONE tokenizer every contamination face
    * shares, so batch and streaming can never drift on normalization.
    * Replacement (not deletion) matters: deleting `[^a-z0-9 ]` would
    * fuse words across a newline ("the\ncapital" → "thecapital") and
    * let any multi-line variant of a benchmark item slip the check.
    */
  def normTokens(text: Column): Column =
    split(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")), " ")

  /** normalized distinct k-shingles of a STATIC eval/benchmark corpus
    * — the static side of the streaming face
    * ([[graft.streaming.EventPipeline.decontaminateStream]]); batch
    * [[contaminated]] derives the same set from its own is_eval slice
    */
  def evalShingleSet(evalDocs: DataFrame, text: Column,
                     k: Int = 8): DataFrame =
    evalDocs.select(normTokens(text).as("t"))
      .where(size(col("t")) >= k)
      .select(explode(graft.functions.TokenOps.wordShingles(col("t"), k,
        distinct = false)).as("sh"))
      .distinct()

  /** Benchmark decontamination (§2c.36): flag training docs that share
    * any `k`-token shingle with an eval/benchmark doc — the standard
    * n-gram-overlap contamination check run before training on scraped
    * corpora (k=8..13 in published recipes).
    *
    * Returns (doc_id, n_hits): contaminated training docs with their
    * count of distinct shared shingles.
    *
    * Both sides are NORMALIZED before shingling — lowercase +
    * punctuation-strip + whitespace-collapse — as every published
    * n-gram decontamination recipe does: "The Cat sat." and "the cat
    * sat" must collide, or trivial case/punct variants of benchmark
    * items leak through the check.
    *
    * Scale shape: the eval set is small relative to the corpus (here a
    * deterministic doc_id slice; in production the benchmark suite),
    * so its distinct-shingle set is BROADCAST and the corpus-side scan
    * streams map-only through tokenize → shingle → hash-join against
    * the broadcast — no shuffle touches the full shingle stream. The
    * broadcast is SIZE-ROUTED like every other join in the library:
    * the eval shingle set is materialized once (localCheckpoint), its
    * count decides broadcast vs shuffle join, so an eval predicate
    * that unexpectedly selects half the corpus degrades to a shuffle
    * join instead of blowing the driver/broadcast limit.
    */
  def contaminated(df: DataFrame, text: Column, id: Column,
                   isEval: Column, k: Int = 8,
                   broadcastShingleLimit: Long = 5_000_000L): DataFrame = {
    val toks = normTokens(text)
    // docs shorter than k tokens have no shingles: filter first, so
    // the native shingle kernel (full windows for size >= k) matches
    // the declarative sequence/slice spelling exactly
    val shingled = df
      .select(id.as("doc_id"), isEval.as("is_eval"), toks.as("t"))
      .where(size(col("t")) >= k)
      .select(col("doc_id"), col("is_eval"),
        explode(graft.functions.TokenOps.wordShingles(col("t"), k,
          distinct = false)).as("sh"))
    val evalShingles = shingled.where(col("is_eval"))
      .select("sh").distinct()
      .localCheckpoint() // materialize once: sizing count + join probe
    val corpus = shingled.where(!col("is_eval"))
    val hits =
      if (evalShingles.count() <= broadcastShingleLimit)
        corpus.join(broadcast(evalShingles), "sh")
      else corpus.join(evalShingles, "sh")
    hits.groupBy("doc_id")
      .agg(count_distinct(col("sh")).as("n_hits"))
      .orderBy("doc_id")
  }

  /** Overlap-RATIO decontamination (§2c.36c): the quality-gate form
    * of [[contaminated]]. Where `contaminated` lists hit docs with
    * their shared-shingle count, this scores EVERY training doc with
    * the fraction of its distinct k-shingles found in the eval set
    * and flags those at or above `threshold` — the GPT-3-style
    * published recipe ("remove documents with ≥N% n-gram overlap
    * with any benchmark"), where a doc quoting one benchmark line
    * survives but a near-copy is dropped.
    *
    * Same normalization, same shingle kernel, same size-routed
    * broadcast as [[contaminated]] — the corpus side stays a map-only
    * stream into the (left) hash join, then ONE shuffle by doc to
    * aggregate numerator and denominator together.
    */
  def ngramOverlap(df: DataFrame, text: Column, id: Column,
                   isEval: Column, k: Int = 8, threshold: Double = 0.5,
                   broadcastShingleLimit: Long = 5_000_000L): DataFrame = {
    val toks = normTokens(text)
    val shingled = df
      .select(id.as("doc_id"), isEval.as("is_eval"), toks.as("t"))
      .where(size(col("t")) >= k)
      .select(col("doc_id"), col("is_eval"),
        explode(graft.functions.TokenOps.wordShingles(col("t"), k,
          distinct = true)).as("sh"))
    val evalShingles = shingled.where(col("is_eval"))
      .select("sh").distinct().withColumn("hit", lit(1))
      .localCheckpoint() // materialize once: sizing count + join probe
    val corpus = shingled.where(!col("is_eval"))
    val joined =
      if (evalShingles.count() <= broadcastShingleLimit)
        corpus.join(broadcast(evalShingles), Seq("sh"), "left")
      else corpus.join(evalShingles, Seq("sh"), "left")
    joined.groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_hits"))
      .withColumn("ratio",
        round(col("n_hits").cast("double") / col("n_shingles"), 6))
      .withColumn("contaminated", col("ratio") >= threshold)
      .orderBy("doc_id")
  }

  /** Bloom-prefiltered decontamination (§2c.36b) — the 100 TB shape
    * of [[contaminated]] when the eval shingle set outgrows an exact
    * broadcast. The result is IDENTICAL (same oracle): the sketch only
    * decides which corpus shingles reach the exact verify join.
    *
    * Why this is the scale path: [[contaminated]]'s fallback for a
    * too-big eval set is a shuffle join, which shuffles the ENTIRE
    * corpus shingle stream (~10× the text bytes) on the shingle key.
    * Here the eval set is compressed to a Bloom filter — built
    * DISTRIBUTED (treeAggregate of partial filters, driver holds only
    * the merged ~MB sketch, the same sketch-sized-driver-state pattern
    * as IVF centroids) — and broadcast into a map-side codegen'd
    * probe ([[graft.functions.BloomMightContainLong]]) over xxhash64
    * of each corpus shingle. Only survivors — true hits plus an `fpp`
    * fraction of the stream — enter the exact verify join, so the
    * shuffle shrinks from the whole corpus shingle stream to
    * ~(hits + fpp·stream), and false positives die in the join. Exact
    * answer, sketch-sized memory, map-only corpus scan.
    */
  def contaminatedBloom(df: DataFrame, text: Column, id: Column,
                        isEval: Column, k: Int = 8,
                        fpp: Double = 0.01): DataFrame = {
    val toks = normTokens(text)
    val shingled = df
      .select(id.as("doc_id"), isEval.as("is_eval"), toks.as("t"))
      .where(size(col("t")) >= k)
      .select(col("doc_id"), col("is_eval"),
        explode(graft.functions.TokenOps.wordShingles(col("t"), k,
          distinct = false)).as("sh"))
    // distinct eval shingles, materialized once: sizes the sketch,
    // feeds the sketch build AND the exact verify join
    val evalShingles = shingled.where(col("is_eval"))
      .select("sh").distinct()
      .localCheckpoint()
    val nEval = evalShingles.count()
    // stat.bloomFilter NPEs on a zero-row frame (the aggregate yields
    // a null buffer); an empty eval set means nothing can be flagged,
    // so short-circuit the prefilter to false rather than build a
    // sketch from nothing
    val corpusAll = shingled.where(!col("is_eval"))
    val corpus =
      if (nEval == 0) corpusAll.where(lit(false))
      else {
        val bloom = evalShingles.select(xxhash64(col("sh")).as("hs"))
          .stat.bloomFilter("hs", math.max(nEval, 1000L), fpp)
        corpusAll.where(graft.functions.BloomF.mightContainLong(
          xxhash64(col("sh")), bloom))
      }
    // exact verify: deliberately NO broadcast hint — the premise is an
    // eval set too big to broadcast; the join's left side is already
    // bloom-thinned, and AQE may still pick broadcast when it fits
    corpus.join(evalShingles, "sh")
      .groupBy("doc_id")
      .agg(count_distinct(col("sh")).as("n_hits"))
      .orderBy("doc_id")
  }

  /** md5-as-sort-key: lowercase hex of the row id. Lexicographic order
    * on fixed-width lowercase hex == numeric order on the hash, and
    * both Spark and DuckDB produce identical md5 hex — so "first n by
    * hash order" is a deterministic, engine-portable uniform sample.
    */
  private def hashKey(id: Column): Column = md5(id.cast("string"))

  /** Deterministic global training order (§2c.38b): every doc's
    * position in md5-hash order — the reproducible global shuffle a
    * training run needs for lineage (re-running the pipeline
    * reproduces the exact epoch order; `rand()` and `TABLESAMPLE`
    * cannot be replayed or oracle-checked).
    *
    * Scale shape — a global rank WITHOUT the single-partition global
    * window (the classic two-phase rank): range-repartition on the
    * hash key (contiguous, non-overlapping ranges, ascending by
    * partition id) → per-PARTITION row_number (parallel window) →
    * exclusive per-partition offsets (a partition-COUNT-sized
    * aggregate, broadcast back). The only SinglePartition stage in
    * the plan touches the ~numShufflePartitions offset rows, never
    * the data. AQE may coalesce the range partitions; coalesced
    * partitions are unions of ADJACENT ranges, so pid order remains
    * global hash order and positions stay exact.
    */
  def shufflePositions(df: DataFrame, id: Column): DataFrame = {
    // local rank = monotonically_increasing_id's in-partition row
    // index (assigned in sorted order after the in-partition sort):
    // a Window.partitionBy(pid) would plan a SECOND full-data hash
    // exchange on pid — this reads the rank off the sorted stream
    // for free
    val local = df.select(id.as("doc_id"), hashKey(id).as("hk"))
      .repartitionByRange(col("hk"), col("doc_id"))
      .sortWithinPartitions(col("hk"), col("doc_id"))
      .select(col("doc_id"), col("hk"),
        spark_partition_id().as("pid"),
        (monotonically_increasing_id()
          .bitwiseAND(lit((1L << 33) - 1)) + 1L).as("ln"))
    val offsets = local.groupBy("pid").agg(count(lit(1)).as("n"))
      .withColumn("off",
        coalesce(sum("n").over(Window.orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "off")
    local.join(broadcast(offsets), "pid")
      .select(col("doc_id"), col("hk"), (col("ln") + col("off") - 1).as("pos"))
      // same expressions as the range partitioning → sort-only, no
      // exchange; (hk, doc_id) order IS pos order by construction
      .orderBy(col("hk"), col("doc_id"))
      .drop("hk")
  }

  /** Deterministic stratified sampling (§2c.37): keep at most `cap`
    * docs per stratum, chosen by md5-hash order — a seeded uniform
    * sample that is reproducible across engines and runs (unlike
    * `TABLESAMPLE`/`rand()`, which can't be oracle-checked and
    * resample on retry — poison for training-data lineage).
    *
    * Scale shape: one shuffle clustering by stratum, then a per-group
    * rank. Spark plans WindowGroupLimit (SPARK-37099) for the
    * row_number≤cap pattern, so each map partition prunes to `cap`
    * rows per stratum before the exchange; a pathologically hot
    * stratum degrades to that stratum's sort, not a global one.
    */
  def sampleStratified(df: DataFrame, stratum: Column, id: Column,
                       cap: Int): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(hashKey(id), id)
    df.withColumn("rn", row_number().over(w))
      .where(col("rn") <= cap)
      .drop("rn")
  }

  /** Per-domain quota under a quality gate (§2c.37d — RefinedWeb §3's
    * per-domain cap, with `stratum` standing in for the domain): among
    * docs passing `pass`, keep at most `cap` per stratum in
    * deterministic md5-hash order, and report each survivor's rank
    * plus the stratum's passing count (the kept/eligible accounting a
    * curation run publishes — n_pass > cap reads "this domain was
    * capped"). The gate is an arbitrary boolean Column, so any quality
    * operator here (Gopher/C4/classifier) composes.
    *
    * Scale shape: the gate filters BEFORE the exchange (map-side —
    * failing docs never shuffle). The n_pass accounting is a SEPARATE
    * grouped count broadcast-joined back (one row per stratum), NOT a
    * second window over the rank partition: a count window sitting
    * between the row_number window and the rn≤cap filter blocks the
    * WindowGroupLimit pushdown (the filter cannot cross a window it
    * doesn't partition-key-match), so a mega-domain would fully
    * shuffle and sort (r10 ADVICE). With the filter DIRECTLY above
    * the rank window, Spark plans WindowGroupLimit (plan-asserted,
    * PlanAuditSpec): map partitions prune to cap rows per stratum
    * before the exchange — a mega-domain degrades to a top-cap heap,
    * not its own full sort. Determinism: md5 order, no rand() — exact
    * on replay, oracle-checkable (the sampleStratified lineage
    * argument).
    */
  def domainCap(df: DataFrame, stratum: Column, id: Column,
                pass: Column, cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val gated = df.where(pass)
    val counts = gated.groupBy(stratum.as("s"))
      .agg(count(lit(1)).cast("long").as("n_pass"))
    val w = Window.partitionBy(stratum).orderBy(hashKey(id), id)
    gated
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= cap)
      // null-SAFE equality, as in sampleMixture: a null stratum is a
      // legitimate group and must meet its own count row
      .join(broadcast(counts), stratum <=> col("s"))
      .select(stratum.as("source"), id.as("doc_id"),
        col("rn").cast("long").as("rn"), col("n_pass"))
      .orderBy("source", "doc_id")
  }

  /** Temperature-flattened mixture sampling (§2c.38): per-stratum
    * quota ∝ sqrt(stratum size) — the α=0.5 power-law flattening used
    * to rebalance source/language mixtures for LM training (small
    * sources over-sampled relative to their share, giant sources
    * capped). Within each stratum the kept docs are the md5-hash-order
    * prefix, as in [[sampleStratified]].
    *
    * quota = max(1, floor(coeff·sqrt(n))). The coefficient is a fixed
    * scale knob rather than a normalized global budget on purpose:
    * normalizing by Σ sqrt(n_s) would make every quota depend on a
    * float SUM whose accumulation order differs between engines (and
    * between Spark runs) — a determinism hazard at exactly the
    * floor() boundary. coeff·sqrt(n) with a power-of-two coeff is a
    * single correctly-rounded IEEE op, bit-identical everywhere.
    *
    * Scale shape: quotas come from a groupBy-count over strata (tiny
    * result, broadcast back); the per-stratum rank is the same
    * WindowGroupLimit-prunable pattern as stratified sampling.
    */
  def sampleMixture(df: DataFrame, stratum: Column, id: Column,
                    coeff: Double = 4.0): DataFrame = {
    val quotas = df.groupBy(stratum.as("s"))
      .agg(greatest(lit(1L),
        floor(lit(coeff) * sqrt(count(lit(1))))).as("q"))
    val w = Window.partitionBy(stratum).orderBy(hashKey(id), id)
    df.withColumn("rn", row_number().over(w))
      // null-SAFE equality: a null stratum is a legitimate group (the
      // window above treats it as one) and must match its own quota
      // row, not silently drop out of the sample
      .join(broadcast(quotas), stratum <=> col("s"))
      .where(col("rn") <= col("q"))
      .drop("rn", "s", "q")
  }

  /** TOKEN-BUDGETED mixture sampling (§2c.38e — the budget a real
    * mixture spec is written in: "50B tokens of web, 5B of code",
    * never doc counts, because doc length varies 100× across
    * sources): per stratum, docs take the deterministic md5-hash
    * order ([[sampleMixture]]'s lineage argument — no rand()) and are
    * taken while the CUMULATIVE token count before the doc is under
    * the stratum's budget — so the sample always overshoots by less
    * than one document and a re-run reproduces it exactly. One
    * window exchange (partitionBy stratum, cumulative sum over the
    * md5 order); emits (source, doc_id, ntok, cum_before) of the
    * taken docs.
    */
  def sampleTokenBudget(df: DataFrame, stratum: Column, id: Column,
                        text: Column, budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val w = Window.partitionBy("source").orderBy(col("__h"), col("doc_id"))
    df.select(stratum.as("source"), id.as("doc_id"),
        coalesce(size(split(text, " ")).cast("long"), lit(0L)).as("ntok"),
        hashKey(id).as("__h"))
      .withColumn("cum_before",
        coalesce(sum("ntok").over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .where(col("cum_before") < budget)
      .select(col("source"), col("doc_id"), col("ntok"), col("cum_before"))
      .orderBy("source", "doc_id")
  }

  /** Temperature-weighted mixture INTERLEAVING (the training-ORDER
    * complement of [[sampleMixture]]'s quota sampling): each
    * stratum's docs take per-stratum md5-order ranks r = 1..n_s and
    * the global schedule orders by pos = r / √n_s — weighted
    * round-robin where a stratum with 4× the docs appears 2× as
    * often (temperature-0.5 mixing, the T5/Pile schedule family).
    * pos is ONE exactly-rounded IEEE division of an exact integer by
    * an exactly-rounded sqrt — bit-identical on any IEEE engine
    * (the sampleMixture determinism argument: no normalizing float
    * SUM anywhere); ties (equal pos across strata) break on
    * (stratum, r).
    *
    * Scale shape: per-stratum ranks are the WindowGroupLimit-prunable
    * pattern; the schedule head is TakeOrderedAndProject (`take`
    * rows through the heap) — never a global sort. A full-epoch
    * schedule at 100 TB would swap the limit for the two-phase
    * range-partitioned rank (the shuffle_global spelling).
    */
  def interleave(df: DataFrame, stratum: Column, id: Column,
                 take: Int = 500): DataFrame = {
    val counts = df.groupBy(stratum.as("s")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(stratum).orderBy(hashKey(id), id)
    val ranked = df.select(stratum.as("source"), id.as("doc_id"))
      .withColumn("r", row_number().over(w).cast("long"))
      .join(broadcast(counts), col("source") <=> col("s"))
      .select(col("source"), col("doc_id"), col("r"),
        (col("r").cast("double") / sqrt(col("n").cast("double"))).as("pos"))
    val head = ranked.orderBy(asc("pos"), asc("source"), asc("r")).limit(take)
    head
      .withColumn("slot", row_number().over(
        Window.orderBy(asc("pos"), asc("source"), asc("r"))).cast("long"))
      .select(col("slot"), col("source"), col("doc_id"), col("r"),
        round(col("pos"), 9).as("pos"))
      .orderBy("slot")
  }

  /** Conservative cross-engine regexes: no \b, no backrefs, no lazy
    * quantifiers — the subset where Java regex (Spark) and RE2
    * (DuckDB) agree byte-for-byte on greedy matching.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "[0-9]{3}-[0-9]{4}"

  /** PII scrubbing (§2c.39): redact email addresses and phone-shaped
    * digit runs from a text column. Pure map-side regexp_replace —
    * codegen'd, no shuffle, embarrassingly parallel; the 100 TB cost
    * is exactly one streaming pass over the text bytes.
    */
  def piiScrub(df: DataFrame, text: Column, id: Column): DataFrame =
    df.select(id.as("doc_id"),
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>").as("scrubbed"))

  /** Per-stratum TOP-FRACTION quality gate (§2c.37b): keep the best
    * keepNum/keepDen of each stratum's docs by quality score — the
    * "keep the top 30% by classifier" curation step, EXACT: the cut
    * is the integer comparison rnk·keepDen ≤ keepNum·n (no float
    * percentile), rank ties broken by doc_id. One exchange on the
    * stratum; both windows (rank + stratum count) share it.
    *
    * Scale note: exact per-stratum ranking sorts each stratum — fine
    * while strata are language/source-sized (bounded count, each
    * internally parallel via range partitioning of the sort). For a
    * quantile-threshold variant that never sorts, cut on
    * approx_percentile (the quantiles_approx sketch path) and accept
    * an ε-approximate boundary.
    */
  def qualityTopPercent(df: DataFrame, text: Column, id: Column,
                        stratum: Column,
                        keepNum: Int = 3, keepDen: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = df.select(stratum.as("stratum"), id.as("doc_id"),
      graft.ops.TextAnalysis.qualityCol(text).as("quality"))
      // unscorable docs (empty text → null ratios) are not "top
      // quality": without this, a stratum that is mostly unscorable
      // would pass nulls through the rank cut as keepers
      .where(col("quality").isNotNull)
    val w = Window.partitionBy("stratum")
      .orderBy(desc_nulls_last("quality"), asc("doc_id"))
    scored
      .select(col("stratum"), col("doc_id"), col("quality"),
        row_number().over(w).cast("long").as("rnk"),
        count(lit(1)).over(Window.partitionBy("stratum")).as("n"))
      .where(col("rnk") * keepDen <= lit(keepNum.toLong) * col("n"))
      .select("stratum", "doc_id", "quality", "rnk")
      .orderBy("stratum", "rnk")
  }

  /** CCNet-style quality BUCKETS (Wenzek et al. 2020): partition each
    * language's docs into head / middle / tail thirds by how
    * corpus-typical their word transitions are — CCNet's
    * LM-perplexity tertiles with the library's deterministic
    * perplexity analog ([[graft.ops.TextAnalysis.bigramNovelty]]:
    * integer-exact mean corpus bigram frequency; an actual LM
    * perplexity would sum per-token double logs in engine-dependent
    * order — unoracleable). High avg frequency = fluent/typical =
    * head, exactly as low perplexity is CCNet's head.
    *
    * The cuts are EXACT integer comparisons (rnk·3 ≤ n, rnk·3 ≤ 2n —
    * the qualityTopPercent protocol; no float percentile), ties by
    * doc_id. Docs with < 2 tokens have no transitions and no bucket
    * (CCNet likewise scores only tokenizable text).
    *
    * Scale shape: the novelty signal's one corpus-count exchange +
    * per-doc reassembly (ReusedExchange, see bigramNovelty), then one
    * stratum exchange shared by the rank and count windows.
    */
  def ccnetBuckets(df: DataFrame, text: Column, id: Column,
                   stratum: Column): DataFrame = {
    val nov = graft.ops.TextAnalysis.bigramNovelty(df, text, id)
      .select("doc_id", "avg_bigram_freq")
    val strat = df.select(id.as("doc_id"), stratum.as("stratum"))
    val w = Window.partitionBy("stratum")
      .orderBy(desc("avg_bigram_freq"), asc("doc_id"))
    nov.join(strat, "doc_id")
      .select(col("stratum"), col("doc_id"), col("avg_bigram_freq"),
        row_number().over(w).cast("long").as("rnk"),
        count(lit(1)).over(Window.partitionBy("stratum")).as("n"))
      .withColumn("bucket",
        when(col("rnk") * 3 <= col("n"), "head")
          .when(col("rnk") * 3 <= col("n") * 2, "middle")
          .otherwise("tail"))
      .select("stratum", "doc_id", "avg_bigram_freq", "rnk", "bucket")
      .orderBy("doc_id")
  }

  /** DSIR-shaped importance scores (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): per-doc
    * log-likelihood ratio between a TARGET slice (`isTarget`, e.g.
    * lang = 'en') and the whole corpus over HASHED word-bigram
    * features — the score importance resampling ranks on. Docs whose
    * bigram distribution looks target-like score > 0.
    *
    * EXACT-ARITHMETIC protocol (the search_bm25 discipline): bucket
    * counts t_b, c_b and totals T, C are exact longs; the smoothed
    * ratio (t_b+½)/(T+½K) ÷ (c_b+½)/(C+½K) clears to the long
    * rational (2t+1)(2C+K) / ((2T+K)(2c+1)) — ONE exact-input IEEE
    * division; its ln is pinned per BUCKET to integer MICRO-units
    * (round(ln·10⁶) as long), so the per-doc score is an exact long
    * sum — order-free — divided once by 10⁶ at the end. (Summing raw
    * per-token doubles would drift cross-engine — the text_bigram_lm
    * lesson.) Products stay exact while (2T+K)·max(2c+1) < 2⁵³
    * (~10¹⁵ corpus bigrams); past that, pre-divide the totals on the
    * driver.
    *
    * Plan shape at scale: bigram hashing is map-only; bucket counts
    * collapse map-side to ≤ nBuckets rows per partition (bounded
    * alphabet — the text_bpe_pairs posture); the weight table is
    * nBuckets rows crossJoin-broadcast; the only data-sized shuffle
    * is the per-doc reassembly groupBy.
    */
  def dsirScores(df: DataFrame, text: Column, id: Column,
                 isTarget: Column, nBuckets: Int = 1024): DataFrame =
    dsirScoreWithWeights(df, text, id,
      dsirWeights(df, text, id, isTarget, nBuckets), nBuckets)

  /** hashed-bigram bucket stream shared by the weight FIT and the
    * scoring pass — one definition, so the two can never drift on
    * tokenization or bucket hashing
    */
  private def dsirBuckets(df: DataFrame, text: Column, id: Column,
                          isTarget: Column, nBuckets: Int): DataFrame = {
    val toks = split(lower(text), " ")
    df.select(id.as("doc_id"), isTarget.as("is_t"),
        explode(graft.functions.TokenOps.wordShingles(toks, 2,
          distinct = false)).as("bg"))
      .select(col("doc_id"), col("is_t"),
        pmod(conv(substring(md5(col("bg")), 1, 15), 16, 10).cast("long"),
          lit(nBuckets.toLong)).as("b"))
  }

  /** the FITTED HALF of [[dsirScores]]: the (bucket → pinned-ln
    * micro-unit weight) table, ≤ nBuckets rows. This is the DSIR
    * artifact a production pipeline fits ONCE per (corpus snapshot,
    * target definition) and serves from storage — the IVF-centroid /
    * Knn-weight build-once lifecycle ([[graft.core.Artifacts]]):
    * at 100 TB the corpus-wide bigram count pass is the expensive
    * step, and re-fitting it per scoring run (what the from-scratch
    * spelling does) is pure waste since the weights only change when
    * the corpus or the target slice does.
    */
  def dsirWeights(df: DataFrame, text: Column, id: Column,
                  isTarget: Column, nBuckets: Int = 1024): DataFrame =
    dsirWeightsFromCounts(
      dsirBucketCounts(df, text, id, isTarget, nBuckets), nBuckets)

  /** the per-row-decomposable HALF of the DSIR fit: exact per-bucket
    * (total, target) bigram counts. Shaped for
    * [[graft.core.SegmentedAgg]] (r13 — the segment-incremental
    * refresh the r12 verdict asked for): the bucket id is an INT
    * group column (the SegmentedAgg contract sums every LongType
    * column), counts are longs, and build(A ∪ B) nets to
    * build(A) ⊎ build(B) under groupBy-sum — so a store ingest
    * refreshes the fit at O(batch), and deletes net via negative
    * partials, never a corpus re-count.
    */
  def dsirBucketCounts(df: DataFrame, text: Column, id: Column,
                       isTarget: Column, nBuckets: Int = 1024): DataFrame =
    dsirBuckets(df, text, id, isTarget, nBuckets)
      .groupBy(col("b").cast("int").as("b")).agg(
        count(lit(1)).as("c"),
        sum(when(col("is_t"), 1L).otherwise(0L)).as("t"))

  /** the weight FORMULA over an (already netted) count table — equal
    * counts give bit-identical weights, so the segment-incremental
    * fit hash-matches the from-scratch one
    */
  def dsirWeightsFromCounts(counts: DataFrame,
                            nBuckets: Int = 1024): DataFrame = {
    val c2 = counts.select(col("b").cast("long").as("b"),
      col("c"), col("t"))
    val tot = c2.agg(sum("c").as("ctot"), sum("t").as("ttot"))
    val k = lit(nBuckets.toLong)
    c2.crossJoin(broadcast(tot)).select(col("b"),
      round(log(
        ((lit(2L) * col("t") + 1L) * (lit(2L) * col("ctot") + k)).cast("double") /
        ((lit(2L) * col("ttot") + k) * (lit(2L) * col("c") + 1L)).cast("double")
      ) * 1e6, 0).cast("long").as("lw"))
  }

  /** the SCORING HALF of [[dsirScores]]: stream the corpus bigrams
    * through a broadcast of an (already fitted) weight table and
    * reassemble per doc — map-only into the one data-sized shuffle
    * (the per-doc groupBy). With persisted weights this is the whole
    * steady-state plan: no corpus-wide count pass, no totals
    * aggregate — the same split as bm25TopKIndexed vs bm25TopK.
    */
  def dsirScoreWithWeights(df: DataFrame, text: Column, id: Column,
                           weights: DataFrame,
                           nBuckets: Int = 1024): DataFrame =
    dsirBuckets(df, text, id, lit(false), nBuckets)
      .join(broadcast(weights), "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum("lw").cast("double") / 1e6, 6).as("logratio"))
      .orderBy("doc_id")

  /** Deterministic in-batch negative sampling (§2c): for each doc,
    * `offsets.size` pseudo-random negatives drawn from the SAME
    * stratum — the contrastive-training data prep (in-batch negatives
    * for retrieval/embedding training) where negatives must come from
    * the same distribution as the anchor and the draw must be
    * replayable (rand() cannot be re-run or oracle-checked; the
    * md5-order position trick is [[shuffleGlobal]]'s, applied per
    * stratum).
    *
    * Rule: docs get positions 0..n−1 in md5-hash order within their
    * stratum; doc at position i pairs with positions (i+off) mod n
    * for each fixed offset — a circulant design, so every doc appears
    * as a negative equally often (balanced usage, no hot negative).
    * Self-pairs (off ≡ 0 mod n in tiny strata) are dropped.
    *
    * Scale shape: two window functions over ONE (stratum, hash-order)
    * sort + a self equi-join on (stratum, position) — no pair blowup,
    * never O(n²); the join keys are uniform by construction (positions
    * are dense), so no skew cap is needed.
    */
  def sampleNegatives(df: DataFrame, stratum: Column, id: Column,
                      offsets: Seq[Int] = Seq(1, 7, 31)): DataFrame = {
    require(offsets.nonEmpty && offsets.forall(_ >= 1))
    val w = Window.partitionBy("stratum").orderBy(col("hk"), col("doc_id"))
    val pos = df.select(stratum.as("stratum"), id.as("doc_id"),
        hashKey(id).as("hk"))
      .select(col("stratum"), col("doc_id"),
        (row_number().over(w) - 1).cast("long").as("pos"),
        count(lit(1)).over(Window.partitionBy("stratum")).as("n"))
    val wanted = pos.select(col("stratum"), col("doc_id"), col("pos"),
        col("n"), explode(array(offsets.map(lit(_)): _*)).as("off"))
      .select(col("stratum"), col("doc_id"), col("off"),
        pmod(col("pos") + col("off"), col("n")).as("neg_pos"), col("pos"))
      .where(col("neg_pos") =!= col("pos"))
    wanted.join(pos.select(col("stratum"), col("pos").as("neg_pos"),
        col("doc_id").as("neg_doc_id")), Seq("stratum", "neg_pos"))
      .select(col("stratum"), col("doc_id"), col("off"), col("neg_doc_id"))
      .orderBy("stratum", "doc_id", "off")
  }
}
