package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY §2c.27-29).
  *
  * Scale posture: the brute-force path broadcasts the (small) query
  * set against the corpus — a map-side join with per-partition
  * partial top-k, no n² shuffle. The LSH path buckets both sides on
  * random-hyperplane signatures so candidate generation is an
  * equi-join on bucket keys. Dot products are `zip_with` +
  * `aggregate` column expressions (codegen'd, stays in whole-stage
  * codegen; floats widened to double before multiply so engines
  * agree bit-for-bit on each product).
  */
object Similarity {
  import graft.functions.VecMath.{vecDot, vecNorm}

  /** Σ aᵢ·bᵢ in double (codegen'd Catalyst expression) */
  def dot(a: Column, b: Column): Column = vecDot(a, b)

  def norm(a: Column): Column = vecNorm(a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** embedding-cosine near-dup pairs ≥ threshold (§2c.27).
    * Exact quadratic verify — intended as the small-N baseline and
    * the verifier behind [[lshTopK]]; the scale path is LSH buckets.
    * Norms are hoisted out of the pair loop: computed once per
    * vector, so each pair costs one codegen'd dot.
    */
  def cosinePairs(emb: DataFrame, minCos: Double): DataFrame = {
    val v = emb.select(col("vec_id"), col("embedding"),
      vecNorm(col("embedding")).as("nrm"))
    val rawCos = vecDot(col("x.embedding"), col("y.embedding")) /
      (col("x.nrm") * col("y.nrm"))
    // The reported (and oracle-compared) value is round(cos, 6), but
    // Spark's double round() goes through BigDecimal — evaluating it
    // per PAIR costs an allocation for each of the n²/2 candidates.
    // The join condition therefore ANDs a cheap RAW-cosine prefilter
    // (threshold relaxed by 1e-6 — a strict superset of
    // round(x,6) >= minCos under any rounding mode) BEFORE the exact
    // round()-based test: codegen'd AND short-circuits, so BigDecimal
    // runs only for the rare boundary survivors. Spelled inside the
    // join condition (not a post-join .where) on purpose — Catalyst
    // would push a post-join filter back in FRONT of the cheap
    // conjunct and re-instate the per-pair BigDecimal.
    v.as("x").join(v.as("y"),
        col("x.vec_id") < col("y.vec_id") &&
        rawCos >= minCos - 1e-6 &&
        round(rawCos, 6) >= minCos)
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        round(rawCos, 6).as("cos"))
      .orderBy("a", "b")
  }

  /** LSH-bucketed embedding near-dup PAIRS (§2c.27, scale path) — the
    * pair-enumeration sibling of [[lshTopK]], built from the same
    * pieces the shingle family proved out: [[hyperplaneSig]] banding,
    * a (band,bucket) equi-self-join, the count-window skew cap that
    * shares the join's hashpartitioning (one exchange, ReusedExchange),
    * and exact-cosine verification ONLY within shared buckets. Never
    * forms the all-pairs space: candidate volume is
    * Σ_band Σ_bucket c²/2 ≈ bands · n²/2 · p_collide, and with r =
    * nbits/bands sign bits per band a random pair collides with
    * probability ~2^-r while a cos≥θ pair collides with
    * (1−arccos θ/π)^r per band.
    *
    * The honest operating envelope, stated rather than hidden: banding
    * prunes only when θ is a genuine NEAR-DUP threshold. A pair at
    * cos 0.97 survives r=8 bands with p≈0.54 each (recall ≥0.99 over
    * 8 bands) while background near-orthogonal pairs collide at 2^-8 —
    * a ~30× candidate cut that widens with r. At a wide-angle
    * threshold like cos 0.4 the per-bit agreement ratio between true
    * and background pairs is only 0.63/0.5, so NO hyperplane banding
    * prunes — and the output itself is a constant fraction of all n²/2
    * pairs, so no algorithm enumerates it subquadratically. That
    * regime belongs to [[cosinePairs]] (the declared exact baseline
    * and this operator's spec-side verifier, like ngramJaccard is for
    * minhashLsh); THIS operator is the 100 TB shape for dedup-grade
    * thresholds.
    *
    * Reference analog: the whole point of the reference's index is
    * that no query scans all pairs (Dfs.scala:330-408).
    */
  /** the width-r band key of a signature's b-th band — ONE definition
    * for both LSH consumers (pairs + top-k), so their bucketing can
    * never drift
    */
  private def bandKey(sig: Column, b: Int, r: Int): Column =
    shiftrightunsigned(sig, b * r).bitwiseAND((1L << r) - 1)

  /** band width = nbits/bands, validated: bands > nbits makes r = 0
    * (mask 0 → every vector in one bucket → the "prune" degenerates
    * to the full pair space), and a non-divisor silently discards the
    * high signature bits
    */
  private def bandWidth(nbits: Int, bands: Int): Int = {
    require(bands > 0 && nbits >= bands && nbits % bands == 0,
      s"bands ($bands) must divide nbits ($nbits)")
    nbits / bands
  }

  def lshCosinePairs(emb: DataFrame, minCos: Double,
                     dim: Int = 64, nbits: Int = 64, bands: Int = 8,
                     maxBucket: Long = 10000L): DataFrame =
    lshCosinePairsImpl(emb, minCos, nbits, bands, maxBucket,
      hyperplaneSig(_, dim, nbits))

  /** [[lshCosinePairs]] over the [[md5PlaneSign]] portable plane
    * family — the ann_lsh_topk_portable posture applied to PAIR
    * enumeration: identical pipeline shape and physical plan
    * (map-only codegen'd signature, skew-capped (band,bucket)
    * self-join, exact-cosine verify in-join), but the ±1 planes
    * derive from md5("bit:i") parity so a DuckDB mirror re-derives
    * them from its own md5 and the WHOLE near-dup pair route —
    * signatures, banding, bucket cap, candidate join, verification —
    * hash-checks end-to-end cross-engine. Production default remains
    * [[lshCosinePairs]] (splitmix planes); pair with
    * [[plantNearDupsPortable]] so the planted phenomenon is
    * re-derivable too.
    */
  def lshCosinePairsPortable(emb: DataFrame, minCos: Double,
                             dim: Int = 64, nbits: Int = 64, bands: Int = 8,
                             maxBucket: Long = 10000L): DataFrame =
    lshCosinePairsImpl(emb, minCos, nbits, bands, maxBucket,
      md5HyperplaneSig(_, dim, nbits))

  private def lshCosinePairsImpl(emb: DataFrame, minCos: Double,
                                 nbits: Int, bands: Int, maxBucket: Long,
                                 sig: Column => Column): DataFrame = {
    val r = bandWidth(nbits, bands)
    val v = emb.select(col("vec_id"), col("embedding"),
      vecNorm(col("embedding")).as("nrm"),
      sig(col("embedding")).as("sig"))
    val bandKeys = array((0 until bands).map(b =>
      bandKey(col("sig"), b, r)): _*)
    // bucket skew cap via [[Skew.dropHotKeys]] (exchange default /
    // grouped / window — see Skew's tradeoff note) — the minhashLsh /
    // simhashPairsOf pattern verbatim; the signature build is a
    // map-only codegen'd kernel feeding the one (band,bucket) shuffle
    val banded = Skew.dropHotKeys(
      v.select(col("vec_id"), col("embedding"), col("nrm"),
        posexplode(bandKeys).as(Seq("band", "bucket"))),
      Seq("band", "bucket"), maxBucket)
    // exact-cosine verify INSIDE the join condition, before the
    // pair-dedup shuffle: same cheap-raw-prefilter + round(…,6)
    // discipline as cosinePairs (see the BigDecimal note there), so
    // the survivors are bit-identical to the exact baseline's — this
    // operator can only MISS pairs (bucket recall), never invent or
    // re-score them: precision is exactly 1.0 by construction.
    val rawCos = vecDot(col("x.embedding"), col("y.embedding")) /
      (col("x.nrm") * col("y.nrm"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") &&
        col("x.bucket") === col("y.bucket") &&
        col("x.vec_id") < col("y.vec_id") &&
        rawCos >= minCos - 1e-6 &&
        round(rawCos, 6) >= minCos)
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        round(rawCos, 6).as("cos"))
      .dropDuplicates("a", "b")
      .orderBy("a", "b")
  }

  /** Deterministically plant near-duplicate vectors: for every source
    * vector with `vec_id % every == 0`, append a copy at
    * `vec_id + offset` jittered by ±`eps` per dimension (sign from
    * splitmix64 of (vec_id, dim) — reproducible, no RNG state). On the
    * unit-norm synthetic embeddings ±0.03 across 64 dims lands the
    * copy at cos ≈ 0.97 to its source — a realistic near-dup. The
    * synthetic corpus has NO high-cosine pairs (max pairwise cos is
    * 0.51), so near-dup queries plant their own phenomenon, the same
    * move pii_scrub makes for PII; both the approximate operator and
    * its exact verifier see the SAME augmented frame.
    */
  def plantNearDups(emb: DataFrame, every: Int = 10,
                    offset: Long = 1000000L, eps: Double = 0.03): DataFrame = {
    // jitter sign via the Spark-native xxhash64 (codegen'd): ±eps by
    // hash parity of (vec_id, dim). transform's lambda index is the
    // only per-element hook; this runs over n/every rows only.
    val jittered = transform(col("embedding"), (x, i) =>
      (x.cast("double") +
        when(pmod(xxhash64(col("vec_id"), i), lit(2)) === 0, lit(eps))
          .otherwise(lit(-eps))).cast("float"))
    // withColumn (not select) so any side columns the table carries
    // (e.g. the synthetic table's `label`) ride along unchanged
    emb.unionByName(
      emb.where(col("vec_id") % every === 0)
        .withColumn("vec_id", col("vec_id") + offset)
        .withColumn("embedding", jittered))
  }

  /** ENGINE-PORTABLE twin of [[plantNearDups]]: jitter sign from md5
    * parity of "vec_id:dim" (1-based dim) instead of xxhash64, so a
    * DuckDB mirror re-derives the IDENTICAL planted vectors from its
    * own md5 — ±eps is an exact double add onto the exact
    * float→double widening, and the float cast rounds identically in
    * both engines, so the augmented frame is bit-equal cross-engine.
    */
  def plantNearDupsPortable(emb: DataFrame, every: Int = 10,
                            offset: Long = 1000000L,
                            eps: Double = 0.03): DataFrame = {
    val jittered = transform(col("embedding"), (x, i) => {
      val par = pmod(
        conv(substring(md5(concat(col("vec_id").cast("string"), lit(":"),
          (i + 1).cast("string"))), 1, 15), 16, 10).cast("long"), lit(2L))
      (x.cast("double") +
        when(par === 0, lit(eps)).otherwise(lit(-eps))).cast("float")
    })
    emb.unionByName(
      emb.where(col("vec_id") % every === 0)
        .withColumn("vec_id", col("vec_id") + offset)
        .withColumn("embedding", jittered))
  }

  /** brute-force cosine top-k per query vector (§2c.28): broadcast
    * the query side, rank per query. k·|Q| output rows. Ranking runs
    * through the custom bounded-heap operator ([[TopK.perGroup]]) —
    * no per-group sort, candidates pruned to k map-side before the
    * shuffle (spec-checked equal to the window row_number spelling).
    */
  def bruteTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = emb.select(col("vec_id"), col("embedding"),
      vecNorm(col("embedding")).as("cn"))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"),
      vecNorm(col("embedding")).as("qn"))
    val scored = c.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nbr"),
        round(vecDot(col("qv"), col("embedding")) / (col("qn") * col("cn")), 6)
          .as("cos"))
    TopK.perGroup(scored, Seq(col("qid")), Seq(desc("cos"), asc("nbr")), k)
      .orderBy("qid", "rnk")
  }

  /** Fit the IVF coarse quantizer on a SAMPLE of the corpus — never
    * the full data (at 100 TB a full-corpus k-means fit is a
    * multi-pass ML job per query; a 0.1-1% sample gives centroids of
    * the same quality for coarse routing). The result is nlist·dim
    * floats — driver-sized; persist it once (e.g. as a tiny parquet
    * via [[graft.core.Store]]) and pass it to every [[ivfTopK]] call.
    */
  def ivfCentroids(emb: DataFrame, nlist: Int = 8,
                   sampleFraction: Double = 0.25,
                   seed: Long = 42L): Array[Array[Float]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feats = emb.sample(withReplacement = false, sampleFraction, seed)
      .withColumn("features",
        array_to_vector(col("embedding").cast("array<double>")))
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10)
      .fit(feats)
    model.clusterCenters.map(_.toArray.map(_.toFloat))
  }

  /** Persist fitted centroids as a tiny parquet — the reference's
    * build-once / reopen index lifecycle (Dfs.scala:489-554:
    * writeIndexedDf / openIndexedDf / haveIndexedDf) applied to the
    * IVF coarse quantizer: fit ONCE, store, and every subsequent
    * query loads nlist·dim floats instead of re-running k-means.
    */
  def saveCentroids(spark: org.apache.spark.sql.SparkSession, dir: String,
                    cents: Array[Array[Float]]): Unit = {
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("list_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** reopen persisted centroids. The collect is driver-sized BY
    * DESIGN: centroids are nlist·dim floats that ride into the query
    * plan as literals (see [[ivfTopK]]) — this is index metadata, not
    * data.
    */
  def loadCentroids(spark: org.apache.spark.sql.SparkSession,
                    dir: String): Array[Array[Float]] =
    graft.core.Artifacts.readParquet(spark, dir).orderBy("list_id")
      .collect().map(_.getAs[Seq[Float]]("centroid").toArray)

  /** load-if-present else fit+save (the haveIndexedDf analog): the
    * k-means fit runs at most once per store dir; steady-state queries
    * never contain a fit.
    */
  def haveCentroids(spark: org.apache.spark.sql.SparkSession, dir: String)
                   (fit: => Array[Array[Float]]): Array[Array[Float]] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // completeness = the _SUCCESS marker, not the dir (a fit that died
    // mid-save must rebuild over its partial dir, not crash-loop on it)
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS")))
      saveCentroids(spark, dir, fit)
    loadCentroids(spark, dir)
  }

  /** ENGINE-PORTABLE coarse centroids: the `nlist` corpus vectors
    * with the smallest ids, verbatim — no k-means, no RNG, so an
    * independent engine re-derives the IDENTICAL quantizer from the
    * data itself (`SELECT embedding FROM embeddings ORDER BY vec_id
    * LIMIT nlist`). Routing quality is whatever those vectors give
    * (production uses [[ivfCentroids]]); the point is that the whole
    * IVF route — assignment argmin, probe ranking, list scan, exact
    * rerank — becomes recomputable outside Spark and hash-checkable
    * end-to-end. Driver-bounded: nlist·dim floats, same class as the
    * fitted centroids.
    */
  def leadingCentroids(emb: DataFrame, nlist: Int = 8): Array[Array[Float]] =
    emb.orderBy("vec_id").limit(nlist).select("embedding")
      .collect().map(_.getAs[Seq[Float]]("embedding").toArray)

  /** IVF (inverted-file) ANN — the cluster-routed scale path: a
    * coarse k-means quantizer (fit on a sample, [[ivfCentroids]])
    * assigns every corpus vector to its nearest of `nlist` centroids;
    * a query probes its `nprobe` nearest centroids and scores only
    * those lists (~nprobe/nlist of the corpus).
    *
    * Plan shape at scale: centroids ride along as LITERAL arrays, so
    * corpus assignment is a map-only pass (argmin over nlist codegen'd
    * dots — no ML transform, no shuffle); query probing is an
    * array_sort over the same nlist structs (no window); the candidate
    * join broadcasts the probed query side. The only shuffle is the
    * per-qid top-k over the already-pruned candidates.
    */
  def ivfTopK(emb: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 8, nprobe: Int = 4,
              centroids: Option[Array[Array[Float]]] = None,
              sampleFraction: Double = 0.25): DataFrame = {
    val cents = centroids.getOrElse(ivfCentroids(emb, nlist, sampleFraction))
    ivfServe(ivfCodes(emb, cents, cluster = false), queries, k, nprobe, cents)
  }

  /** frozen-quantizer corpus CODES — the per-row-decomposable encode
    * half of [[ivfTopK]] (assignment is map-only given the centroids,
    * so build(A ∪ B) == build(A) ∪ build(B)): this is the
    * `buildFor` of a [[graft.core.SegmentedArtifact]] "ivf_codes"
    * family, the FAISS add-to-index posture — an ingest batch is
    * ENCODED with the existing quantizer (O(batch)), never a corpus
    * re-fit; the quantizer refreshes on compact's own O(corpus)
    * cadence if at all. `cluster = true` range-clusters the codes on
    * `list` so a persisted artifact's parquet stats prune a probe to
    * the probed lists' files.
    */
  def ivfCodes(emb: DataFrame, cents: Array[Array[Float]],
               cluster: Boolean = true): DataFrame = {
    val coded = emb.select(col("vec_id"), col("embedding"),
      graft.functions.VecMath.vecNorm(col("embedding")).as("vnorm"),
      array_min(coarseDistStructs(cents)(col("embedding")))
        .getField("list").as("list"))
    if (cluster)
      coded.repartitionByRange(col("list"), col("vec_id"))
        .sortWithinPartitions("list", "vec_id")
    else coded
  }

  /** the IVF serve tail over a codes table (vec_id, embedding, vnorm,
    * list) — shared by the inline and artifact-served spellings so
    * equal codes give identical results
    */
  def ivfServe(codes: DataFrame, queries: DataFrame, k: Int,
               nprobe: Int, cents: Array[Array[Float]]): DataFrame = {
    val corpus = codes.select(col("vec_id").as("nbr"),
      col("embedding").as("nbr_v"), col("vnorm").as("nbr_n"), col("list"))

    // queries: nprobe nearest centroids via array_sort + slice (map-only)
    val probed = queries
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        graft.functions.VecMath.vecNorm(col("embedding")).as("qn"),
        explode(slice(sort_array(coarseDistStructs(cents)(col("embedding"))),
          1, nprobe)).as("probe"))
      .select(col("qid"), col("qv"), col("qn"), col("probe.list").as("list"))

    // score only the probed lists; query side broadcast; rank via the
    // custom bounded-heap top-k (no per-group sort)
    val scored = corpus.join(broadcast(probed), Seq("list"))
      .where(col("nbr") =!= col("qid"))
      .select(col("qid"), col("nbr"),
        round(graft.functions.VecMath.vecDot(col("qv"), col("nbr_v")) /
          (col("qn") * col("nbr_n")), 6).as("cos"))
    TopK.perGroup(scored, Seq(col("qid")), Seq(desc("cos"), asc("nbr")), k)
      .orderBy("qid", "rnk")
  }

  /** random-hyperplane signature (Charikar 2002 SimHash for cosine):
    * nbits sign bits of projections onto fixed pseudo-random planes.
    * Plane components are a deterministic ±1 pattern derived from
    * (bit, dim) so the signature is reproducible with no RNG state.
    */
  def hyperplaneSig(v: Column, dim: Int, nbits: Int): Column = {
    def sign(bit: Int, d: Int): Double = {
      // splitmix64 of (bit, d) → ±1
      var z = bit.toLong * 0x9e3779b97f4a7c15L + d.toLong * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      if (((z ^ (z >>> 31)) & 1L) == 0L) 1.0 else -1.0
    }
    val planes = Array.tabulate(nbits * dim)(i => sign(i / dim, i % dim))
    graft.functions.VecMath.vecLshSig(v, planes, nbits, dim)
  }

  /** LSH-bucketed approximate top-k (§2c.29, scale path): candidates
    * = corpus vectors sharing any of the `bands` signature bands with
    * the query; exact cosine + rank only on candidates.
    *
    * `multiProbe` (Lv et al. 2007, multi-probe LSH): the QUERY side
    * additionally probes each band's buckets at hamming distance 1
    * (per-bit flips of the band key) — recovering the near-misses a
    * wider band would lose without expanding the corpus side at all.
    * Probing multiplies only the broadcast query rows (×(1+r·p/r)),
    * letting a deployment run NARROWER bands (larger r ⇒ 2^r buckets
    * ⇒ far fewer candidates per bucket) at the same recall.
    */
  def lshTopK(emb: DataFrame, queries: DataFrame, k: Int,
              dim: Int = 64, nbits: Int = 16, bands: Int = 8,
              multiProbe: Int = 0): DataFrame =
    lshTopKImpl(emb, queries, k, nbits, bands, multiProbe,
      hyperplaneSig(_, dim, nbits))

  /** md5-derived ±1 plane sign — the ENGINE-PORTABLE hyperplane
    * family (the [[graft.ops.Dedup.minhashLshPortable]] posture
    * applied to ANN): sign(bit, i) for the 1-based vector component i
    * is +1 iff the top-60-bit value of md5("bit:i") is even. DuckDB
    * derives the identical plane from its own md5:
    * `('0x' || substr(md5(bit || ':' || i), 1, 15))::BIGINT % 2 = 0`
    * — no RNG state, no interpolated constants, so the whole LSH
    * route (signatures → band buckets → candidate shortlist → exact
    * rerank) is recomputable outside Spark and hash-checks end-to-end
    * against an independent engine.
    */
  def md5PlaneSign(bit: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$bit:$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2 == 0) 1.0
    else -1.0
  }

  /** [[hyperplaneSig]] with the md5-derived portable planes — same
    * codegen'd kernel ([[graft.functions.VecMath.vecLshSig]]), only
    * the ±1 pattern differs.
    */
  def md5HyperplaneSig(v: Column, dim: Int, nbits: Int): Column = {
    val planes =
      Array.tabulate(nbits * dim)(i => md5PlaneSign(i / dim, i % dim + 1))
    graft.functions.VecMath.vecLshSig(v, planes, nbits, dim)
  }

  /** [[lshTopK]] over the [[md5PlaneSign]] portable plane family —
    * identical pipeline shape and physical plan (signature map-only,
    * banded bucket join with broadcast query side, exact-cosine
    * rerank through the bounded-heap top-k), hash-oracled END-TO-END
    * against a DuckDB SQL mirror that re-derives the planes from its
    * own md5. Production default remains [[lshTopK]] (splitmix planes
    * — one 64-bit mix vs an md5 per plane cell at plan-build time);
    * this twin is the cross-engine evidence for the family's banding
    * + shortlist + rerank route, and the variant a deployment uses
    * when signatures must be recomputable outside Spark.
    */
  def lshTopKPortable(emb: DataFrame, queries: DataFrame, k: Int,
                      dim: Int = 64, nbits: Int = 16,
                      bands: Int = 8): DataFrame =
    lshTopKImpl(emb, queries, k, nbits, bands, 0,
      md5HyperplaneSig(_, dim, nbits))

  private def lshTopKImpl(emb: DataFrame, queries: DataFrame, k: Int,
                          nbits: Int, bands: Int, multiProbe: Int,
                          sigOf: Column => Column): DataFrame = {
    // Band width r = nbits/bands sets the recall/cost tradeoff: a
    // band collides with prob (1-θ/π)^r, and ≥1-of-bands must hit.
    // Corpora whose true neighbors sit at wide angles (cos ~0.3-0.5,
    // like the synthetic test embeddings) need narrow bands (r=2);
    // tightly-clustered corpora can afford r=8 with far fewer
    // candidates. At 100 TB, raise nbits and bands together so bucket
    // cardinality (2^r per band) keeps candidate sets ≪ n, and use
    // multiProbe to claw back the recall narrower bands cost.
    val r = bandWidth(nbits, bands)
    def banded(df: DataFrame, idCol: String, probes: Int): DataFrame = {
      val sig = sigOf(col("embedding"))
      val bandBuckets = (0 until bands).flatMap { b =>
        val base = bandKey(col("sig"), b, r)
        // probe buckets = the band key plus its `probes` 1-bit flips
        (struct(lit(b).as("band"), base.as("bucket")) +:
          (0 until math.min(probes, r)).map(j =>
            struct(lit(b).as("band"),
              base.bitwiseXOR(1L << j).as("bucket"))))
      }
      df.select(col("vec_id").as(idCol), col("embedding").as(s"${idCol}_v"),
          graft.functions.VecMath.vecNorm(col("embedding")).as(s"${idCol}_n"),
          sig.as("sig"))
        .select(col(idCol), col(s"${idCol}_v"), col(s"${idCol}_n"),
          explode(array(bandBuckets: _*)).as("bb"))
        .select(col(idCol), col(s"${idCol}_v"), col(s"${idCol}_n"),
          col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    }
    val c = banded(emb, "nbr", 0)           // corpus never expands
    val q = banded(queries, "qid", multiProbe)
    val cand = c.join(broadcast(q),
        c("band") === q("band") && c("bucket") === q("bucket") &&
        col("nbr") =!= col("qid"))
      .select(col("qid"), col("nbr"), col("qid_v"), col("nbr_v"),
        col("qid_n"), col("nbr_n"))
      .dropDuplicates("qid", "nbr")
    val scored = cand.select(col("qid"), col("nbr"),
      round(graft.functions.VecMath.vecDot(col("qid_v"), col("nbr_v")) /
        (col("qid_n") * col("nbr_n")), 6).as("cos"))
    TopK.perGroup(scored, Seq(col("qid")), Seq(desc("cos"), asc("nbr")), k)
      .orderBy("qid", "rnk")
  }

  // -------------------------------------------------------------------
  // Product quantization (Jégou/Douze/Schmid 2011, "Product
  // Quantization for Nearest Neighbor Search") — the byte-compressed
  // ANN path: each vector is reduced to ONE packed long of sub-space
  // code indices, so a 100 TB float corpus becomes a ~3 TB codes table
  // that an ADC (asymmetric-distance) scan reads at 8 B/row.

  /** unit-normalize an embedding in one codegen'd loop
    * ([[graft.functions.VecUnit]] — bit-identical to the staged
    * transform spelling it replaces, which was CodegenFallback:
    * interpreted per element on every encode-path row): on the unit
    * sphere L2 order equals cosine order (d² = 2 − 2·cos), which is
    * what lets a PQ L2 scan answer a COSINE top-k.
    */
  private def unitized(df: DataFrame, v: String): DataFrame =
    df.withColumn(v, graft.functions.VecMath.vecUnit(col(v)))

  /** Fit the m per-subspace codebooks on a SAMPLE of the corpus (the
    * [[ivfCentroids]] posture: fitting is an offline, once-per-corpus
    * job; queries never contain a fit). Vectors are unit-normalized
    * first — see [[unitized]]. Result is m·ks·(dim/m) floats —
    * driver-sized index metadata.
    */
  def pqCodebooks(emb: DataFrame, m: Int = 16, ks: Int = 16,
                  sampleFraction: Double = 0.25,
                  seed: Long = 42L): Array[Array[Array[Float]]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val sample = unitized(
      emb.sample(withReplacement = false, sampleFraction, seed)
        .select(col("embedding").as("e")), "e")
    // persist across the m fits: KMeans caches only its own converted
    // RDD, so an unpersisted sample would re-scan and re-unitize the
    // source parquet once per subspace (m+1 reads); released in the
    // finally, so the fit leaves no session cache state behind
    sample.persist()
    try {
      val dims = sample.select(size(col("e"))).head(1)
      require(dims.nonEmpty,
        s"PQ codebook sample is empty — raise sampleFraction ($sampleFraction)")
      val dim = dims(0).getInt(0)
      require(m > 0 && dim % m == 0, s"dim $dim must split into m=$m subspaces")
      val sub = dim / m
      (0 until m).map { j =>
        val feats = sample.withColumn("features",
          array_to_vector(slice(col("e"), j * sub + 1, sub).cast("array<double>")))
        new KMeans().setK(ks).setSeed(seed + j).setMaxIter(10)
          .fit(feats).clusterCenters.map(_.toArray.map(_.toFloat))
      }.toArray
    } finally sample.unpersist()
  }

  /** ENGINE-PORTABLE PQ codebooks (the [[leadingCentroids]] posture
    * applied to sub-quantizers): entry (j, c) is subspace j of the
    * UNITIZED (c+1)-th corpus vector by id — no k-means, no RNG, so
    * an independent engine re-derives the identical codebooks from
    * the data. Unitization repeats [[unitized]]'s arithmetic exactly
    * (ordered double dot → sqrt → max(·,1e-30) → double divide →
    * float cast) so the driver-built books match what the engine
    * would compute. Driver-bounded: ks·dim floats.
    */
  /** driver-side twin of [[unitized]]'s per-vector arithmetic —
    * ordered double dot → sqrt → max(·,1e-30) → double divide →
    * float cast — so driver-built portable artifacts match what the
    * engine computes bit-for-bit.
    */
  private def driverUnit(v: Array[Float]): Array[Float] = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
    val n = math.max(math.sqrt(s), 1e-30)
    v.map(x => (x.toDouble / n).toFloat)
  }

  private def leadingUnitVectors(emb: DataFrame,
                                 n: Int): Array[Array[Float]] =
    emb.orderBy("vec_id").limit(n).select("embedding")
      .collect().map(r => driverUnit(r.getAs[Seq[Float]]("embedding").toArray))

  /** [[leadingCentroids]] in UNIT geometry — the portable coarse
    * quantizer for the IVF-PQ composition, whose routing happens on
    * unitized vectors ([[ivfPqCentroids]] posture).
    */
  def leadingUnitCentroids(emb: DataFrame, nlist: Int = 8): Array[Array[Float]] =
    leadingUnitVectors(emb, nlist)

  def leadingPqCodebooks(emb: DataFrame, m: Int = 16,
                         ks: Int = 16): Array[Array[Array[Float]]] = {
    val unit = leadingUnitVectors(emb, ks)
    val dim = unit.headOption.map(_.length).getOrElse(0)
    require(dim > 0 && dim % m == 0, s"dim $dim must split into m=$m subspaces")
    val sub = dim / m
    Array.tabulate(m)(j =>
      Array.tabulate(ks)(c => unit(c).slice(j * sub, j * sub + sub)))
  }

  /** persist/reopen/fit-once lifecycle for PQ codebooks — flat
    * (subspace, code, centroid) rows, the [[saveCentroids]] pattern.
    */
  def savePqCodebooks(spark: org.apache.spark.sql.SparkSession, dir: String,
                      books: Array[Array[Array[Float]]]): Unit = {
    import spark.implicits._
    books.zipWithIndex.flatMap { case (b, j) =>
      b.zipWithIndex.map { case (c, i) => (j, i, c.toSeq) }
    }.toSeq.toDF("subspace", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  def loadPqCodebooks(spark: org.apache.spark.sql.SparkSession,
                      dir: String): Array[Array[Array[Float]]] =
    graft.core.Artifacts.readParquet(spark, dir)
      .orderBy("subspace", "code").collect()
      .groupBy(_.getInt(0)).toArray.sortBy(_._1)
      .map(_._2.sortBy(_.getInt(1))
        .map(_.getAs[Seq[Float]]("centroid").toArray))

  def havePqCodebooks(spark: org.apache.spark.sql.SparkSession, dir: String)
                     (fit: => Array[Array[Array[Float]]]): Array[Array[Array[Float]]] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // completeness = the _SUCCESS marker, not the dir (a fit that died
    // mid-save must rebuild over its partial dir, not crash-loop on it)
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS")))
      savePqCodebooks(spark, dir, fit)
    loadPqCodebooks(spark, dir)
  }

  /** bits per code index = ⌈log2(max codebook size)⌉ */
  private def pqBits(books: Array[Array[Array[Float]]]): Int = {
    val maxKs = books.map(_.length).max
    var b = 1; while ((1 << b) < maxKs) b += 1
    b
  }

  /** Encode a vector as ONE packed long: subspace j's nearest-centroid
    * index in bits [j·bits, (j+1)·bits). Map-only codegen'd argmin per
    * subspace (the [[ivfTopK]] distStructs pattern); with the default
    * m=16, ks=16 a 64-dim float vector (256 B) packs into 8 B — 32×.
    * The per-centroid c·c constant is folded in as a literal, so each
    * candidate costs one codegen'd sub-vector dot.
    */
  /** c·c − 2·s·c with c·c folded to a literal — the SHARED distance
    * spelling of the encode and query sides (the [[ivfTopK]]
    * distStructs trick: the dropped ‖s‖² is constant per (row,
    * subspace), so argmin/ranking match true sub-space L2). One
    * definition so the two sides can never drift.
    */
  private def centApproxDist(s: Column, cent: Array[Float]): Column = {
    val cc = cent.map(x => x.toDouble * x.toDouble).sum
    lit(cc) - vecDot(s, typedlit(cent.toSeq)) * 2
  }

  /** (approx-L2, list) structs over the coarse centroids — the shared
    * routing expression of [[ivfTopK]] and the IVF-PQ ops; argmin =
    * `array_min`, probe set = `array_sort` + `slice` (all codegen'd,
    * no window, no shuffle).
    */
  private def coarseDistStructs(cents: Array[Array[Float]])(v: Column): Column =
    array(cents.indices.map { i =>
      struct(centApproxDist(v, cents(i)).as("d"), lit(i).as("list"))
    }: _*)

  def pqEncode(v: Column, books: Array[Array[Array[Float]]]): Column = {
    val m = books.length
    val bits = pqBits(books)
    require(m * bits <= 64, s"m=$m × $bits bits exceeds one long")
    // ONE generated argmin loop ([[graft.functions.PqEncode]]). The
    // previous m·ks unrolled struct/array_min tree generated a
    // processNext() janino rejected ("Code grows beyond 64 KB") —
    // Spark silently interpreted the encode stage (r13 verdict #1).
    // Identical arithmetic and tie rule — codes unchanged.
    graft.functions.VecMath.pqEncode(v, books, bits)
  }

  /** per-query ADC distance tables: dtabs[j][c] = [[centApproxDist]];
    * the dropped ‖q_j‖² terms sum to the per-query constant ‖q‖², so
    * Σ_j dtabs[j][code_j] ranks candidates exactly as squared L2 does.
    */
  private def pqDistTables(qv: Column,
                           books: Array[Array[Array[Float]]]): Column =
    // ONE generated 3-level loop ([[graft.functions.PqDistTables]]) —
    // the unrolled m·ks centApproxDist array-of-arrays was the other
    // half of the 64 KB codegen blowup (see [[pqEncode]]).
    graft.functions.VecMath.pqDistTables(qv, books)

  /** Σ_j dtabs[j][code_j] — ONE generated subspace loop
    * ([[graft.functions.PqAdc]]). The previous m-wide unrolled
    * element_at spelling exceeded janino's compile limits: Spark
    * logged `ERROR CodeGenerator`, disabled whole-stage codegen for
    * the ADC scan stage, and interpreted the family's hottest per-row
    * arithmetic. Same j-ascending double fold — hashes unchanged.
    */
  private def adcScore(code: Column, dtabs: Column,
                       m: Int, bits: Int): Column =
    graft.functions.VecMath.pqAdc(code, dtabs, m, bits)

  /** PQ ANN top-k: ADC scan of the packed-codes table → per-query
    * shortlist → EXACT cosine rerank of the shortlist (the standard
    * production shape: PQ compresses the scan, the rerank restores
    * accuracy on |Q|·shortlist rows).
    *
    * Plan shape at scale: the encode is a map-only pass (in a real
    * deployment the codes table is persisted once at ingest and the
    * scan reads 8 B/row instead of 256 B raw vectors); query dist
    * tables ride in the broadcast query side (m·ks doubles each); the
    * rerank re-touches the corpus only through a broadcast semi-join
    * on the shortlist ids. The only shuffles are the two bounded-heap
    * top-k passes.
    */
  /** the corpus side of [[pqTopK]] as its own step: (vec_id, code)
    * rows, 8 B of payload each. In a deployment this runs ONCE at
    * ingest and persists — queries then scan the codes table, never
    * the raw vectors (that is the entire point of PQ at 100 TB).
    */
  def pqCodeTable(emb: DataFrame,
                  books: Array[Array[Array[Float]]]): DataFrame =
    // encode on UNIT vectors (codebooks were fit on unit vectors):
    // ADC then ranks by 2−2cos, i.e. by cosine
    unitized(emb.select(col("vec_id"), col("embedding")), "embedding")
      .select(col("vec_id"), pqEncode(col("embedding"), books).as("code"))

  def pqTopK(emb: DataFrame, queries: DataFrame, k: Int,
             books: Array[Array[Array[Float]]],
             shortlist: Int = 80,
             codeTable: Option[DataFrame] = None): DataFrame = {
    val m = books.length
    val bits = pqBits(books)
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val codes = codeTable.getOrElse(pqCodeTable(emb, books))
      .select(col("vec_id").as("nbr"), col("code"))
    val q = unitized(queries.select(col("vec_id").as("qid"),
        col("embedding")), "embedding")
      .select(col("qid"), pqDistTables(col("embedding"), books).as("dtabs"))
    val adc = codes.join(broadcast(q), col("nbr") =!= col("qid"))
      .select(col("qid"), col("nbr"),
        adcScore(col("code"), col("dtabs"), m, bits).as("adc"))
    val short = TopK.perGroup(adc, Seq(col("qid")),
        Seq(asc("adc"), asc("nbr")), shortlist)
      .select("qid", "nbr")
    exactRerank(emb, queries, short, k)
  }

  /** exact cosine rerank of a (qid, nbr) shortlist: raw vectors are
    * re-touched ONLY through broadcast joins on the (|Q|·shortlist)-row
    * shortlist — a map-only pass over the corpus, then the bounded-heap
    * top-k. Shared tail of [[pqTopK]] and [[ivfPqTopK]].
    */
  private def exactRerank(emb: DataFrame, queries: DataFrame,
                          short: DataFrame, k: Int): DataFrame = {
    val qside = queries.select(col("vec_id").as("qid"),
      col("embedding").as("qv"), vecNorm(col("embedding")).as("qn"))
    val scored = emb.select(col("vec_id").as("nbr"),
        col("embedding").as("nbr_v"), vecNorm(col("embedding")).as("nbr_n"))
      .join(broadcast(short), Seq("nbr"))
      .join(broadcast(qside), Seq("qid"))
      .select(col("qid"), col("nbr"),
        round(vecDot(col("qv"), col("nbr_v")) / (col("qn") * col("nbr_n")), 6)
          .as("cos"))
    TopK.perGroup(scored, Seq(col("qid")), Seq(desc("cos"), asc("nbr")), k)
      .orderBy("qid", "rnk")
  }

  /** coarse quantizer for IVF-PQ: k-means over UNIT vectors, so
    * routing happens in the same geometry the PQ codes live in.
    */
  def ivfPqCentroids(emb: DataFrame, nlist: Int = 8,
                     sampleFraction: Double = 0.25,
                     seed: Long = 42L): Array[Array[Float]] =
    ivfCentroids(unitized(emb.select(col("vec_id"), col("embedding")),
      "embedding"), nlist, sampleFraction, seed)

  /** the IVF-PQ ingest artifact: (vec_id, list, code) — the coarse
    * list id stored WITH the 8-byte PQ code, so a query scans only
    * its probed lists' codes and never the raw vectors. This is the
    * FAISS IVF-PQ deployment shape: at 100 TB the codes table is
    * ~1/32 the corpus and the probed fraction ~nprobe/nlist of THAT.
    */
  def ivfPqCodeTable(emb: DataFrame, cents: Array[Array[Float]],
                     books: Array[Array[Array[Float]]]): DataFrame =
    unitized(emb.select(col("vec_id"), col("embedding")), "embedding")
      .select(col("vec_id"),
        array_min(coarseDistStructs(cents)(col("embedding")))
          .getField("list").as("list"),
        pqEncode(col("embedding"), books).as("code"))

  /** IVF-PQ ANN top-k: coarse routing bounds WHICH codes are scanned
    * (nprobe/nlist of the corpus), PQ bounds the BYTES per scanned row
    * (8), the exact rerank restores accuracy — the three bounding
    * mechanisms compose multiplicatively and each is the same operator
    * it is standalone ([[ivfTopK]] routing / [[pqTopK]] ADC+rerank).
    */
  def ivfPqTopK(emb: DataFrame, queries: DataFrame, k: Int,
                cents: Array[Array[Float]],
                books: Array[Array[Array[Float]]],
                nprobe: Int = 5, shortlist: Int = 80,
                codeTable: Option[DataFrame] = None): DataFrame = {
    val m = books.length
    val bits = pqBits(books)
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val codes = codeTable.getOrElse(ivfPqCodeTable(emb, cents, books))
    val q = unitized(queries.select(col("vec_id").as("qid"),
        col("embedding")), "embedding")
      .select(col("qid"), pqDistTables(col("embedding"), books).as("dtabs"),
        explode(slice(sort_array(coarseDistStructs(cents)(col("embedding"))),
          1, nprobe)).as("probe"))
      .select(col("qid"), col("dtabs"), col("probe.list").as("list"))
    val adc = codes.join(broadcast(q), Seq("list"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nbr"),
        adcScore(col("code"), col("dtabs"), m, bits).as("adc"))
    val short = TopK.perGroup(adc, Seq(col("qid")),
        Seq(asc("adc"), asc("nbr")), shortlist)
      .select("qid", "nbr")
    exactRerank(emb, queries, short, k)
  }

  /** per-(group, dimension) embedding statistics — the centroid/
    * moment computation behind domain clustering and drift monitoring.
    * FLAT (grp, dim, n, mean, mean_sq) rows rather than assembled
    * centroid arrays: flat rows hash-oracle cleanly, aggregate with
    * map-side partial combine on one (grp, dim) shuffle, and
    * reassemble into vectors trivially when a consumer wants them.
    */
  def groupStats(emb: DataFrame, grp: Column): DataFrame =
    emb.select(grp.as("grp"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("grp"), col("dim"), col("x").cast("double").as("x"))
      .groupBy("grp", "dim")
      .agg(count(lit(1)).as("n"),
        round(avg(col("x")), 6).as("mean"),
        round(avg(col("x") * col("x")), 6).as("mean_sq"))
      .orderBy("grp", "dim")

  /** SemDeDup (Abbas et al. 2023) — CLUSTER-SCOPED semantic dedup,
    * the embedding-space analog of the minhash keep/drop pass: assign
    * every vector to its nearest coarse centroid (the IVF map-only
    * argmin, [[ivfTopK]]'s corpus half), then WITHIN each cluster
    * drop any vector whose cosine to an earlier-id clustermate is
    * ≥ `minCos` (keep-lowest-id — the deterministic spelling of the
    * paper's keep-one-per-ε-ball; `dup_of` names the earliest such
    * mate, −1 for kept rows).
    *
    * This is the published SCALE recipe for semantic dedup — the
    * clustering exists precisely to bound the pair space: pairs form
    * only within a list (per-list quadratic, never corpus-quadratic),
    * and nlist grows with the corpus to hold list sizes constant.
    * The price, as published: near-dups straddling a cluster
    * boundary are missed (the spec measures planted-pair recall).
    *
    * Plan shape: assignment is map-only (centroids are literals — no
    * shuffle); ONE shuffle on `list` feeds the within-list self-join
    * (u < v) with the codegen'd exact-cosine verify in-join; the
    * dropped set groupBy's on v (min dup_of) and left-joins back.
    */
  def semDedup(emb: DataFrame, minCos: Double = 0.9, nlist: Int = 8,
               centroids: Option[Array[Array[Float]]] = None): DataFrame = {
    val cents = centroids.getOrElse(leadingCentroids(emb, nlist))
    val assigned = emb.select(col("vec_id"), col("embedding"),
      vecNorm(col("embedding")).as("nn"),
      array_min(coarseDistStructs(cents)(col("embedding")))
        .getField("list").as("list"))
    val a = assigned.select(col("list"), col("vec_id").as("u"),
      col("embedding").as("uv"), col("nn").as("un"))
    val b = assigned.select(col("list"), col("vec_id").as("v"),
      col("embedding").as("vv"), col("nn").as("vn"))
    val dups = a.join(b, Seq("list"))
      .where(col("u") < col("v") &&
        round(vecDot(col("uv"), col("vv")) / (col("un") * col("vn")), 6)
          >= minCos)
      .groupBy(col("v")).agg(min(col("u")).as("dup_of"))
    assigned.join(dups, assigned("vec_id") === dups("v"), "left")
      .select(col("vec_id"), col("list"),
        col("dup_of").isNull.as("kept"),
        coalesce(col("dup_of"), lit(-1L)).as("dup_of"))
      .orderBy("vec_id")
  }

  /** ANN index-quality evaluation (§2c.29h) — the measurement a
    * pipeline runs before trusting an approximate index at scale:
    * per query, recall@k of the [[lshTopKPortable]] shortlist against
    * the [[bruteTopK]] ground truth, plus the reciprocal-rank
    * numerator (the approx rank at which the TRUE nearest neighbor
    * appears; 0 = missed entirely — MRR's per-query term as an exact
    * integer, no division). Both routes are deterministic and
    * engine-portable, so the whole evaluation — approximate route,
    * exact route, and their comparison — hash-checks against a DuckDB
    * mirror: the evaluator itself is oracled, not just the indexes.
    *
    * Scale shape: the ground-truth side is the expensive half
    * (brute-force over the corpus), but an evaluation runs on a
    * bounded QUERY SAMPLE (here: the probe set), so corpus size only
    * enters linearly — the same posture as the recall gates inside
    * SimilaritySpec, now exposed as an operator.
    */
  def recallEval(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val approx = lshTopKPortable(emb, queries, k)
      .select(col("qid"), col("nbr"), col("rnk").cast("long").as("rnk"))
    val exact = bruteTopK(emb, queries, k)
      .select(col("qid"), col("nbr"), col("rnk"))
    val hits = exact.select("qid", "nbr")
      .join(approx.select("qid", "nbr"), Seq("qid", "nbr"), "left_semi")
      .groupBy("qid").agg(count(lit(1)).as("hits"))
    val top1 = exact.where(col("rnk") === 1)
      .select(col("qid"), col("nbr"))
      .join(approx, Seq("qid", "nbr"), "left")
      .select(col("qid"), coalesce(col("rnk"), lit(0L)).as("rank_top1"))
    queries.select(col("vec_id").as("qid"))
      .join(hits, Seq("qid"), "left")
      .join(top1, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("hits"), lit(0L)).as("hits"),
        lit(k.toLong).as("k"),
        coalesce(col("rank_top1"), lit(0L)).as("rank_top1"))
      .orderBy("qid")
  }
}
