package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}

/** SURVEY §2c — LLM-data-pipeline operators over documents/embeddings. */
object LlmOps {

  /** build-once media ingest (the write/open lifecycle applied to
    * synthetic payloads): the encoded payload table is written to a
    * per-sf parquet on first use and read thereafter, so the media
    * queries measure the OPERATOR (sample/decode/resize), not
    * re-synthesis of their input — the same input-is-parquet posture
    * every other query has.
    */
  private def haveParquet(s: SparkSession, dir: String)
                         (build: => DataFrame): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) build.write.mode("overwrite").parquet(dir)
    s.read.parquet(dir)
  }

  private def imagePayloads(s: SparkSession, d: String): DataFrame =
    haveParquet(s, s"/tmp/graft_media_${new java.io.File(d).getName}/images")(
      Multimodal.syntheticImagePayload(Tables.documents(s, d), col("doc_id")))

  private def videoPayloads(s: SparkSession, d: String): DataFrame =
    haveParquet(s, s"/tmp/graft_media_${new java.io.File(d).getName}/videos")(
      Multimodal.syntheticVideoPayload(Tables.documents(s, d), col("doc_id"),
        nFrames = 4))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2c.23 — exact dedup by content hash
    "dedup_exact" -> ((s, d) =>
      Dedup.exact(Tables.documents(s, d), col("text"), col("doc_id"))),

    // §2c.24 — exact n-gram Jaccard near-dup pairs (θ=0.5, w=3)
    "dedup_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccard(Tables.documents(s, d), col("text"), col("doc_id"))),

    // §2c.25 — MinHash+LSH near-dup (rows-only: hash family not SQL)
    "dedup_minhash" -> ((s, d) =>
      Dedup.minhashLsh(Tables.documents(s, d), col("text"), col("doc_id"))),

    // §2c.26 — SimHash fingerprint dup groups (rows-only)
    "dedup_simhash" -> ((s, d) =>
      Dedup.simhashGroups(Tables.documents(s, d), col("text"), col("doc_id"))),

    // §2c.27 — embedding-cosine near-dup pairs (θ=0.4)
    "dedup_embedding" -> ((s, d) =>
      Similarity.cosinePairs(Tables.embeddings(s, d), 0.4)),

    // §2c.28 — brute-force cosine top-k (queries = vec_id < 10, k=5)
    "ann_cosine_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.bruteTopK(e, e.where(col("vec_id") < 10), 5)
        .select(col("qid"), col("rnk").cast("long").as("rnk"),
          col("nbr"), col("cos"))
    }),

    // §2c.28b — brute-force cosine top-k through the CUSTOM per-group
    // top-k operator (graft.plans.TopKPerGroup: bounded k-heaps with
    // map-side partial pruning, no per-group sort) — same semantics
    // and oracle as ann_cosine_topk, different physical plan: the
    // custom LogicalPlan/Strategy/Exec path hash-matches DuckDB.
    "ann_topk_native" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      import graft.functions.VecMath.{vecDot, vecNorm}
      val c = e.select(col("vec_id"), col("embedding"),
        vecNorm(col("embedding")).as("cn"))
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          vecNorm(col("embedding")).as("qn"))
      val scored = c.join(broadcast(q), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("nbr"),
          round(vecDot(col("qv"), col("embedding")) / (col("qn") * col("cn")), 6)
            .as("cos"))
      graft.ops.TopK.perGroup(scored, Seq(col("qid")),
          Seq(desc("cos"), asc("nbr")), 5)
        .select(col("qid"), col("rnk"), col("nbr"), col("cos"))
        .orderBy("qid", "rnk")
    }),

    // §2c.29 — LSH-bucketed approximate top-k (rows-only)
    "ann_lsh_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.lshTopK(e, e.where(col("vec_id") < 10), 5)
    }),

    // §2c.29b — IVF cluster-routed approximate top-k (rows-only).
    // nprobe=5/8: the synthetic embeddings are near-uniform, the
    // worst case for coarse routing (recall@5 = 0.92 in SimilaritySpec);
    // clustered real corpora use nprobe ≪ nlist. The coarse quantizer
    // follows the build-once/reopen lifecycle: centroids are fitted at
    // most once per sf dir, persisted as a tiny parquet, and loaded on
    // every subsequent call — the measured query contains NO k-means.
    "ann_ivf_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val dir = s"/tmp/graft_ivf_${new java.io.File(d).getName}/centroids"
      val cents = Similarity.haveCentroids(s, dir)(Similarity.ivfCentroids(e))
      Similarity.ivfTopK(e, e.where(col("vec_id") < 10), 5, nprobe = 5,
        centroids = Some(cents))
    }),

    // §2c.30 — quality scoring
    "text_quality" -> ((s, d) => {
      val q = TextAnalysis.quality(Tables.documents(s, d), col("text"), col("doc_id"))
      q.select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("n_tokens").cast("long").as("n_tokens"),
          col("alpha_ratio"), col("stop_ratio"), col("quality"))
        .orderBy("doc_id")
    }),

    // §2c.31 — stopword-profile language id
    "text_langid" -> ((s, d) =>
      TextAnalysis.langId(Tables.documents(s, d), col("text"), col("doc_id"))
        .select(col("doc_id"), col("pred_lang"),
          col("score").cast("long").as("score"))
        .orderBy("doc_id")),

    // §2c.32 — token counting (whitespace + BPE-ish regex)
    "text_tokencount" -> ((s, d) =>
      TextAnalysis.tokenCounts(Tables.documents(s, d), col("text"), col("doc_id"))
        .select(col("doc_id"), col("ws_tokens").cast("long").as("ws_tokens"),
          col("re_tokens").cast("long").as("re_tokens"))
        .orderBy("doc_id")),

    // §2c.33 — document fingerprint over sorted distinct token set
    "text_fingerprint" -> ((s, d) =>
      TextAnalysis.fingerprint(Tables.documents(s, d), col("text"), col("doc_id"))
        .orderBy("doc_id")),

    // §2c.25b — near-dup clusters: minhash pairs → symmetrized m-NN
    // pair budget (best pairs = highest estimated Jaccard; the same
    // 100 TB quadratic-pair guard as simhashGroups, spec-checked to
    // preserve cluster membership on the corpus) → min-label
    // connected components (rows-only; iterative)
    "dedup_clusters" -> ((s, d) =>
      Dedup.clusters(Dedup.capPairsPerDoc(
        Dedup.minhashLsh(Tables.documents(s, d), col("text"), col("doc_id")),
        8, -col("est_jaccard")))),

    // §2c.35 — composed curation pipeline: quality-filter → exact
    // dedup (keep representative) → per-language corpus stats. The
    // operators chain as one declarative plan — Catalyst sees through
    // all three stages.
    "pipeline_curate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val q = TextAnalysis.quality(docs, col("text"), col("doc_id"))
        .where(col("quality") >= 0.6).select("doc_id")
      val good = docs.join(q, "doc_id")
      val kept = Dedup.exact(good, col("text"), col("doc_id"))
        .select(col("keep_id").as("doc_id"))
      good.join(kept, "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
        .orderBy("lang")
    }),

    // §2c.30b — Gopher-style repetition quality signals: duplicate-
    // word fraction (map-only) + top-bigram frequency share
    "text_repetition" -> ((s, d) =>
      TextAnalysis.repetition(Tables.documents(s, d), col("text"), col("doc_id"))),

    // §2c.35b — token-budgeted shard packing per source (the step
    // that turns a curated corpus into ~2000-token training shards)
    "pipeline_shards" -> ((s, d) =>
      graft.ops.Sharding.tokenBudgeted(Tables.documents(s, d),
        col("text"), col("doc_id"), col("source"), 2000L)),

    // §2c.33b — rolling-hash (Rabin-Karp, winnowed-min) fingerprint;
    // native codegen'd expression, rows-only check (hash family not
    // SQL-expressible)
    "text_rollinghash" -> ((s, d) =>
      TextAnalysis.rollingFingerprint(Tables.documents(s, d),
        col("text"), col("doc_id"))
        .orderBy("doc_id")),

    // §2c.34b — REAL multimodal decode: deterministic PNGs are encoded
    // in-pipeline (javax.imageio, JDK built-in), then decoded back —
    // true width/height and per-channel pixel means from the actual
    // raster. Because the expected values are pure functions of
    // doc_id, the decode is fully ORACLE-CHECKED (hash match), not a
    // rows-only stub. Batch-shaped typed mapPartitions both ways.
    "multimodal_decode" -> ((s, d) =>
      Multimodal.decodeImages(imagePayloads(s, d))
        .select(col("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          round(col("mean_r"), 6).as("mean_r"),
          round(col("mean_g"), 6).as("mean_g"),
          round(col("mean_b"), 6).as("mean_b"))
        .orderBy("doc_id")),

    // §2c.34c — REAL resize in the middle of the media pipeline:
    // encode → resize (Graphics2D raster scale, re-encoded PNG) →
    // decode. A solid-colour source keeps its channel means under any
    // scaling, and the output dimensions are the requested 8×8 — so
    // the whole chain is hash-oracle-checked.
    "multimodal_resize" -> ((s, d) =>
      Multimodal.decodeImages(Multimodal.resizeImages(imagePayloads(s, d), 8, 8))
        .select(col("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          round(col("mean_r"), 6).as("mean_r"),
          round(col("mean_g"), 6).as("mean_g"),
          round(col("mean_b"), 6).as("mean_b"))
        .orderBy("doc_id")),

    // §2c.34d — REAL frame sampling: 4-frame length-prefixed PNG
    // container per doc → every 2nd frame extracted (others SKIPPED
    // at the byte level, never decoded) → real decode. Frame colour/
    // size are pure functions of (doc_id, frame_idx) → hash-oracled.
    "multimodal_frames" -> ((s, d) =>
      Multimodal.decodeFrames(Multimodal.sampleFrames(videoPayloads(s, d),
          every = 2))
        .select(col("doc_id"), col("frame_idx"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          round(col("mean_r"), 6).as("mean_r"),
          round(col("mean_g"), 6).as("mean_g"),
          round(col("mean_b"), 6).as("mean_b"))
        .orderBy("doc_id", "frame_idx")),

    // §2c.34 — multimodal payload plumbing: metadata projection that
    // never touches payload bytes
    "multimodal_meta" -> ((s, d) =>
      Multimodal.metaOnly(
        Multimodal.asPayload(Tables.documents(s, d), col("text"), col("doc_id")))
        .select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"),
          col("content_md5")))
  )
}
