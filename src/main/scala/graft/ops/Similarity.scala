package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    v.as("x").join(v.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        round(vecDot(col("x.embedding"), col("y.embedding")) /
          (col("x.nrm") * col("y.nrm")), 6).as("cos"))
      .where(col("cos") >= minCos)
      .orderBy("a", "b")
  }

  /** brute-force cosine top-k per query vector (§2c.28): broadcast
    * the query side, rank per query. k·|Q| output rows.
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
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("nbr"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .orderBy("qid", "rnk")
  }

  /** IVF (inverted-file) ANN — the cluster-routed scale path: a
    * coarse k-means quantizer assigns every corpus vector to one of
    * `nlist` centroid lists; a query probes its `nprobe` nearest
    * centroids and scores only those lists (~nprobe/nlist of the
    * corpus). At 100 TB: fit the quantizer on a sample, broadcast the
    * centroid matrix (nlist·dim floats), and the corpus assignment is
    * a map-only pass; the candidate join shuffles on the small
    * (qid, list) key space.
    */
  def ivfTopK(emb: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 8, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val feats = emb.withColumn("features",
      array_to_vector(col("embedding").cast("array<double>")))
    val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(10)
      .fit(feats)

    // corpus: top-1 list assignment via the model (map-only)
    val corpus = model.transform(feats)
      .select(col("vec_id").as("nbr"), col("embedding").as("nbr_v"),
        graft.functions.VecMath.vecNorm(col("embedding")).as("nbr_n"),
        col("prediction").as("list"))

    // queries: rank ALL centroids by L2 and keep nprobe per query
    val spark = emb.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toSeq.toDF("list", "cvec")
    val probed = queries
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        graft.functions.VecMath.vecNorm(col("embedding")).as("qn"))
      .crossJoin(broadcast(centroids))
      .withColumn("dist",
        -graft.functions.VecMath.vecDot(col("qv"), col("cvec")) * 2 +
          graft.functions.VecMath.vecDot(col("cvec"), col("cvec")))
      .withColumn("crnk", row_number().over(
        Window.partitionBy("qid").orderBy(asc("dist"), asc("list"))))
      .where(col("crnk") <= nprobe)
      .select("qid", "qv", "qn", "list")

    // score only the probed lists
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("nbr"))
    corpus.join(probed, Seq("list"))
      .where(col("nbr") =!= col("qid"))
      .select(col("qid"), col("nbr"),
        round(graft.functions.VecMath.vecDot(col("qv"), col("nbr_v")) /
          (col("qn") * col("nbr_n")), 6).as("cos"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
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
    */
  def lshTopK(emb: DataFrame, queries: DataFrame, k: Int,
              dim: Int = 64, nbits: Int = 16, bands: Int = 8): DataFrame = {
    // Band width r = nbits/bands sets the recall/cost tradeoff: a
    // band collides with prob (1-θ/π)^r, and ≥1-of-bands must hit.
    // Corpora whose true neighbors sit at wide angles (cos ~0.3-0.5,
    // like the synthetic test embeddings) need narrow bands (r=2);
    // tightly-clustered corpora can afford r=8 with far fewer
    // candidates. At 100 TB, raise nbits and bands together so bucket
    // cardinality (2^r per band) keeps candidate sets ≪ n.
    val r = nbits / bands
    val mask = (1L << r) - 1
    def banded(df: DataFrame, idCol: String): DataFrame = {
      val sig = hyperplaneSig(col("embedding"), dim, nbits)
      df.select(col("vec_id").as(idCol), col("embedding").as(s"${idCol}_v"),
          graft.functions.VecMath.vecNorm(col("embedding")).as(s"${idCol}_n"),
          sig.as("sig"))
        .select(col(idCol), col(s"${idCol}_v"), col(s"${idCol}_n"),
          posexplode(array((0 until bands).map(b =>
            shiftright(col("sig"), b * r).bitwiseAND(mask)): _*))
            .as(Seq("band", "bucket")))
    }
    val c = banded(emb, "nbr")
    val q = banded(queries, "qid")
    val cand = c.join(broadcast(q),
        c("band") === q("band") && c("bucket") === q("bucket") &&
        col("nbr") =!= col("qid"))
      .select(col("qid"), col("nbr"), col("qid_v"), col("nbr_v"),
        col("qid_n"), col("nbr_n"))
      .dropDuplicates("qid", "nbr")
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("nbr"))
    cand.select(col("qid"), col("nbr"),
        round(graft.functions.VecMath.vecDot(col("qid_v"), col("nbr_v")) /
          (col("qid_n") * col("nbr_n")), 6).as("cos"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .orderBy("qid", "rnk")
  }
}
