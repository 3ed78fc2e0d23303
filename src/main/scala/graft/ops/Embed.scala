package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._

/** Embedding storage transforms — the step between "embeddings
  * computed" and "embeddings served" in a training/retrieval stack.
  *
  * [[quantizeInt8]] is symmetric per-vector max-abs int8 quantization
  * (the standard faiss/SQ8-style storage codec: 4× smaller than
  * float32, dot products within ~1% for unit-norm vectors). Done in
  * EXACT integer micro arithmetic (SURVEY §6): components round once
  * to long micros, the per-vector scale is the max |component|, and
  * each code is round-half-up((x · 127) / scale) computed as the
  * floored integer ((254·x + s) div 2s) — no floating point, so the
  * DuckDB mirror hashes identically. Codes are summarized by an
  * md5 over the canonical comma-joined code string (portable across
  * engines; raw array columns stringify differently per engine).
  *
  * Scale shape: map-only — one pass, no shuffle, no state; the plan
  * any 100 TB re-encode job wants. The PQ codec in
  * [[Similarity]] is the trained sibling (codebooks); this one is
  * training-free and per-vector exact.
  */
object Embed {

  def quantizeInt8(df: DataFrame, vec: Column, id: Column): DataFrame = {
    val vm = transform(vec, x => round(x.cast("double") * 1e6, 0).cast("long"))
    val s = aggregate(col("v"), lit(0L),
      (acc, e) => greatest(acc, abs(e)))
    // round-half-up((x*127)/s) as a floored integer division:
    // (254·x + s) div 2s, with div floored portably via pmod
    def codes(sc: Column): Column = transform(col("v"), x => {
      val num = x * 254L + sc
      val den = sc * 2L
      floorDiv(num, den).cast("long")
    })
    df.select(id.as("vec_id"), vm.as("v"))
      .select(col("vec_id"), s.as("scale_micro"), col("v"))
      .select(col("vec_id"), col("scale_micro"),
        when(col("scale_micro") === 0L,
          transform(col("v"), _ => lit(0L)))
          .otherwise(codes(col("scale_micro"))).as("q"))
      .select(col("vec_id"), col("scale_micro"),
        size(filter(col("q"), c => c =!= 0L)).cast("long").as("n_nonzero"),
        aggregate(col("q"), lit(0L), (a, e) => a + abs(e)).as("sum_abs"),
        md5(array_join(col("q"), ",")).as("code_md5"))
      .orderBy("vec_id")
  }

  /** floored integer division for a possibly-negative numerator and
    * positive denominator, spelled portably: `num div den` truncates
    * toward zero in Spark but floors in DuckDB; subtracting the
    * positive modulus first makes the numerator exactly divisible,
    * so both agree (the k-means/quantize identity, SURVEY §6).
    * The division itself is Catalyst's INTEGRAL `div` (long→long) —
    * Column `/` is double division, which past 2^53 can be off by
    * one on exactly-divisible longs (the gram sums here reach ~1e16
    * and power-iteration vectors ~3e17), silently breaking the
    * bit-identical-to-DuckDB contract.
    */
  private def floorDiv(num: Column, den: Column): Column = {
    val exact = num - pmod(num, den)
    GraftShims.column(new IntegralDivide(
      GraftShims.expression(exact), GraftShims.expression(den)))
  }

  /** Top principal component of the embedding corpus by POWER
    * ITERATION on the (uncentered-scale, integer) Gram matrix — the
    * dominant-direction probe behind embedding-drift dashboards and
    * whitening/PCA preprocessing, and the repo's third ITERATIVE ML
    * operator with a full cross-engine hash oracle (after k-means
    * and PageRank).
    *
    * Exact integer protocol (SURVEY §6): components round once to
    * long micros; per-dim means are floored integer division; the
    * centered Gram matrix S[i][j] = Σ_v c_i·c_j is an exact long sum,
    * then scaled down once (div 1e6, floored portably) to keep the
    * iteration inside long range. Each power step is u = S'·w
    * followed by renormalization to max |u| = 1e6 via floored
    * division — no square roots, no floating point, so an unrolled
    * DuckDB mirror hashes identically. The all-ones start vector
    * makes the sign deterministic.
    *
    * Scale shape: the ONLY corpus-sized work is the Gram pass — one
    * self equi-join of the (vec_id, dim, c) rows on vec_id (map-side
    * d² blowup per vector, collapsed by partial aggregation to d²
    * rows per partition before the exchange). Everything after is
    * d² = 4096 rows: the iteration joins S' (4096 rows) to w (d
    * rows) — both broadcast-sized at ANY corpus size, so adding
    * vectors only grows the one Gram pass, which is embarrassingly
    * parallel. At ≥10⁸ vectors the Gram sums would move to
    * DECIMAL(38) (long holds |c|≤2e6 squared × 1e8 rows = 4e20 —
    * past 9.2e18); documented, not routed, at this SF.
    */
  def pcaPower(df: DataFrame, vec: Column, id: Column,
               iterations: Int = 3,
               checkpointGram: Boolean = true): DataFrame = {
    // checkpointGram=false is a DIAGNOSTIC seam (PcaStudy r15): it
    // re-plans the Gram pass inside every iteration instead of
    // reusing the materialized 4096 rows — never the production
    // shape, only the A/B arm that tests whether localCheckpoint
    // itself is implicated in the r12-r14 drift
    require(iterations >= 1)
    val vm = df.select(id.as("vec_id"),
        posexplode(transform(vec,
          x => round(x.cast("double") * 1e6, 0).cast("long")))
          .as(Seq("dim", "v")))
    val mean = vm.groupBy("dim")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .select(col("dim"), floorDiv(col("s"), col("n")).cast("long").as("mu"))
    val cent = vm.join(mean, "dim")
      .select(col("vec_id"), col("dim"), (col("v") - col("mu")).as("c"))
    val gram = cent.as("p").join(cent.as("q"), "vec_id")
      .groupBy(col("p.dim").as("i"), col("q.dim").as("j"))
      .agg(sum(col("p.c") * col("q.c")).as("s"))
      .select(col("i"), col("j"),
        floorDiv(col("s"), lit(1000000L)).cast("long").as("s"))
    val gramCk =
      if (checkpointGram) gram.localCheckpoint() // built once; reused
      else gram
    val w0 = mean.select(col("dim"), lit(1000000L).as("w"))
    val wT = (1 to iterations).foldLeft(w0) { (w, _) =>
      val u = gramCk.join(w, gramCk("j") === w("dim"))
        .groupBy(col("i")).agg(sum(col("s") * col("w")).as("u"))
      val m = u.agg(max(abs(col("u"))).as("m"))
      // renormalize to ~1e6 magnitude WITHOUT forming u·1e6 (which
      // would overflow long at u ~ 3e17): divide by the down-scaled
      // max. m < 1e6 (incl. the degenerate all-zero u) passes u
      // through — already in range.
      u.crossJoin(broadcast(m))
        .select(col("i").as("dim"),
          when(col("m") < 1000000L, col("u"))
            .otherwise(floorDiv(col("u"),
              floorDiv(col("m"), lit(1000000L)).cast("long")))
            .cast("long").as("w"))
    }
    wT.select(col("dim").cast("long").as("dim"), col("w").as("w_micro"))
      .orderBy("dim")
  }
}
