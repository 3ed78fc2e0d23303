package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
      ((num - pmod(num, den)) / den).cast("long")
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
}
