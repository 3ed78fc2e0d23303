package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: executes every SparkEntry query end-to-end against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Methodology (each point defends against a way a number can lie):
  *  - queries run through the noop sink (not .count()) so sorts/limits
  *    aren't optimizer-eliminated — measured work == real query work;
  *  - a full warmup pass at the smallest SF absorbs JVM/codegen/
  *    parquet-footer costs (codegen cache is keyed on source, not
  *    data), so timings reflect execution, not JIT;
  *  - per query: best of `reps` runs. Min (not mean) is the
  *    steady-state claim — it is the run least polluted by external
  *    machine contention, and contention is one-sided noise;
  *  - session state (SQL cache + persisted RDDs) is cleared between
  *    queries, so no query is billed for — or subsidized by — another
  *    query's leftover cache blocks;
  *  - an environment SENTINEL (a fixed small aggregation) is timed
  *    before and after the suite; `sentinel_ratio` ≫ 1 means the
  *    machine degraded mid-run and the artifact should be distrusted;
  *  - regressions compare against the per-query MIN across ALL prior
  *    BENCH_r*.json artifacts (not the newest, which may itself be a
  *    contended-run outlier masking real regressions).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def run(name: String, dir: String): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
    // a swallowed exception would masquerade as a FAST query — record
    // it so a failure can never read as a speedup
    def runMeasured(name: String, dir: String): Unit =
      try run(name, dir) catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.take(1).mkString.take(200)
      }

    // drop anything a query persisted or cached so the next
    // measurement starts from a cold session-state (parquet/OS page
    // cache stays warm — that is the steady-state serving condition)
    def clearState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }

    // fixed environment sentinel: small, stable, CPU+shuffle shaped
    def sentinel(): Double = {
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      spark.read.parquet(s"$sfDir/orders.parquet")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)), sum("o_totalprice"))
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    // SPARK_GRAFT_BENCH_ONLY=q1,q2 narrows the suite for iterating on
    // a single operator's cost (the full suite remains the artifact)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))

    // warmup: every query once at the smallest SF (codegen compile)
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir)
      names.foreach { n =>
        try run(n, warmDir) catch { case _: Throwable => () }
        clearState()
      }

    // min-of-3 on BOTH ends: the sentinel detects MACHINE degradation,
    // and a single shot also catches one-off GC pauses / session noise
    // — one-sided noise, the same argument as the per-query min. A
    // genuinely contended machine is slow on all three.
    sentinel() // compile the sentinel itself outside the measurement
    val sentStart = (1 to 3).map(_ => sentinel()).min

    val results = names.map { name =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        runMeasured(name, sfDir)
        val t = (System.nanoTime() - t0) / 1e9
        clearState()
        t
      }
      name -> times.min
    }
    clearState()
    val sentEnd = (1 to 3).map(_ => sentinel()).min
    val sentRatio = if (sentStart > 0) sentEnd / sentStart else 1.0

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum

    // per-query best-known baseline: MIN across prior BENCH_r*.json —
    // but ONLY artifacts that carry the `errors` field (r3+): older
    // artifacts swallowed query failures, so a partially-failed run
    // could be recorded as anomalously fast and permanently ratchet
    // the baseline down into unfixable false-positive regressions
    val prev: Map[String, Double] = {
      // bench_history/ holds this main's OWN prior output lines —
      // complete by construction, unlike the driver artifacts whose
      // tail capture can truncate the head of a long JSON line
      val files = (Option(new java.io.File(".").listFiles()).getOrElse(Array())
        .filter(_.getName.matches("BENCH_r\\d+\\.json")) ++
        Option(new java.io.File("bench_history").listFiles()).getOrElse(Array())
          .filter(_.getName.endsWith(".json")))
      val all = files.toSeq.flatMap { f =>
        val txt = scala.io.Source.fromFile(f).mkString.replace("\\\"", "\"")
        // same-SF artifacts only: a full-suite run against another
        // dataset (e.g. the 3× scaling study) records times that are
        // meaningless as baselines for this one. Artifacts that
        // predate the sf field pass (they were all sf0.1 driver runs).
        val sfOk = !txt.contains("\"sf\":") || txt.contains("\"sf\":\"" + sfDir + "\"")
        // CLEAN artifacts only: runMeasured records a failed rep's
        // (fast) elapsed time into `times`, so any artifact with a
        // non-empty errors map may carry anomalously small per-query
        // entries that would ratchet the min-baseline down into
        // unfixable false regressions — skip the whole artifact
        val errOk = txt.contains("\"errors\":{}")
        if (!errOk || !sfOk) Nil else
        """"queries":\{([^}]*)\}""".r.findFirstMatchIn(txt).toSeq.flatMap {
          _.group(1).split(",").flatMap { kv =>
            kv.split(":") match {
              case Array(k, v) => scala.util.Try(
                k.replace("\"", "").trim -> v.toDouble).toOption
              case _ => None
            }
          }
        }
      }
      all.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
    }
    // flag > 1.5× slowdowns vs best-known (ignoring sub-0.3 s queries,
    // which are dominated by scheduling noise)
    val regressions = results.flatMap { case (k, v) =>
      prev.get(k).filter(p => p >= 0.3 && v > p * 1.5)
        .map(p => "\"" + k + "\":" + math.round(v / p * 100.0) / 100.0)
    }.mkString("{", ",", "}")

    val errJson = errors.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "'") + "\""
    }.mkString("{", ",", "}")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"regressions":$regressions,"reps":$reps,"sentinel_start_sec":$sentStart,"sentinel_end_sec":$sentEnd,"sentinel_ratio":${math.round(sentRatio * 100.0) / 100.0},"sf":"$sfDir"}"""
    println(json)
    // keep a complete local copy for the regression baseline (only
    // full-suite runs: a SPARK_GRAFT_BENCH_ONLY subset would record
    // misleadingly small totals, though per-query mins stay valid)
    if (only.isEmpty) {
      val hist = new java.io.File("bench_history")
      hist.mkdirs()
      val out = new java.io.PrintWriter(
        new java.io.File(hist, s"bench_${System.currentTimeMillis}.json"))
      try out.println(json) finally out.close()
    }
    spark.stop()
  }
}
