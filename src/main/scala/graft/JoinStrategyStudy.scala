package graft

import org.apache.spark.sql.SparkSession

/** r16: QueryStageProbe showed dedup_exact_substring is CPU-bound with
  * ~37 CPU-s in the window self-join stage — dominated by the
  * SortMergeJoin's two per-partition sorts of the 128-bit window-hash
  * stream. Guide §3.1: a shuffled hash join skips the sorts when the
  * per-partition build side fits. Same-JVM A/B of
  *
  *   - smj    : session default (preferSortMergeJoin=true)
  *   - shj    : spark.sql.join.preferSortMergeJoin=false
  *   - aqeshj : AQE maxShuffledHashJoinLocalMapThreshold=64m
  *              (runtime SMJ→SHJ rewrite — the scale-safe spelling:
  *              only fires when every post-shuffle partition is small)
  *
  * over the ExactSubstr family + control; confs are reset after each
  * arm. Join strategy cannot change values (exact-integer plans,
  * equi-joins) — the oracle re-gates end-to-end regardless.
  */
object JoinStrategyStudy {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.fallback", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def clearState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    val queries = Seq("dedup_exact_substring", "dedup_substring_mod",
      "dedup_est_eval", "basket_pairs")
    val modes: Seq[(String, () => Unit, () => Unit)] = Seq(
      ("smj", () => (), () => ()),
      ("shj",
        () => spark.conf.set("spark.sql.join.preferSortMergeJoin", "false"),
        () => spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")),
      ("aqeshj",
        () => spark.conf.set(
          "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m"),
        () => spark.conf.set(
          "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "0")))
    def run(q: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      val t = (System.nanoTime() - t0) / 1e9
      clearState()
      t
    }
    // warmup every (query, mode)
    modes.foreach { case (_, on, off) =>
      on(); queries.foreach(run); off()
    }
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (0 until rounds).foreach { r =>
      // rotate mode order per round so no mode always pays the debt
      val ms = modes.drop(r % modes.size) ++ modes.take(r % modes.size)
      ms.foreach { case (m, on, off) =>
        on()
        queries.foreach { q => samples(s"$q/$m") = samples(s"$q/$m") :+ run(q) }
        off()
      }
    }
    def med(v: Vector[Double]): Double = v.sorted.apply(v.size / 2)
    def r2(x: Double) = math.round(x * 100.0) / 100.0
    println(s"""{"study":"join_strategy","sf":"$sfDir","rounds":$rounds,""" +
      queries.flatMap(q => modes.map { case (m, _, _) =>
        s""""${q}_$m":${r2(med(samples(s"$q/$m")))}""" }).mkString(",") +
      s""","samples":{${samples.toSeq.sortBy(_._1).map { case (k, v) =>
        "\"" + k + "\":[" + v.map(r2).mkString(",") + "]" }.mkString(",")}}}""")
    spark.stop()
  }
}
