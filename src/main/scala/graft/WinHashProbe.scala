package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r16 diagnostic: dedup_exact_substring's first stage is ~48 CPU-s —
  * the (doc, p, w=md5(12-token window)) stream build. Decompose the
  * per-window cost (explode | +slice+join | +md5 | xxhash64 instead)
  * so a native window-hash kernel is built only if the declarative
  * md5 chain actually pays for it. Map-only arms (one agg, no
  * exchange of the window stream).
  */
object WinHashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.fallback", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = 12
    def base = graft.ops.Dedup.plantSpanDups(
        graft.core.Tables.documents(spark, sfDir))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(col("toks").isNotNull && size(col("toks")) >= n)
      .select(col("doc_id"),
        explode(sequence(lit(1L), (size(col("toks")) - (n - 1)).cast("long")))
          .as("p"),
        col("toks"))
    def joined = array_join(slice(col("toks"), col("p").cast("int"), lit(n)), " ")
    val arms: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "explode_only" -> (() => base.agg(sum(col("p")))),
      "slice_join" -> (() => base.agg(sum(length(joined)))),
      "md5_full" -> (() => base.agg(sum(length(md5(joined))))),
      "xxh64" -> (() => base.agg(max(xxhash64(joined)))))
    def time(f: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    arms.foreach { case (_, f) => time(f) } // warmup
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (0 until rounds).foreach { r =>
      val rot = arms.drop(r % arms.size) ++ arms.take(r % arms.size)
      rot.foreach { case (nm, f) => samples(nm) = samples(nm) :+ time(f) }
    }
    def med(v: Vector[Double]): Double = v.sorted.apply(v.size / 2)
    def r2(x: Double) = math.round(x * 100.0) / 100.0
    println(s"""{"study":"winhash","sf":"$sfDir","rounds":$rounds,""" +
      arms.map { case (nm, _) => s""""$nm":${r2(med(samples(nm)))}""" }
        .mkString(",") +
      s""","samples":{${arms.map { case (nm, _) => "\"" + nm + "\":[" +
        samples(nm).map(r2).mkString(",") + "]" }.mkString(",")}}}""")
    spark.stop()
  }
}
