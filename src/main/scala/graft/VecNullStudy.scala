package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-epoch paired A/B of VecUnit's per-element null branch (the
  * r12 ANN bench-drift watch item): the SAME vector data is run
  * through the kernel twice in one JVM —
  *   - typed containsNull=false (an `array(...)` of non-null columns
  *     → VecUnit's STATIC no-null loop, the r11 shape), and
  *   - the identical rows read back from parquet (file sources force
  *     containsNull=true → the r12 null-checking loop).
  * Both sides localCheckpoint first so neither pays its producer.
  * A VecDot pass rides along as the no-branch control (VecDot never
  * had a null branch — if IT drifts between epochs, the drift is the
  * host, not any kernel).
  */
object VecNullStudy {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val dim = 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.VecMath.{vecDot, vecUnit}

    // +/* only: % and - over bigint type as NULLABLE in Spark (the
    // div-by-zero rule), which would flip the array containsNull and
    // defeat the static-path side of the A/B
    val vexpr = (0 until dim)
      .map(i => s"CAST(id * 31 + $i AS FLOAT)")
      .mkString("array(", ", ", ")")
    // cache() (not localCheckpoint — that round-trips an RDD and
    // forces containsNull=true) so neither timed pass pays its
    // producer while the static types survive
    val dense = spark.range(n).selectExpr("id", s"$vexpr AS v").cache()
    dense.count()
    val dir = java.nio.file.Files.createTempDirectory("vecnull").toString
    dense.write.mode("overwrite").parquet(dir)
    val nullable = spark.read.parquet(dir).cache()
    nullable.count()
    require(!dense.schema("v").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull)
    require(nullable.schema("v").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull)

    def best(reps: Int)(body: => Unit): Double = {
      var b = Double.MaxValue
      (0 until reps).foreach { _ =>
        val t0 = System.nanoTime()
        body
        b = math.min(b, (System.nanoTime() - t0) / 1e6)
      }
      b
    }
    def unitPass(df: org.apache.spark.sql.DataFrame): Unit =
      df.select(vecUnit(col("v")).as("u"))
        .select(sum(element_at(col("u"), 1))).head()
    def dotPass(df: org.apache.spark.sql.DataFrame): Unit =
      df.select(sum(vecDot(col("v"), col("v")))).head()

    unitPass(dense); unitPass(nullable) // JIT warm both codegen paths
    val uDense = best(5)(unitPass(dense))
    val uNullable = best(5)(unitPass(nullable))
    val dDense = best(5)(dotPass(dense))
    val dNullable = best(5)(dotPass(nullable))
    println(s"""{"study":"vecnull","rows":$n,"dim":$dim,""" +
      s""""unit_static_ms":${math.round(uDense)},""" +
      s""""unit_nullbranch_ms":${math.round(uNullable)},""" +
      s""""unit_branch_ratio":${math.round(uNullable / uDense * 100.0) / 100.0},""" +
      s""""dot_dense_ms":${math.round(dDense)},""" +
      s""""dot_nullable_ms":${math.round(dNullable)},""" +
      s""""dot_control_ratio":${math.round(dNullable / dDense * 100.0) / 100.0}}""")
    spark.stop()
  }
}
