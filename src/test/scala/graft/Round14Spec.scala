package graft

import graft.core.{IndexSpec, Store}
import org.apache.spark.sql.functions._

/** r14 — randomized lifecycle fuzz for the streaming interactive
  * point ops: a SEEDED random sequence of appends/deletes over a
  * store, then every pair-op answer must equal the plan path on
  * random (field,value) pairs. The targeted PointReadSpec
  * interleavings prove the known cases; this sweeps the composed
  * ones (multi-era stores where victim sets straddle segments and
  * both streams merge across eras).
  */
class Round14Spec extends SparkSpec {
  import spark.implicits._

  private def mkDf(ids: Range) =
    ids.map(i => (i.toLong, s"c${i % 7}", s"t${i % 13}", i * 1.5))
      .toDF("id", "cat", "tag", "v")

  test("fuzz: random append/delete lifecycle keeps every point pair op == plan") {
    val spec = IndexSpec(Seq("cat", "tag")).withRowRefs("id")
    val rnd = new scala.util.Random(14L) // seeded — no flaky reruns
    val dir = java.nio.file.Files.createTempDirectory("r14fuzz").toString
    Store.write(mkDf(0 until 120), s"$dir/s", spec)
    var next = 120
    (1 to 5).foreach { _ =>
      if (rnd.nextBoolean()) {
        val n = 40 + rnd.nextInt(80)
        Store.append(mkDf(next until (next + n)), s"$dir/s", spec)
        next += n
      } else {
        val step = 2 + rnd.nextInt(5)
        val off = rnd.nextInt(step)
        Store.delete(spark, s"$dir/s", spec, "id",
          (off until next by step).map(_.toLong).toDF("id"))
      }
    }
    val st = Store.open(spark, s"$dir/s", spec)
    def planRows(f: String, v: String) =
      st.rowsOf(f, v).collect().map(_.getLong(0)).toSet
    val pairs = (1 to 8).map(_ =>
      (s"c${rnd.nextInt(8)}", s"t${rnd.nextInt(14)}")) // incl. absent values
    pairs.foreach { case (cv, tv) =>
      val a = planRows("cat", cv)
      val b = planRows("tag", tv)
      assert(st.fPoint("cat", cv) === a.size.toLong, s"fPoint cat=$cv")
      assert(st.rowsOfPoint("cat", cv).map(_.asInstanceOf[Long]).toSet === a)
      assert(st.fAndPoint("cat", cv, "tag", tv) === (a & b).size.toLong,
        s"fAnd $cv/$tv")
      assert(st.rowsOfAndPoint("cat", cv, "tag", tv)
        .map(_.asInstanceOf[Long]).toSet === (a & b), s"rowsOfAnd $cv/$tv")
      val (and, or, diff, xor) = st.boolCountsPoint("cat", cv, "tag", tv)
      assert((and, or, diff, xor) === ((a & b).size.toLong,
        (a | b).size.toLong, (a -- b).size.toLong,
        ((a | b) -- (a & b)).size.toLong), s"bool $cv/$tv")
      // the f-gate fallback agrees with the streamed answer
      assert(st.fAndPoint("cat", cv, "tag", tv, maxF = 0L) ===
        (a & b).size.toLong, s"gated fAnd $cv/$tv")
      // coStats over the composed store equals the plan's class
      val cs = st.coStatsPoint("cat", cv, "tag", tv)
      val plan = st.frame.coStats(
        st.frame.predicate("cat", cv), st.frame.predicate("tag", tv))
      assert(cs === plan, s"coStats $cv/$tv")
    }
  }

  test("fuzz: knnPoint == Knn.topK across a random lifecycle store") {
    import graft.ops.Knn
    val spec = IndexSpec(Seq("cat", "tag")).withRowRefs("id")
    val rnd = new scala.util.Random(41L)
    val dir = java.nio.file.Files.createTempDirectory("r14knn").toString
    Store.write(mkDf(0 until 150), s"$dir/s", spec)
    Store.append(mkDf(150 until 260), s"$dir/s", spec)
    Store.delete(spark, s"$dir/s", spec, "id",
      (0 until 260 by 3).map(_.toLong).toDF("id"))
    Store.append(mkDf(260 until 320), s"$dir/s", spec)
    val st = Store.open(spark, s"$dir/s", spec)
    // weights fit on the LIVE rows (the plan's own view of the store)
    val live = st.frame.df
    val weights = Knn.keyValueWeights(live, Seq("cat", "tag"),
      col("v") > 200.0)
    weights.coalesce(1).write.mode("overwrite").parquet(s"$dir/w")
    val w = Store.readWeightsDriver(spark, s"$dir/w")
    (1 to 3).foreach { _ =>
      val q = Map("cat" -> s"c${rnd.nextInt(7)}", "tag" -> s"t${rnd.nextInt(13)}")
      val plan = Knn.topK(live, spark.read.parquet(s"$dir/w"),
          Seq("cat", "tag"), q, "id", 7)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val fast = st.knnPoint(w, q, 7)
      assert(fast.isDefined, s"knnPoint ineligible for $q")
      assert(fast.get.map { case (k, d) => (k.asInstanceOf[Long], d) } ===
        plan, s"knnPoint != plan for $q")
    }
  }
}
