package graft

import graft.core.CoStats
import graft.ops.{AsOf, Salt}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** deterministic sampling from a Gen (no scalatest-scalacheck bridge
  * in the offline cache): fixed seeds -> reproducible cases
  */
object GenCases {
  def apply[A](g: Gen[A], n: Int, seed: Long = 42L): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))
}

/** Property-based checks for the operators whose edge cases are
  * easiest to get wrong: as-of matching, salted aggregation
  * equivalence, CoStats probability invariants.
  */
class CoStatsPropertySpec extends AnyFunSuite {

  private val countsGen: Gen[(Long, Long, Long, Long)] = for {
    n <- Gen.choose(1L, 100000L)
    fa <- Gen.choose(0L, n)
    fb <- Gen.choose(0L, n)
    fab <- Gen.choose(math.max(0L, fa + fb - n), math.min(fa, fb))
  } yield (n, fa, fb, fab)

  test("state probabilities are in (0,1) and sum to ~1") {
    GenCases(countsGen, 200).foreach { case (n, fa, fb, fab) =>
      val cs = CoStats(n, fa, fb, fab)
      val ps = (0 until 4).map(cs.p)
      assert(ps.forall(p => p > 0 && p < 1), (n, fa, fb, fab))
      assert(math.abs(ps.sum - 1.0) < 0.05, (n, fa, fb, fab))
    }
  }

  test("naive probabilities sum to exactly 1 and lifts are positive") {
    GenCases(countsGen, 200).foreach { case (n, fa, fb, fab) =>
      val cs = CoStats(n, fa, fb, fab)
      assert(math.abs((0 until 4).map(cs.naiveP).sum - 1.0) < 1e-9, (n, fa, fb, fab))
      assert((0 until 4).forall(s => cs.d(s) > 0), (n, fa, fb, fab))
    }
  }
}

class OperatorPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[List[(Long, String, Double)]] =
    Gen.listOfN(60, for {
      id <- Gen.choose(0L, 1000L)
      k <- Gen.oneOf("a", "b", "c", "d")
      v <- Gen.choose(-100, 100).map(_ / 4.0)
    } yield (id, k, v))

  test("salted aggregation equals plain groupBy for arbitrary data") {
    GenCases(rowsGen, 5).foreach { rows =>
      if (rows.nonEmpty) {
        val df = rows.toDF("id", "k", "v")
        val salted = Salt.saltedAgg(df, col("k"),
            col("v").cast("decimal(18,2)"), col("id"))
          .select(col("k"), col("n"), col("total").cast("double"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
        val plain = df.groupBy(col("k"))
          .agg(count(lit(1)).as("n"),
            sum(col("v").cast("decimal(18,2)")).cast("double").as("total"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
        assert(salted === plain)
      }
    }
  }

  private val asofGen: Gen[(List[(Long, String, Int)], List[(String, Int, Double)])] =
    for {
      lefts <- Gen.listOfN(25, for {
        id <- Gen.choose(0L, 10000L)
        k <- Gen.oneOf("x", "y")
        t <- Gen.choose(0, 1000)
      } yield (id, k, t))
      rights <- Gen.listOfN(15, for {
        k <- Gen.oneOf("x", "y")
        t <- Gen.choose(0, 1000)
        p <- Gen.choose(0, 999).map(_ / 10.0)
      } yield (k, t, p))
    } yield (lefts.distinctBy(_._1), rights.distinctBy(r => (r._1, r._2)))

  private def ts(secs: Int) = new Timestamp(1700000000000L + secs * 1000L)

  test("asof join equals the brute-force per-row latest match") {
    GenCases(asofGen, 5).foreach { case (lefts, rights) =>
      if (lefts.nonEmpty && rights.nonEmpty) {
        val l = lefts.map { case (id, k, t) => (id, k, ts(t)) }.toDF("id", "k", "t")
        val r = rights.map { case (k, t, p) => (k, ts(t), p) }.toDF("k", "rt", "p")
        val got = AsOf.join(l, col("k"), col("t"), r, col("k"), col("rt"),
            Seq("p" -> col("p")))
          .collect().map(row => row.getLong(0) -> Option(row.get(3))).toMap
        val expected = lefts.map { case (id, k, t) =>
          val cand = rights.filter(x => x._1 == k && x._2 <= t)
          id -> (if (cand.isEmpty) None
                 else Some(cand.maxBy(_._2)._3))
        }.toMap
        assert(got === expected)
      }
    }
  }

  private val edgesGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(60, for {
      a <- Gen.choose(0L, 14L)
      b <- Gen.choose(0L, 14L) if a != b
    } yield (a, b))

  test("triangleCounts equals the brute-force triple enumeration") {
    GenCases(edgesGen, 6).foreach { rows =>
      if (rows.nonEmpty) {
        val got = graft.ops.Graph.triangleCounts(
            rows.toDF("a", "b"), col("a"), col("b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val und = rows.map { case (a, b) =>
          (math.min(a, b), math.max(a, b)) }.toSet
        val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
        val tris = for {
          i <- nodes; j <- nodes if i < j; k <- nodes if j < k
          if und((i, j)) && und((j, k)) && und((i, k))
        } yield Seq(i, j, k)
        val expected = tris.flatten.groupBy(identity)
          .map { case (n, xs) => n -> xs.size.toLong }
        assert(got === expected, rows)
      }
    }
  }

  private val trendGen: Gen[List[(String, Long, Long)]] =
    Gen.listOfN(30, for {
      g <- Gen.oneOf("a", "b")
      x <- Gen.choose(0L, 50L)
      y <- Gen.choose(-1000L, 1000L)
    } yield (g, x, y))

  test("groupTrend equals the closed-form least squares") {
    GenCases(trendGen, 6).foreach { raw =>
      val rows = raw.distinctBy(r => (r._1, r._2))
      if (rows.nonEmpty) {
        val got = graft.ops.Profile.groupTrend(rows.toDF("g", "x", "y"),
            col("g"), col("x"), col("y"))
          .collect().map(r => r.getString(0) ->
            (Option(r.get(2)), Option(r.get(3)))).toMap
        rows.groupBy(_._1).foreach { case (g, pts) =>
          val n = pts.size.toLong
          val (sx, sy) = (pts.map(_._2).sum, pts.map(_._3).sum)
          val sxx = pts.map(p => p._2 * p._2).sum
          val sxy = pts.map(p => p._2 * p._3).sum
          val den = (n * sxx - sx * sx).toDouble
          if (den == 0.0) assert(got(g) == ((None, None)))
          else {
            val slope = (n * sxy - sx * sy).toDouble / den
            val icept = (sy * sxx - sx * sxy).toDouble / den
            assert(got(g) == ((Some(slope), Some(icept))), (g, pts))
          }
        }
      }
    }
  }

  private val nbGen: Gen[List[(Long, String, String)]] =
    Gen.listOfN(20, for {
      id <- Gen.choose(0L, 10000L)
      c <- Gen.oneOf("p", "q")
      words <- Gen.listOfN(5, Gen.oneOf("u", "v", "w", "z"))
    } yield (id, words.mkString(" "), c))

  test("naiveBayesConfusion equals the brute-force NB argmax") {
    GenCases(nbGen, 5).foreach { raw =>
      val rows = raw.distinctBy(_._1)
      if (rows.nonEmpty) {
        val got = graft.ops.TextAnalysis.naiveBayesConfusion(
            rows.toDF("doc_id", "text", "lang"),
            col("text"), col("doc_id"), col("lang"))
          .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
          .toMap
        // brute force with the SAME micro-ln quantization
        def ln6(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
        val toks = rows.map(r => r._1 -> r._2.toLowerCase.split(" ", -1).toSeq).toMap
        val classes = rows.map(_._3).distinct.sorted
        val cnt = rows.flatMap(r => toks(r._1).map(w => (w, r._3)))
          .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
        val tc = classes.map(c => c -> cnt.collect {
          case ((_, cc), n) if cc == c => n }.sum).toMap
        val v = cnt.keys.map(_._1).toSet.size.toLong
        val nd = rows.groupBy(_._3).map { case (c, d) => c -> d.size.toLong }
        val n = rows.size.toLong
        val expected = rows.map { r =>
          val scores = classes.map { c =>
            val s = ln6(nd(c)) - ln6(n) +
              toks(r._1).map(w => ln6(cnt.getOrElse((w, c), 0L) + 1L)).sum -
              toks(r._1).size.toLong * ln6(tc(c) + v)
            (c, s)
          }
          val best = scores.minBy { case (c, s) => (-s, c) }._1
          (r._3, best)
        }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
        assert(got === expected, rows)
      }
    }
  }

  private val resampleGen: Gen[List[(Long, Long, Int, Double)]] =
    Gen.listOfN(40, for {
      key <- Gen.choose(0L, 3L)
      id <- Gen.choose(0L, 100000L)
      t <- Gen.choose(0, 40000) // ~11 hours of seconds
      v <- Gen.choose(-50, 50).map(_ / 2.0)
    } yield (key, id, t, v))

  test("resample grid is dense per key and forward fill never regresses") {
    GenCases(resampleGen, 4).foreach { raw =>
      val rows = raw.distinctBy(r => (r._1, r._2))
      if (rows.nonEmpty) {
        val df = rows.map { case (k, id, t, v) => (k, id, ts(t), v) }
          .toDF("k", "id", "t", "v")
        val out = graft.ops.Resample.forwardFill(df,
            col("k"), col("t"), col("id"), col("v"))
          .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
            r.getLong(2), r.getDouble(3), r.getBoolean(4)))
        val byKey = out.groupBy(_._1)
        byKey.foreach { case (_, g) =>
          val bkts = g.map(_._2).sorted
          // dense hourly grid: every consecutive step is exactly 1 h
          assert(bkts.zip(bkts.tail).forall { case (x, y) => y - x == 3600000L })
          // a filled bucket has zero events and carries SOME value;
          // a non-filled one has ≥1 event
          g.foreach { case (_, _, n, _, filled) =>
            assert(if (filled) n == 0L else n >= 1L)
          }
          // the first bucket of every key is never a gap
          assert(!g.minBy(_._2)._5)
        }
        // event conservation: bucket counts sum to the input size
        assert(out.map(_._3).sum == rows.size)
      }
    }
  }
}
