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
}
