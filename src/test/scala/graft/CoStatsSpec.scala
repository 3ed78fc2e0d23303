package graft

import graft.core.CoStats
import org.scalatest.funsuite.AnyFunSuite

/** CoStats math vs hand-computed values (reference semantics:
  * CoStats.scala + MathUtils.scala — smoothed estimates with
  * priorW=2, priors 0.5).
  */
class CoStatsSpec extends AnyFunSuite {

  test("state frequencies partition n") {
    val cs = CoStats(n = 100, fA = 30, fB = 40, fAB = 10)
    // f(!A!B)=40, f(A!B)=20, f(!AB)=30, f(AB)=10
    assert(cs.d(3) === cs.d(true, true))
    assert(cs.d(0) === cs.d(false, false))
  }

  test("smoothed pA matches eP closed form") {
    val cs = CoStats(n = 100, fA = 30, fB = 40, fAB = 10)
    // eP(30, 100, 0.5, 2/0.5=4) = (30 + 0.5*4) / 104
    assert(math.abs(cs.pA - 32.0 / 104.0) < 1e-12)
    assert(math.abs(cs.pB - 42.0 / 104.0) < 1e-12)
  }

  test("independent variables have lift ~1 and mi ~0") {
    // perfectly independent: fA/n = 1/2, fB/n = 1/2, fAB/n = 1/4
    val cs = CoStats(n = 10000, fA = 5000, fB = 5000, fAB = 2500)
    (0 until 4).foreach { s => assert(math.abs(cs.d(s) - 1.0) < 0.01) }
    assert(math.abs(cs.mi) < 1e-3)
  }

  test("perfectly correlated variables have high mi") {
    val cs = CoStats(n = 10000, fA = 5000, fB = 5000, fAB = 5000)
    assert(cs.d(3) > 1.5)
    assert(cs.mi > 0.5)
  }

  test("entropy h is symmetric and maximal at 0.5") {
    assert(math.abs(CoStats.h(0.5) - 1.0) < 1e-12)
    assert(math.abs(CoStats.h(0.1) - CoStats.h(0.9)) < 1e-12)
  }
}
