package graft.core

/** Bayesian-smoothed co-occurrence statistics between two boolean
  * variables, given the four counts (n, fA, fB, fAB).
  *
  * Same math as the reference's CoStats
  * (/root/reference/src/main/scala/com/futurice/iodf/CoStats.scala:7-35
  * and MathUtils.scala:27-47), re-derived in closed form so it can run
  * either driver-side on aggregated counts or inside a Spark plan as
  * column expressions (see [[graft.core.IndexedFrame.coStatsCols]]).
  *
  * relState encoding: bit0 = A, bit1 = B, so
  *   0 = !A!B, 1 = A!B, 2 = !AB, 3 = AB.
  */
final case class CoStats(
    n: Long, fA: Long, fB: Long, fAB: Long,
    priorW: Double = 2.0, priorA: Double = 0.5, priorB: Double = 0.5) {

  import CoStats._

  def pA: Double = eP(fA, n, priorA, priorW / priorA)
  def pB: Double = eP(fB, n, priorB, priorW / priorB)

  def hA: Double = h(pA)
  def hB: Double = h(pB)

  private def stateF(s: Int): Long = s match {
    case 0 => n - fA - fB + fAB
    case 1 => fA - fAB
    case 2 => fB - fAB
    case _ => fAB
  }

  /** naive independence probability of state s */
  def naiveP(s: Int): Double = {
    val pAs = if ((s & 1) > 0) pA else 1 - pA
    val pBs = if ((s & 2) > 0) pB else 1 - pB
    pAs * pBs
  }

  /** smoothed observed probability of state s */
  def p(s: Int): Double = {
    val naive = naiveP(s)
    eP(stateF(s), n, naive, priorW / naive)
  }

  /** lift: observed/expected for state s */
  def d(s: Int): Double = p(s) / naiveP(s)
  def d(a: Boolean, b: Boolean): Double =
    d((if (a) 1 else 0) + (if (b) 2 else 0))

  /** mutual information (smoothed) */
  def mi: Double = (0 until 4).map(s => p(s) * log2(d(s))).sum
}

object CoStats {
  private val InvLog2 = 1.0 / math.log(2.0)
  def log2(v: Double): Double = math.log(v) * InvLog2

  /** smoothed probability estimate: (f + p0*w) / (n + w) */
  def eP(f: Long, n: Long, priorP: Double, priorW: Double): Double =
    (f + priorP * priorW) / (n + priorW)

  def h(p: Double): Double = p * -log2(p) + (1 - p) * -log2(1 - p)
}
