package graft

/** Plan-shape regression guards (SURVEY §5/§7a): these queries must
  * keep their pushdown/broadcast/partial-agg shape as the code
  * evolves — a silent plan regression is a 100 TB incident, not a
  * local slowdown.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("point_lookup pushes both predicates into the parquet scan") {
    val p = plan("point_lookup")
    assert(p.contains("PushedFilters"))
    assert(p.contains("EqualTo(l_quantity,50.0)"), p)
    assert(p.contains("EqualTo(l_returnflag,R)"), p)
  }

  test("df_scan prunes to exactly the projected columns") {
    val p = plan("df_scan")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_orderkey") && read.contains("l_quantity"))
    assert(!read.contains("l_extendedprice"), read)
    assert(!read.contains("l_shipdate"), read)
  }

  test("q5_join broadcasts its dimension sides") {
    val p = plan("q5_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p)
    assert(!p.contains("CartesianProduct"))
  }

  test("q1_agg partial-aggregates before its exchange") {
    val p = plan("q1_agg")
    val firstAgg = p.indexOf("HashAggregate")
    val firstExchange = p.indexOf("Exchange")
    assert(firstAgg >= 0 && firstExchange >= 0)
    // plan prints top-down: a partial agg must exist below (after) the
    // shuffle exchange in the printed tree
    assert(p.lastIndexOf("HashAggregate") > firstExchange, p)
  }

  test("asof_join avoids nested-loop/cartesian shapes") {
    val p = plan("asof_join")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }
}
