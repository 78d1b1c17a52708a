package graft

import graft.operators._

/** Scale-shape assertions: the physical plans must have the properties the
  * 100 TB design depends on — filters/projections pushed into the parquet
  * scan, broadcast joins where a dimension is small, no cartesian products
  * on the equi-join paths. `.queryExecution.executedPlan` is inspected as
  * text (the same thing `.explain("formatted")` prints). */
class PlanSpec extends SparkSpec {

  private def plan(q: QueryDef): String =
    q.run(spark, sfDir).queryExecution.executedPlan.toString

  test("q01: filter + projection reach the parquet scan") {
    val p = plan(Relational.q01FilterProject)
    assert(p.contains("PushedFilters: ["), s"no pushed filters in:\n$p")
    assert(p.contains("l_shipdate"), "shipdate filter not pushed")
    // pruned read schema — none of the unused money columns
    assert(!p.contains("l_comment"))
  }

  test("q02: aggregation is partial+final hash agg (map-side combine)") {
    val p = plan(Relational.q02GroupAgg)
    assert(p.contains("HashAggregate"))
    assert(p.contains("partial_"), s"no partial aggregation in:\n$p")
  }

  test("q04: small filtered dimension is broadcast, not shuffled") {
    val p = plan(Relational.q04BroadcastJoin)
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
  }

  test("q05: dims broadcast; no cartesian anywhere") {
    val p = plan(Relational.q05MultiJoin)
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q11: top-k plans as TakeOrderedAndProject, not global sort") {
    val p = plan(Relational.q11TopK)
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("q19: token top-50 also plans as TakeOrderedAndProject") {
    val p = plan(TextOps.q19TokenTopK)
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("sortWithinPartitions is partition-local: no exchange, non-global sort") {
    val df = Tables.lineitem(spark, sfDir).sortWithinPartitions("l_orderkey")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Sort") && p.contains("false, 0"), s"expected local sort:\n$p")
    assert(!p.contains("Exchange"), s"local sort must not shuffle:\n$p")
  }

  test("q27: single-query ANN broadcasts the query vector") {
    val p = plan(VectorOps.q27CosineTopK)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }
}
