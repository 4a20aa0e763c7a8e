package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog-wide smoke + plan audits at sf0.001: every query must run, and
  * the headline plans must have the shape we'd want at 100 TB (pushdown,
  * broadcast dims, top-k without global sort, no cartesian anywhere).
  */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("every catalog query runs at sf0.001 and matching oracle names exist") {
    val names = Queries.all.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    for (q <- Queries.all) {
      val df = q.build(spark, sf)
      val n = df.count()
      assert(n >= 0, q.name)
    }
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q02 pushes its filters into the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_shipdate") && p.contains("l_quantity"))
  }

  test("q03 broadcasts the dimension tables") {
    assert(plan("q03_join_revenue").contains("BroadcastHashJoin"))
  }

  test("q04 top-k plans as TakeOrderedAndProject, not a global sort") {
    assert(plan("q04_topk_orders").contains("TakeOrderedAndProject"))
  }

  test("no catalog query plans a cartesian product") {
    for (q <- Queries.all) {
      val p = q.build(spark, sf).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), q.name)
    }
  }

  test("entry returns routed rows (driver t1 contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
