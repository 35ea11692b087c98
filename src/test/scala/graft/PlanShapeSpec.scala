package graft

import graft.queries.{Embeddings, Relational}
import org.scalatest.funsuite.AnyFunSuite

/** Guards the SCALE.md plan-shape claims: these properties are what make
  * the queries survive a 100× scale-up, so a regression here is a
  * performance bug even when results stay correct.
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1: shipdate filter reaches the parquet scan; schema pruned") {
    val p = plan(Relational.q1PricingSummary(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    val readSchema = p.split("ReadSchema: ")(1).split("\n")(0)
    assert(readSchema.count(_ == ':') <= 7,
      s"expected pruned lineitem read, got $readSchema")
  }

  test("q2: all three dimension joins broadcast") {
    val p = plan(Relational.q2JoinRevenueByNation(spark, dir))
    assert("BroadcastHashJoin".r.findAllIn(p).length == 3, p.take(500))
  }

  test("q8: global top-k plans as TakeOrderedAndProject, not a full sort") {
    val p = plan(Relational.q8GlobalTopK(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p.take(500))
  }

  test("s1: dot product is the native codegen expression, queries broadcast") {
    val p = plan(Embeddings.s1CosineTopK(spark, dir))
    assert(p.contains("float_vec_dot"), "expected FloatVecDot in the plan")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("q3: partial aggregation runs before the join") {
    val p = plan(Relational.q3OrderLineitemJoin(spark, dir))
    assert(p.contains("HashAggregate"), p.take(300))
  }
}
