package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftfn.TopKPerGroupNative
import org.scalatest.funsuite.AnyFunSuite

/** The native LogicalPlan→Strategy→SparkPlan top-k operator must return
  * exactly what the window formulation returns, while planning as two
  * bounded-heap exec nodes (partial prune → exchange → final rank)
  * instead of a full per-group sort.
  */
class NativeTopKSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("native top-k ≡ window row_number top-k, with the pruned physical shape") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    // score ties force the tiebreak path; 40 groups × ~50 rows
    val df = (0 until 2000)
      .map(i => (s"g${i % 40}", i.toLong, rng.nextInt(25)))
      .toDF("grp", "id", "score")
      .repartition(8) // multiple partitions so partial pruning is real
    val native = TopKPerGroupNative.topKPerGroup(df, Seq("grp"),
      Seq(TopKPerGroupNative.Key("score", desc = true),
        TopKPerGroupNative.Key("id")), k = 6)
    val windowed = df.withColumn("rk",
        row_number().over(Window.partitionBy(col("grp"))
          .orderBy(col("score").desc, col("id"))))
      .filter(col("rk") <= 6)

    val a = native.select("grp", "rk", "id", "score")
      .collect().map(_.toSeq).toSet
    val b = windowed.select("grp", "rk", "id", "score")
      .collect().map(_.toSeq).toSet
    assert(a == b, s"native=${a.size} window=${b.size}")
    assert(a.size == 40 * 6)

    val plan = native.queryExecution.executedPlan.toString
    assert("TopKPerGroup".r.findAllIn(plan).length >= 2,
      s"expected partial+final exec nodes:\n${plan.take(600)}")
    assert(!plan.contains("Window"), "native operator must not fall back to a window")
  }

  test("groups smaller than k emit all their rows, ranked") {
    import spark.implicits._
    val df = Seq(("a", 1L, 30), ("a", 2L, 20), ("b", 3L, 10))
      .toDF("grp", "id", "score")
    val out = TopKPerGroupNative.topKPerGroup(df, Seq("grp"),
        Seq(TopKPerGroupNative.Key("score", desc = true),
          TopKPerGroupNative.Key("id")), k = 5)
      .select("grp", "rk", "id").collect().map(_.toSeq).toSet
    assert(out == Set(Seq("a", 1, 1L), Seq("a", 2, 2L), Seq("b", 1, 3L)))
  }
}
