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
          .orderBy(col("score").desc, col("id"))).cast("long"))
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
    assert(out == Set(Seq("a", 1L, 1L), Seq("a", 2L, 2L), Seq("b", 1L, 3L)))
  }

  test("null group keys and null sort values rank exactly like the window form") {
    import spark.implicits._
    // null group = its own group (UnsafeRow key equality); null scores
    // exercise the SortOrder null ordering inside the heaps
    val df = Seq[(String, java.lang.Long, java.lang.Integer)](
        ("a", 1L, 5), ("a", 2L, null), ("a", 3L, 5), (null, 4L, 9),
        (null, 5L, null), ("b", 6L, 1), (null, 7L, 2))
      .toDF("grp", "id", "score")
    val native = TopKPerGroupNative.topKPerGroup(df, Seq("grp"),
        Seq(TopKPerGroupNative.Key("score", desc = true),
          TopKPerGroupNative.Key("id")), k = 2)
      .select("grp", "rk", "id", "score").collect().map(_.toSeq).toSet
    val windowed = df.withColumn("rk",
        row_number().over(Window.partitionBy(col("grp"))
          .orderBy(col("score").desc, col("id"))).cast("long"))
      .filter(col("rk") <= 2)
      .select("grp", "rk", "id", "score").collect().map(_.toSeq).toSet
    assert(native == windowed, s"native=$native\nwindow=$windowed")
    assert(native.size == 5) // groups a (2), b (1), null (2)
  }

  test("rank column is BIGINT, matching SQL row_number()") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1)).toDF("grp", "id", "score")
    val out = TopKPerGroupNative.topKPerGroup(df, Seq("grp"),
      Seq(TopKPerGroupNative.Key("score")), k = 1)
    assert(out.schema("rk").dataType == org.apache.spark.sql.types.LongType)
  }

  test("skewed 1e6-row input: bounded heaps (metrics) and window-identical rows") {
    import org.apache.spark.sql.graftfn.TopKPerGroupExec
    import spark.implicits._
    val k = 4
    // one group holds 90% of all rows; 100 cold groups share the rest
    val df = spark.range(0, 1000000).toDF("id")
      .withColumn("grp", when(col("id") % 10 =!= 0, lit("hot"))
        .otherwise(concat(lit("g"), col("id") % 1000)))
      .withColumn("score", pmod(col("id") * 2654435761L, lit(999983L)))
      .repartition(8)
      .persist()
    // AQE wraps stages in leaf nodes (AdaptiveSparkPlanExec /
    // QueryStageExec), hiding the exec nodes from plan.collect — turn it
    // off so the metric assertions can reach them
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val native = TopKPerGroupNative.topKPerGroup(df, Seq("grp"),
        Seq(TopKPerGroupNative.Key("score", desc = true),
          TopKPerGroupNative.Key("id")), k)
      // collect() the native frame itself: .select(...) would build a NEW
      // query execution whose exec-node instances (and metrics) are not
      // the ones inspected below
      val a = native.collect()
        .map(r => Seq(r.getAs[String]("grp"), r.getAs[Long]("rk"),
          r.getAs[Long]("id"), r.getAs[Long]("score"))).toSet
      val b = df.withColumn("rk",
          row_number().over(Window.partitionBy(col("grp"))
            .orderBy(col("score").desc, col("id"))).cast("long"))
        .filter(col("rk") <= k)
        .select("grp", "rk", "id", "score")
        .collect().map(_.toSeq).toSet
      assert(a == b)
      assert(a.size == 101 * k) // hot + 100 cold groups, all larger than k

      val planStr = native.queryExecution.executedPlan.toString
      // both exec nodes participate in whole-stage codegen (starred):
      // the child pipeline's generated loop calls insert() directly —
      // no iterator boundary below the operator
      assert("""\*\(\d+\) TopKPerGroup""".r.findAllIn(planStr).length == 2,
        s"expected both exec nodes inside WholeStageCodegen:\n${planStr.take(900)}")
      val execs = native.queryExecution.executedPlan.collect {
        case e: TopKPerGroupExec => e
      }
      assert(execs.size == 2, "expected partial + final exec nodes")
      val Seq(finalNode) = execs.filter(!_.partial)
      val Seq(partialNode) = execs.filter(_.partial)
      assert(finalNode.metrics("numGroups").value == 101)
      assert(finalNode.metrics("numOutputRows").value == 101L * k)
      // bounded-memory contract: every task's PEAK heap stayed ≤ k even
      // though the hot group holds 900k rows — the metric accumulates one
      // peak per task, so merged value ≤ k · tasks
      val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions").toInt
      assert(partialNode.metrics("maxHeapRows").value <= k.toLong * 8)
      assert(finalNode.metrics("maxHeapRows").value <= k.toLong * shufflePartitions)
      // partial prune actually pruned: survivors ≤ k · groups-per-partition · partitions
      assert(partialNode.metrics("numOutputRows").value <= (101L * k) * 8)
      assert(partialNode.metrics("numOutputRows").value < 1000000L / 10)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
      df.unpersist()
    }
  }
}
