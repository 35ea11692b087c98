package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Phase timer for the s23 greedy loop — run at sf0.1 to localize the
  * cost: `sbt "Test/runMain graft.S23TimerMain"`.
  */
object S23TimerMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[s23-timer] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import org.apache.spark.sql.expressions.Window
    val gf = org.apache.spark.sql.graftfn.GraftExpressions
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      gf.floatVecDot(a, b)
    val emb = Tables.embeddings(spark, dir)
      .withColumn("nrm", sqrt(dot(col("embedding"), col("embedding"))))
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val scored = emb.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")),
          6).as("cos"))
    val candIds = graft.queries.TopK.saltedTopK(scored, Seq(col("q_id")),
        Seq(col("cos").desc, col("vec_id")), k = 20, saltBy = col("vec_id"))
      .select(col("q_id"), col("vec_id"), col("cos"),
        round(col("cos") * 1e6).cast("long").as("rel_micro"))
    val cand = emb.select(col("vec_id"), col("embedding"), col("nrm"))
      .join(broadcast(candIds), Seq("vec_id"))
      .select(col("q_id"), col("vec_id"), col("embedding"), col("nrm"),
        col("cos"), col("rel_micro"))
      .persist()
    timed("cand materialize")(cand.count())
    val slim = cand.select(col("q_id"), col("vec_id"), col("cos"),
      col("rel_micro"))
    val pa = cand.select(col("q_id").as("pq"), col("vec_id").as("va"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val pb = cand.select(col("q_id").as("pq2"), col("vec_id").as("vb"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    val pairs = pa.join(pb, col("pq") === col("pq2") && col("va") =!= col("vb"))
      .select(col("pq"), col("va"), col("vb"),
        round(round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6)
          * 1e6).cast("long").as("sim_micro"))
      .persist()
    timed("pairs materialize")(pairs.count())
    def pin(df: DataFrame): DataFrame = df.localCheckpoint(true)
    val firstW = Window.partitionBy(col("q_id"))
      .orderBy(col("rel_micro").desc, col("vec_id"))
    var selected = timed("round 1")(pin(slim
      .withColumn("rn", row_number().over(firstW)).filter(col("rn") === 1)
      .select(col("q_id"), col("vec_id"), col("cos"),
        (lit(7L) * col("rel_micro")).as("score10"), lit(1).as("rk"))))
    for (i <- 2 to 5) {
      val selK = selected.select(col("q_id").as("kq"), col("vec_id").as("kv"))
      val selS = selected.select(col("q_id").as("sq"), col("vec_id").as("sv"))
      val pick = slim
        .join(selK, col("q_id") === col("kq") && col("vec_id") === col("kv"),
          "left_anti")
        .join(pairs, col("pq") === col("q_id") && col("va") === col("vec_id"))
        .join(selS, col("sq") === col("pq") && col("sv") === col("vb"))
        .groupBy(col("q_id"), col("vec_id"), col("cos"), col("rel_micro"))
        .agg(max(col("sim_micro")).as("maxsim"))
        .withColumn("score10",
          lit(7L) * col("rel_micro") - lit(3L) * col("maxsim"))
        .withColumn("rn", row_number().over(Window.partitionBy(col("q_id"))
          .orderBy(col("score10").desc, col("vec_id"))))
        .filter(col("rn") === 1)
        .select(col("q_id"), col("vec_id"), col("cos"), col("score10"),
          lit(i).as("rk"))
      selected = timed(s"round $i")(pin(selected.unionByName(pick)))
    }
    timed("final collect") {
      selected.select(col("q_id"), col("rk"), col("vec_id"), col("cos"),
        (col("score10").cast("double") / 1e7).as("mmr"))
        .orderBy(col("q_id"), col("rk")).collect().length
    }
    spark.stop()
  }
}
