package graft

import graft.queries.TextDedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The d8 connected-components engine: alternating large-star/small-star
  * contraction must converge in O(log n) rounds where plain min-label
  * propagation needs diameter rounds — that difference is what makes
  * graph dedup viable on lake-scale chains.
  */
class StarContractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("1000-node path graph converges in O(log n) rounds, not ~999") {
    import spark.implicits._
    val nodes = spark.range(0, 1000).toDF("id")
    val edges = spark.range(0, 999)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    val (labels, rounds) = TextDedup.starContractComponents(nodes, edges)
    // distance to the minimum halves per round: ~log2(999)+settle ≈ 11
    assert(rounds <= 14,
      s"took $rounds rounds — min-label propagation needs ~999 here")
    val comps = labels.select(col("component")).distinct().as[Long].collect()
    assert(comps.toSeq == Seq(0L), s"components ${comps.toSeq}")
    assert(labels.count() == 1000)
  }

  test("mixed components, singletons, and arbitrary edge orientation") {
    import spark.implicits._
    val nodes = Seq(0L, 1L, 2L, 10L, 11L, 20L).toDF("id")
    // orientations deliberately mixed; (2,1) duplicates (1,2)
    val edges = Seq((1L, 0L), (2L, 1L), (1L, 2L), (11L, 10L)).toDF("src", "dst")
    val (labels, _) = TextDedup.starContractComponents(nodes, edges)
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      10L -> 10L, 11L -> 10L, 20L -> 20L), got.toString)
  }

  test("running out of rounds throws instead of emitting a partial labeling") {
    import spark.implicits._
    val nodes = Seq(0L, 1L, 2L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      TextDedup.starContractComponents(nodes, edges, maxRounds = 0)
    }
    assert(e.getMessage.contains("did not converge"), e.getMessage)
  }

  test("empty edge set: every node is its own component in zero rounds") {
    import spark.implicits._
    val nodes = Seq(5L, 7L).toDF("id")
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val (labels, rounds) = TextDedup.starContractComponents(nodes, edges)
    assert(rounds == 0)
    assert(labels.as[(Long, Long)].collect().toMap == Map(5L -> 5L, 7L -> 7L))
  }
}
