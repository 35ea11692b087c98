package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 session operators: the d34w bounded-bootstrap invariants
  * the oracle hash can't localize — the merge algebra, the standing
  * asset contracts, and the probe's edge-class discipline.
  */
class Round14OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  import graft.queries.TextDedup
  import TextDedup.{WinnowW, WinnowWideHex, WinnowSweepCap}

  test("d34w: the two-phase ledger merge equals the one-shot closure " +
      "over (standing pairs ∪ probe ∪ increment self) — the star-" +
      "contraction algebra the oracle gate relies on, pinned in-suite") {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val sSel = TextDedup.winnowLocalSelect(
      docs.filter(col("doc_id") % 5 =!= 0), WinnowW, WinnowWideHex)
    val iSel = TextDedup.winnowLocalSelect(
      docs.filter(col("doc_id") % 5 === 0), WinnowW, WinnowWideHex)
    val sPost = TextDedup.winnowCapped(sSel, WinnowSweepCap)
    val sPairs = TextDedup.winnowPairsOf(sPost)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val probe = iSel.as("i").join(sPost.as("s"), col("i.fp") === col("s.fp"))
      .groupBy(col("i.doc_id").as("src"), col("s.doc_id").as("dst"))
      .agg(count(lit(1)).as("ns")).filter(col("ns") >= 2)
      .select(col("src"), col("dst"))
    val self = TextDedup.winnowPairsOf(
        TextDedup.winnowCapped(iSel, WinnowSweepCap))
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val (oneShot, _) = TextDedup.starContractComponents(
      docs.select(col("doc_id").as("id")),
      sPairs.unionByName(probe).unionByName(self))
    val expected = oneShot.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = TextDedup.d34wIncrementalWinnow(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected,
      s"diff=${(got.toSet diff expected.toSet).take(5)}")
    // the fixture genuinely exercises a cross-boundary merge
    val flags = TextDedup.d34wIncrementalWinnow(spark, dir).collect()
      .map(r => (r.getLong(1), r.getBoolean(2)))
    assert(flags.groupBy(_._1).values
      .exists(g => g.exists(_._2) && g.exists(!_._2)),
      "no component spans the standing/increment boundary")
  }

  test("d34w standing assets: postings rank-capped per fingerprint, " +
      "ledger covers exactly the standing docs with min-member labels") {
    val (post, ledger) = TextDedup.d34wStandingAssets(spark, dir)
    val maxPerFp = post.groupBy(col("fp")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head.getLong(0)
    assert(maxPerFp <= WinnowSweepCap)
    val standingIds = Tables.documents(spark, dir)
      .filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val rows = ledger.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.map(_._1).toSet == standingIds)
    // component = smallest member of its group, and itself a member
    rows.groupBy(_._2).foreach { case (comp, members) =>
      assert(members.map(_._1).min == comp,
        s"component $comp is not its group's min member")
    }
    // postings live in the wide space and only standing docs post
    assert(post.select(col("doc_id")).distinct().collect()
      .map(_.getLong(0)).forall(standingIds))
  }

  test("d34w probe edges connect increment→standing only; self edges " +
      "stay within the increment (the d13 probe discipline — standing " +
      "never re-joins itself at merge time)") {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val (post, _) = TextDedup.d34wStandingAssets(spark, dir)
    val iSel = TextDedup.winnowLocalSelect(
      docs.filter(col("doc_id") % 5 === 0), WinnowW, WinnowWideHex)
    val probe = iSel.as("i").join(post.as("s"), col("i.fp") === col("s.fp"))
      .groupBy(col("i.doc_id").as("src"), col("s.doc_id").as("dst"))
      .agg(count(lit(1)).as("ns")).filter(col("ns") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(probe.nonEmpty, "fixture has no cross near-dup — weak test data")
    probe.foreach { case (s, d) =>
      assert(s % 5 == 0, s"probe src $s is not an increment doc")
      assert(d % 5 != 0, s"probe dst $d is not a standing doc")
    }
    val self = TextDedup.winnowPairsOf(
        TextDedup.winnowCapped(iSel, WinnowSweepCap))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    self.foreach { case (a, b) =>
      assert(a % 5 == 0 && b % 5 == 0, s"self edge ($a,$b) left the shard")
    }
  }
}
