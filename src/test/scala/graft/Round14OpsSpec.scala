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

  test("d10w: split roles are exact (eval∈{val,test}, train='train'), " +
      "every emitted pair exists in the capped winnow pair space with " +
      "its shared count, and no qualifying direction is dropped") {
    val (_, split) = TextDedup.splitCols
    val splits = Tables.documents(spark, dir)
      .select(col("doc_id"), split.as("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // the reference pair space: ≥2-shared pairs over the capped wide
    // selection, recomputed from first principles
    val sel = TextDedup.winnowCapped(TextDedup.winnowLocalSelect(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")),
      WinnowW, WinnowWideHex), WinnowSweepCap)
    val pairs = sel.as("a").join(sel.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("ns")).filter(col("ns") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = TextDedup.d10wDecontaminationWinnow(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty, "fixture has no eval↔train near-dup — weak data")
    got.foreach { case (evalId, evalSplit, trainId, shared) =>
      assert(Set("val", "test")(evalSplit) && splits(evalId) == evalSplit)
      assert(splits(trainId) == "train")
      val key = if (evalId < trainId) (evalId, trainId) else (trainId, evalId)
      assert(pairs.get(key).contains(shared),
        s"($evalId,$trainId) shared=$shared not in the pair space")
    }
    // completeness: every pair-space edge with an eval/train role split
    // appears exactly once per direction
    val expected = pairs.keys.flatMap { case (a, b) =>
      val dir1 = if (Set("val", "test")(splits(a)) && splits(b) == "train")
        Some((a, b)) else None
      val dir2 = if (Set("val", "test")(splits(b)) && splits(a) == "train")
        Some((b, a)) else None
      dir1 ++ dir2
    }.toSet
    assert(got.map(r => (r._1, r._3)).toSet == expected)
  }

  test("d12w: per-eval-doc overlap is the winnow-selection fraction — " +
      "n_sel matches the doc's own distinct wide selections, bounds " +
      "hold, and a train-side fingerprint match is what it claims") {
    val sel = TextDedup.winnowLocalSelect(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")),
      WinnowW, WinnowWideHex).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val perDoc = sel.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val (_, split) = TextDedup.splitCols
    val splits = Tables.documents(spark, dir)
      .select(col("doc_id"), split.as("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val trainFps = perDoc.collect {
      case (id, fps) if splits(id) == "train" => fps }.flatten.toSet
    val got = TextDedup.d12wOverlapWinnow(spark, dir).collect()
    assert(got.nonEmpty)
    assert(got.exists(_.getLong(3) > 0), "no eval doc overlaps train — " +
      "the probe join is untested by this fixture")
    got.foreach { r =>
      val (id, sp, nSel, nIn) =
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))
      assert(Set("val", "test")(sp) && splits(id) == sp)
      assert(nSel == perDoc(id).size, s"doc $id n_sel")
      assert(nIn == perDoc(id).count(trainFps), s"doc $id n_in_train")
      assert(math.abs(r.getDouble(4) - math.round(nIn.toDouble / nSel
        * 1e6) / 1e6) < 1e-9)
    }
    // every val/test doc with ≥1 selection is scored (limit permitting)
    val evalDocs = perDoc.keys.filter(id => Set("val", "test")(splits(id)))
    assert(got.map(_.getLong(0)).toSet == evalDocs.toSet)
  }

  test("p26w: per-source counts tie out against d10w's distinct train " +
      "set and the corpus doc counts; the micro rate is half-up exact") {
    val cont = TextDedup.d10wDecontaminationWinnow(spark, dir)
      .select(col("train_id")).distinct().collect()
      .map(_.getLong(0)).toSet
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val got = TextDedup.p26wContaminationWinnow(spark, dir).collect()
    assert(got.map(_.getLong(1)).sum == docs.length)
    assert(got.map(_.getLong(2)).sum == cont.size)
    got.foreach { r =>
      val src = r.getString(0)
      val inSrc = docs.filter(_._2 == src)
      assert(r.getLong(1) == inSrc.length)
      val nc = inSrc.count(d => cont(d._1))
      assert(r.getLong(2) == nc)
      val micro = (nc.toLong * 1000000L + inSrc.length / 2) / inSrc.length
      assert(math.abs(r.getDouble(3) - micro / 1e6) < 1e-9)
    }
  }
}
