package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Independent-twin checks for the round-7 session operators: each test
  * recomputes the operator's semantics driver-side from the raw parquet
  * (sharing no Spark plan with the code under test) and compares exactly.
  */
class Round7OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("e14: timed funnel chains strict deadlines off the first view") {
    val events = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = events.groupBy(_._1)
    val exp = byUser.map { case (u, evs) =>
      val fv = evs.filter(_._2 == "view").map(_._3).minOption
      val tc = fv.flatMap(f => evs.filter(e => e._2 == "click" &&
        e._3 > f && e._3 <= f + 86400000000L).map(_._3).minOption)
      val tp = (fv, tc) match {
        case (Some(f), Some(c)) => evs.filter(e => e._2 == "purchase" &&
          e._3 > c && e._3 <= f + 259200000000L).map(_._3).minOption
        case _ => None
      }
      u -> ((fv.isDefined, tc.isDefined, tp.isDefined,
        (fv, tp) match { case (Some(f), Some(p)) => (p - f) / 1000000.0
                         case _ => Double.NaN }))
    }
    val got = graft.queries.Events.e14TimedFunnel(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (u, e) =>
      val g = got(u)
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3,
        s"user $u flags: got $g want $e")
      if (!e._4.isNaN) assert(g._4 == e._4, s"user $u ttc: got $g want $e")
      else assert(g._4.isNaN, s"user $u ttc must be null")
    }
    // the deadline must bite: some user converts, some clicks late/never
    assert(exp.values.exists(_._3) && exp.values.exists(e => e._1 && !e._2),
      "corpus must exercise both converted and non-qualifying users")
  }

  test("q27: trailing-30-day RANGE frame sums same-day orders symmetrically") {
    val orders = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        org.apache.spark.sql.functions.datediff(col("o_orderdate"),
          org.apache.spark.sql.functions.lit(
            java.sql.Date.valueOf("1992-01-01"))).cast("long").as("day"),
        org.apache.spark.sql.functions.round(col("o_totalprice") * 100)
          .cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byCust = orders.groupBy(_._1)
    val exp = orders.map { case (c, o, d, _) =>
      val frame = byCust(c).filter(x => x._3 >= d - 29 && x._3 <= d)
      (c, o) -> ((frame.map(_._4).sum / 100.0, frame.length.toLong))
    }.toMap
    val got = graft.queries.Relational.q27RollingRevenue(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(3), r.getLong(4)))).toMap
    assert(got.size == math.min(exp.size, 3000))
    got.foreach { case (k, g) =>
      assert(g == exp(k), s"order $k: got $g want ${exp(k)}") }
    assert(exp.values.exists(_._2 > 1), "some frame must span multiple orders")
  }

  test("s13: kNN vote is the majority of the exact top-5, ties to smaller label") {
    val embs = Tables.embeddings(spark, dir)
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray, r.getInt(2)))
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)
    def cos(a: Array[Float], b: Array[Float]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val exp = embs.filter(_._1 < 10).map { case (q, qe, ql) =>
      val top5 = embs.filter(_._1 != q)
        .map(e => (e._1, round6(cos(qe, e._2)), e._3))
        .sortBy(x => (-x._2, x._1)).take(5)
      val votes = top5.groupBy(_._3).view.mapValues(_.size).toMap
      val (pred, n) = votes.toSeq.sortBy(x => (-x._2, x._1)).head
      q -> ((pred, n.toLong, ql, pred == ql))
    }.toMap
    val got = graft.queries.Embeddings.s13KnnClassify(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2),
        r.getInt(3), r.getBoolean(4)))).toMap
    assert(got == exp, s"first diff: ${
      exp.collect { case (k, v) if got.get(k) != Some(v) =>
        (k, got.get(k), v) }.take(3)}")
  }

  test("p12: budget slices, ceil epochs capped at 4, fill fraction") {
    val toks = Tables.documents(spark, dir)
      .select(col("source"), org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.trim(
            org.apache.spark.sql.functions.lower(col("text"))), "\\s+"))
        .cast("long").as("nt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val bySrc = toks.groupBy(_._1).view.mapValues(v =>
      (v.size.toLong, v.map(_._2).sum)).toMap
    val total = bySrc.values.map(_._2).sum
    val budget = total * 2 / 5 / bySrc.size
    val exp = bySrc.map { case (s, (nd, nt)) =>
      val epochs = math.min((budget + nt - 1) / nt, 4L)
      val eff = math.min(budget, nt * epochs)
      s -> ((nd, nt, budget, epochs, eff, round6(eff.toDouble / budget)))
    }
    val got = graft.queries.TextDedup.p12EpochMix(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    assert(got == exp, s"first diff: ${
      exp.collect { case (k, v) if got.get(k) != Some(v) =>
        (k, got.get(k), v) }.take(3)}")
  }

  test("s14: radius search returns exactly the ≥0.3 neighbourhood, any cardinality") {
    val embs = Tables.embeddings(spark, dir)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)
    val exp = (for {
      (q, qe) <- embs.filter(_._1 < 10)
      (v, ve) <- embs if v != q
      c = round6(dot(qe, ve) / (math.sqrt(dot(qe, qe)) * math.sqrt(dot(ve, ve))))
      if c >= 0.3
    } yield (q, v) -> c).toMap
    val got = graft.queries.Embeddings.s14RadiusSearch(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == exp, s"got ${got.size} want ${exp.size}")
    assert(exp.nonEmpty, "corpus must have in-radius neighbours")
    // variable cardinality is the point of range search vs top-k
    val sizes = exp.keys.toSeq.groupBy(_._1).view.mapValues(_.size).values.toSet
    assert(sizes.size > 1, s"neighbourhood sizes must vary, got $sizes")
  }

  test("t19: hapax and tokens-per-type from an independent count") {
    val toks = Tables.documents(spark, dir)
      .select(col("lang"), col("text")).collect()
      .flatMap(r => r.getString(1).trim.toLowerCase.split("\\s+")
        .map(t => (r.getString(0), t)))
    val exp = toks.groupBy(_._1).map { case (lang, ts) =>
      val counts = ts.groupBy(_._2).view.mapValues(_.size)
      val vocab = counts.size.toLong
      val hapax = counts.count(_._2 == 1).toLong
      lang -> ((ts.length.toLong, vocab, hapax,
        round6(hapax.toDouble / vocab), round6(ts.length.toDouble / vocab)))
    }
    val got = graft.queries.TextDedup.t19VocabStats(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got == exp, s"first diff: ${
      exp.collect { case (k, v) if got.get(k) != Some(v) =>
        (k, got.get(k), v) }.take(2)}")
  }

  test("m10: the joint gate needs BOTH caption admission and the dims floor") {
    val adm = graft.queries.Ingest.p4QualityFilter(spark, dir)
      .select(col("doc_id"), col("keep")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val got = graft.multimodal.Multimodal.m10SampleAdmission(spark, dir)
    val rows = got.collect().map(r => (r.getLong(0), r.getString(1),
      r.getInt(2), r.getInt(3), r.getBoolean(4), r.getBoolean(5),
      r.getBoolean(6)))
    rows.foreach { case (id, _, w, h, admitted, dimsOk, keep) =>
      assert(w == 1 + (id % 64) && h == 1 + (id % 48),
        s"doc $id dims ($w,$h) must come from the decoded payload")
      assert(admitted == adm(id), s"doc $id admission mismatch")
      assert(dimsOk == (w >= 8 && h >= 8), s"doc $id dims_ok")
      assert(keep == (admitted && dimsOk), s"doc $id keep")
    }
    // both rejection channels must fire independently
    assert(rows.exists(r => r._5 && !r._6), "admitted but too small")
    assert(rows.exists(r => !r._5 && r._6), "big enough but junk caption")
    assert(rows.exists(_._7), "something must survive")
  }

  test("d18: cluster mass stays one doc's worth; singletons keep full weight") {
    import spark.implicits._
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 4L), (5L, 4L),
      (6L, 4L)).toDF("doc_id", "component")
    val got = graft.queries.TextDedup.softDedupOf(labels)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(1L -> ((2L, 500000L)), 2L -> ((2L, 500000L)),
      3L -> ((1L, 1000000L)), 4L -> ((3L, 333333L)), 5L -> ((3L, 333333L)),
      6L -> ((3L, 333333L))), s"got $got")
  }

  test("e15: quintile scores match the exact rank rule on every metric") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("value"),
        org.apache.spark.sql.functions.datediff(
          org.apache.spark.sql.functions.to_date(col("ts")),
          org.apache.spark.sql.functions.lit(
            java.sql.Date.valueOf("2024-01-01"))).cast("long").as("day"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3)))
    val maxDay = ev.map(_._4).max
    val users = ev.groupBy(_._1).map { case (u, es) =>
      (u, maxDay - es.map(_._4).max, es.size.toLong,
        es.filter(_._2 == "purchase").map(e => math.round(e._3 * 100)).sum)
    }.toSeq
    val n = users.size
    def score(order: Seq[(Long, Long)]): Map[Long, Long] =
      order.zipWithIndex.map { case ((u, _), i) =>
        u -> (5L - i.toLong * 5 / n) }.toMap
    val r = score(users.map(x => (x._1, x._2)).sortBy(x => (x._2, x._1)))
    val f = score(users.map(x => (x._1, x._3)).sortBy(x => (-x._2, x._1)))
    val m = score(users.map(x => (x._1, x._4)).sortBy(x => (-x._2, x._1)))
    val exp = users.map(x => x._1 -> ((x._2, x._3, x._4 / 100.0,
      r(x._1), f(x._1), m(x._1),
      r(x._1) * 100 + f(x._1) * 10 + m(x._1)))).toMap
    val got = graft.queries.Events.e15RfmSegments(spark, dir)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
        x.getDouble(3), x.getLong(4), x.getLong(5), x.getLong(6),
        x.getLong(7)))).toMap
    assert(got == exp, s"first diff: ${
      exp.collect { case (k, v) if got.get(k) != Some(v) =>
        (k, got.get(k), v) }.take(2)}")
    assert(got.values.map(_._7).toSet.size > 3, "segments must spread")
  }

  test("e16: streaks are maximal runs of consecutive distinct days") {
    val days = Tables.events(spark, dir)
      .select(col("user_id"),
        org.apache.spark.sql.functions.datediff(
          org.apache.spark.sql.functions.to_date(col("ts")),
          org.apache.spark.sql.functions.lit(
            java.sql.Date.valueOf("2024-01-01"))).cast("long").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val exp = days.groupBy(_._1).map { case (u, ds) =>
      val sorted = ds.map(_._2).sorted
      val lens = scala.collection.mutable.ArrayBuffer.empty[Long]
      var run = 1L
      sorted.zipWithIndex.foreach { case (d, i) =>
        if (i > 0) {
          if (d == sorted(i - 1) + 1) run += 1
          else { lens += run; run = 1 }
        }
      }
      lens += run
      u -> ((sorted.size.toLong, lens.size.toLong, lens.max))
    }
    val got = graft.queries.Events.e16ActivityStreaks(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got == exp, s"first diff: ${
      exp.collect { case (k, v) if got.get(k) != Some(v) =>
        (k, got.get(k), v) }.take(2)}")
    assert(got.values.exists(_._3 > 1), "some streak must exceed one day")
  }

  test("s15: ann vote is the majority of the gated s7 candidates; agreement bit is honest") {
    val labels = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val s7 = graft.queries.Embeddings.s7IvfProbe2(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val exact = graft.queries.Embeddings.s13KnnClassify(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(3)))).toMap
    val expAnn = s7.groupBy(_._1).map { case (q, cands) =>
      val votes = cands.map(c => labels(c._2))
        .groupBy(identity).view.mapValues(_.size)
      q -> votes.toSeq.sortBy(x => (-x._2, x._1)).head
    }
    val got = graft.queries.Embeddings.s15AnnClassify(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2),
        r.getInt(3), r.getInt(4), r.getBoolean(5)))).toMap
    assert(got.keySet == expAnn.keySet)
    got.foreach { case (q, (annL, annV, exL, trueL, agrees)) =>
      assert((annL, annV.toInt) == expAnn(q), s"q $q ann vote")
      assert((exL, trueL) == exact(q), s"q $q exact side")
      assert(agrees == (annL == exL), s"q $q agreement bit")
    }
  }

  test("p14: each stratum keeps exactly its 5 smallest salted hashes, rank-ordered") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val deciles = graft.queries.TextDedup.p8CurriculumBins(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val exp = docs.map { case (id, lang, text) =>
      val norm = text.trim.toLowerCase.replaceAll("\\s+", " ")
      (lang, deciles(id), id,
        java.lang.Long.parseLong(md5hex("strat:" + norm).substring(0, 4), 16))
    }.groupBy(x => (x._1, x._2)).values.flatMap { rows =>
      rows.sortBy(r => (r._4, r._3)).take(5).zipWithIndex
        .map { case (r, i) => (r._1, r._2, i + 1L, r._3, r._4) }.toSeq
    }.toSet
    val got = graft.queries.TextDedup.p14StratifiedSample(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == exp, s"sizes: got ${got.size} want ${exp.size}")
    assert(exp.map(x => (x._1, x._2)).size > 5, "multiple strata must exist")
  }

  test("v3: Nelson–Aalen micro-accumulation matches an independent fold") {
    val rows = Tables.customer(spark, dir)
      .filter(col("c_custkey") <= 2000)
      .select(col("c_mktsegment"), col("c_custkey")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val exp = rows.groupBy(_._1).flatMap { case (seg, cs) =>
      val subj = cs.map { case (_, k) => (k % 97, k % 2 == 0) }
      val byT = subj.groupBy(_._1).view
        .mapValues(v => (v.count(_._2).toLong, v.size.toLong)).toMap
      var atRisk = subj.size.toLong
      var acc = 0L
      byT.keys.toSeq.sorted.flatMap { t =>
        val (d, m) = byT(t)
        val h = (d * 1000000L + atRisk / 2) / atRisk
        acc += h
        val out = if (d > 0) Some((seg, t) ->
          ((d, atRisk, h, acc, round6(acc.toDouble / 1e6)))) else None
        atRisk -= m
        out
      }
    }
    val got = graft.queries.Survival.v3CumHazard(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    assert(got == exp, s"first diff: ${
      exp.collect { case (k, v) if got.get(k) != Some(v) =>
        (k, got.get(k), v) }.take(2)}")
    // the curve must be strictly increasing within a segment
    got.groupBy(_._1._1).foreach { case (_, seg) =>
      val byTime = seg.toSeq.sortBy(_._1._2).map(_._2._4)
      assert(byTime == byTime.sorted && byTime.distinct == byTime)
    }
  }

  test("v4: Kaplan-Meier log-space product matches an independent fold, curve non-increasing") {
    val rows = Tables.customer(spark, dir)
      .filter(col("c_custkey") <= 2000)
      .select(col("c_mktsegment"), col("c_custkey")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val exp = rows.groupBy(_._1).flatMap { case (seg, cs) =>
      val subj = cs.map { case (_, k) => (k % 97, k % 2 == 0) }
      val byT = subj.groupBy(_._1).view
        .mapValues(v => (v.count(_._2).toLong, v.size.toLong)).toMap
      var atRisk = subj.size.toLong
      var acc = 0L
      var extinct = false
      byT.keys.toSeq.sorted.flatMap { t =>
        val (d, m) = byT(t)
        if (d < atRisk)
          acc += math.round(math.log((atRisk - d).toDouble / atRisk) * 1e6)
        else extinct = true
        val out = if (d > 0) Some((seg, t) -> ((d, atRisk, acc,
          if (extinct) 0.0 else round6(math.exp(acc.toDouble / 1e6)))))
          else None
        atRisk -= m
        out
      }
    }
    val got = graft.queries.Survival.v4KaplanMeier(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got == exp, s"first diff: ${
      exp.collect { case (k, v) if got.get(k) != Some(v) =>
        (k, got.get(k), v) }.take(2)}")
    // survival is a non-increasing curve in (0, 1] until extinction
    got.groupBy(_._1._1).foreach { case (_, seg) =>
      val surv = seg.toSeq.sortBy(_._1._2).map(_._2._4)
      assert(surv.zip(surv.tail).forall { case (a, b) => b <= a + 1e-9 })
      assert(surv.head <= 1.0 && surv.forall(_ >= 0.0))
    }
  }

  test("v5: log-rank O-E and variance match an independent fold per segment") {
    val rows = Tables.customer(spark, dir)
      .filter(col("c_custkey") <= 2000)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_nationkey"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2).toLong))
    val exp = rows.groupBy(_._1).map { case (seg, cs) =>
      val subj = cs.map { case (_, k, n) => (k % 97, k % 2 == 0, n % 2) }
      val times = subj.map(_._1).distinct.sorted
      var n1 = subj.count(_._3 == 0L).toLong
      var n2 = subj.count(_._3 == 1L).toLong
      var (sumD1, sumD2, ome, vsum) = (0L, 0L, 0L, 0L)
      times.foreach { t =>
        val here = subj.filter(_._1 == t)
        val d1 = here.count(s => s._2 && s._3 == 0L).toLong
        val d2 = here.count(s => s._2 && s._3 == 1L).toLong
        val (d, n) = (d1 + d2, n1 + n2)
        if (d > 0) {
          sumD1 += d1; sumD2 += d2
          ome += d1 * 1000000L -
            math.round(d.toDouble * n1 / n * 1e6)
          if (n > 1) vsum += math.round(d.toDouble * n1 * n2 * (n - d) /
            (n.toDouble * n * (n - 1)) * 1e6)
        }
        n1 -= here.count(_._3 == 0L); n2 -= here.count(_._3 == 1L)
      }
      val chi2 = if (vsum > 0)
        Some(round6((ome / 1e6) * (ome / 1e6) / (vsum / 1e6))) else None
      seg -> ((sumD1, sumD2, ome, vsum, chi2))
    }
    val got = graft.queries.Survival.v5LogRank(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
    assert(got == exp, s"first diff: ${
      exp.collect { case (k, v) if got.get(k) != Some(v) =>
        (k, got.get(k), v) }.take(2)}")
    assert(got.values.forall(_._5.isDefined), "variance must be positive here")
  }

  test("v6: RMST equals the exact area under the v4 step curve") {
    val km = graft.queries.Survival.v4KaplanMeier(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(5)))
    val exp = km.groupBy(_._1).map { case (seg, rows) =>
      val byT = rows.sortBy(_._2)
      val head = byT.head._2 * 1000000L // S=1 before the first event
      val auc = byT.zipAll(byT.tail.map(Some(_)), null, None).map {
        case ((_, t, s), next) =>
          val nt = next.map(_._2).getOrElse(97L)
          math.round(s * 1e6) * (nt - t)
      }.sum
      seg -> ((byT.head._2, byT.size.toLong, 97L,
        round6((head + auc).toDouble / 1e6)))
    }
    val got = graft.queries.Survival.v6Rmst(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    assert(got == exp, s"diff: ${exp.collect {
      case (k, v) if got.get(k) != Some(v) => (k, got.get(k), v) }.take(2)}")
    // RMST is bounded by the horizon and positive
    assert(got.values.forall(v => v._4 > 0 && v._4 <= 97.0))
  }

  test("d19: bloom gate prunes novel arrivals and never drops a true dup") {
    import spark.implicits._
    import org.apache.spark.sql.graftfn.GraftExpressions.{bloomAgg, bloomMightContain}
    // crafted corpus: 200 standing docs, 100 arrivals of which 10 are
    // exact dups (after whitespace normalization) and 90 are novel
    val standing = (1 to 200).map(i => (i.toLong, s"standing doc body $i", false))
    val dups = (1 to 10).map(i => (1000L + i, s"  STANDING   doc body ${i * 7}  ", true))
    val novel = (1 to 90).map(i => (2000L + i, s"completely fresh arrival $i", true))
    val docs = (standing ++ dups ++ novel).toDF("doc_id", "text", "is_new")
    val got = graft.queries.Ingest.bloomDedupOf(docs)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2)))).toMap
    val expDup = dups.map(_._1).toSet
    assert(got.keySet == (dups ++ novel).map(_._1).toSet)
    got.foreach { case (id, (dup, adm)) =>
      assert(dup == expDup.contains(id), s"doc $id exact_dup=$dup")
      assert(adm == !dup, s"doc $id admitted=$adm")
    }
    // the gate must PRUNE: rebuild the sketch exactly as the operator
    // does and count the might-contain fraction of the arrivals
    def norm(s: String) = s.trim.toLowerCase.replaceAll("\\s+", " ")
    val standingH = standing.map(d => Tuple1(md5hex7(norm(d._2)))).toDF("h").distinct()
    val sketch = standingH.agg(bloomAgg(col("h"), 200)).head().getAs[Array[Byte]](0)
    val arrivalH = (dups ++ novel).map(d => Tuple1(md5hex7(norm(d._2)))).toDF("h")
    val hits = arrivalH.filter(bloomMightContain(sketch, col("h"))).count()
    assert(hits >= 10, "no false negatives: every dup hash must probe true")
    assert(hits <= 30, s"bloom must prune most novel arrivals, hits=$hits/100")
  }

  test("s16: int8 quantization, integer ADC rank, and audit bits match an independent fold") {
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val d = vecs.head._2.length
    val mn = (0 until d).map(i => vecs.values.map(_(i)).min)
    val mx = (0 until d).map(i => vecs.values.map(_(i)).max)
    def quant(v: Array[Double]): Array[Long] =
      (0 until d).map(i => if (mx(i) > mn(i))
        math.round((v(i) - mn(i)) * 255.0 / (mx(i) - mn(i))) else 0L).toArray
    val qs = vecs.view.mapValues(quant).toMap
    def dotq(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      val num = a.zip(b).map { case (x, y) => x * y }.sum
      num / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val exp = vecs.keys.filter(_ < 10).map { q =>
      val ann = vecs.keys.filter(_ != q).toSeq
        .sortBy(v => (-dotq(qs(q), qs(v)), v)).take(5)
      val exact = vecs.keys.filter(_ != q).toSeq
        .sortBy(v => (-BigDecimal(cosine(vecs(q), vecs(v)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP), v)).take(5)
      q -> ((ann.head, exact.head, ann.head == exact.head,
        ann.toSet.intersect(exact.toSet).size.toLong))
    }.toMap
    val got = graft.queries.Embeddings.s16Sq8Agreement(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4)))).toMap
    assert(got == exp, s"diff: ${exp.collect {
      case (k, v) if got.get(k) != Some(v) => (k, got.get(k), v) }.take(2)}")
    assert(got.values.forall(v => v._4 >= 0 && v._4 <= 5))
  }

  test("q30: the NOT IN null trap fires — zero rows vs the NOT EXISTS form") {
    val r = graft.queries.Relational.q30SubquerySemantics(spark, dir)
      .collect().head
    val (nIn, nExists, nNotInNull, nNotExists, nNotInClean) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nIn == nExists, "IN and EXISTS agree on the positive side")
    assert(nNotInNull == 0L,
      "NOT IN over a null-bearing set is UNKNOWN for every probe")
    assert(nNotExists > 0L && nNotInClean == nNotExists,
      "NOT EXISTS keeps rows; clean NOT IN equals it")
    assert(nIn + nNotExists ==
      Tables.orders(spark, dir).count(), "partition of the orders table")
  }

  test("t20: every injected noise channel is found by the real regex scan") {
    val got = graft.queries.TextDedup.t20EncodingSanity(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(6), r.getLong(7),
        r.getLong(8), r.getDouble(9), r.getBoolean(10)))).toMap
    got.foreach { case (id, (nonAscii, ctrl, repl, ent, ok)) =>
      assert((ctrl > 0) == (id % 11 == 0), s"doc $id control")
      assert((repl == 2) == (id % 13 == 0) && (repl == 0 || repl == 2),
        s"doc $id replacement")
      if (id % 7 == 0) assert(nonAscii >= 3, s"doc $id non-ascii")
      if (id % 11 == 0 || id % 13 == 0) assert(!ok, s"doc $id must flag")
      assert(ent >= 0.0, s"doc $id entropy")
    }
    assert(got.exists(_._2._5), "clean docs must pass")
    assert(got.exists(!_._2._5), "noisy docs must fail")
  }

  test("d19: bloom sketches of two increments merge to the one-shot corpus sketch") {
    import spark.implicits._
    import org.apache.spark.sql.graftfn.GraftExpressions.{bloomAgg, bloomMightContain}
    val total = 400L
    val a = (1 to 200).map(i => Tuple1(s"key-a-$i")).toDF("h")
    val b = (1 to 200).map(i => Tuple1(s"key-b-$i")).toDF("h")
    def sketchOf(df: org.apache.spark.sql.DataFrame): Array[Byte] =
      df.agg(bloomAgg(col("h"), total)).head().getAs[Array[Byte]](0)
    def deser(bytes: Array[Byte]) =
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bytes))
    // sized identically, union-of-sketches IS the sketch-of-union:
    // bitwise OR — the property that makes the d19 asset incrementally
    // maintainable (admit a batch, OR in its sketch; never rebuild)
    val merged = deser(sketchOf(a))
    merged.mergeInPlace(deser(sketchOf(b)))
    val bos = new java.io.ByteArrayOutputStream()
    merged.writeTo(bos)
    val oneShot = sketchOf(a.union(b))
    assert(java.util.Arrays.equals(bos.toByteArray, oneShot),
      "merged increment sketches must equal the one-shot corpus sketch")
    // and the merged sketch still has no false negatives + still prunes
    val members = a.union(b)
    assert(members.filter(bloomMightContain(oneShot, col("h"))).count() == 400L)
    val novel = (1 to 400).map(i => Tuple1(s"novel-$i")).toDF("h")
    val fp = novel.filter(bloomMightContain(oneShot, col("h"))).count()
    assert(fp <= 40, s"merged sketch must keep pruning, fp=$fp/400")
  }

  private def md5hex7(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("v7: Greenwood band matches an independent fold and brackets the curve") {
    val rows = Tables.customer(spark, dir)
      .filter(col("c_custkey") <= 2000)
      .select(col("c_mktsegment"), col("c_custkey")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val exp = rows.groupBy(_._1).flatMap { case (seg, cs) =>
      val subj = cs.map { case (_, k) => (k % 97, k % 2 == 0) }
      val byT = subj.groupBy(_._1).view
        .mapValues(v => (v.count(_._2).toLong, v.size.toLong)).toMap
      var atRisk = subj.size.toLong
      var (acc, gw) = (0L, 0L)
      var extinct = false
      byT.keys.toSeq.sorted.flatMap { t =>
        val (d, m) = byT(t)
        if (d < atRisk) {
          acc += math.round(math.log((atRisk - d).toDouble / atRisk) * 1e6)
          val den = atRisk * (atRisk - d)
          gw += (d * 1000000000L + den / 2) / den
        } else extinct = true
        val out = if (d > 0) {
          val s = if (extinct) 0.0 else round6(math.exp(acc.toDouble / 1e6))
          val se = if (extinct) 0.0 else round6(s * math.sqrt(gw.toDouble / 1e9))
          Some((seg, t) -> ((d, atRisk, s, se,
            round6(math.max(s - 1.96 * se, 0.0)),
            round6(math.min(s + 1.96 * se, 1.0)))))
        } else None
        atRisk -= m
        out
      }
    }
    val got = graft.queries.Survival.v7GreenwoodCi(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7)))).toMap
    assert(got == exp, s"first diff: ${exp.collect {
      case (k, v) if got.get(k) != Some(v) => (k, got.get(k), v) }.take(2)}")
    got.values.foreach { case (_, _, s, se, lo, hi) =>
      assert(lo <= s && s <= hi && se >= 0.0)
    }
    assert(got.values.exists(_._4 > 0.0), "a non-degenerate band must exist")
  }

  test("t18: within-doc repeated chunks count instances, not hashes") {
    import spark.implicits._
    val c1 = (1 to 32).map("a" + _).mkString(" ")
    val c2 = (1 to 32).map("b" + _).mkString(" ")
    // doc 1: c1 c1 c2 → 3 chunks, c1 repeated (2 instances)
    // doc 2: unique chunks only
    val docs = Seq((1L, s"$c1 $c1 $c2"),
      (2L, (1 to 64).map("u" + _).mkString(" "))).toDF("doc_id", "text")
    val got = graft.queries.TextDedup.t18IntradocRepOf(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    assert(got(1L) == ((3L, 2L, 2L, round6(2.0 / 3))), s"doc1=${got(1L)}")
    assert(got(2L) == ((2L, 2L, 0L, 0.0)), s"doc2=${got(2L)}")
  }

  test("v8: life table matches an independent actuarial fold; entrants telescope") {
    val rows = Tables.customer(spark, dir)
      .filter(col("c_custkey") <= 2000)
      .select(col("c_mktsegment"), col("c_custkey")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val exp = rows.groupBy(_._1).flatMap { case (seg, cs) =>
      val subj = cs.map { case (_, k) => ((k % 97) / 10, k % 2 == 0) }
      val byBin = subj.groupBy(_._1).view.mapValues { v =>
        (v.count(_._2).toLong, v.count(!_._2).toLong, v.size.toLong)
      }.toMap
      var nEnter = subj.size.toLong
      var acc = 0L
      var extinct = false
      byBin.keys.toSeq.sorted.map { b =>
        val (d, w, m) = byBin(b)
        val nEffX2 = nEnter * 2 - w
        val qMicro = (d * 2000000L + nEffX2 / 2) / nEffX2
        val pMicro = 1000000L - qMicro
        if (pMicro > 0)
          acc += math.round(math.log(pMicro.toDouble / 1e6) * 1e6)
        else extinct = true
        val out = (seg, b) -> ((b * 10, b * 10 + 10, nEnter, d, w,
          round6(qMicro.toDouble / 1e6),
          if (extinct) 0.0 else round6(math.exp(acc.toDouble / 1e6))))
        nEnter -= m
        out
      }
    }
    val got = graft.queries.Survival.v8LifeTable(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getDouble(7), r.getDouble(8)))).toMap
    assert(got == exp, s"first diff: ${exp.collect {
      case (k, v) if got.get(k) != Some(v) => (k, got.get(k), v) }.take(2)}")
    // survival is non-increasing within each segment
    got.groupBy(_._1._1).foreach { case (_, m) =>
      val curve = m.toSeq.sortBy(_._1._2).map(_._2._7)
      assert(curve.zip(curve.tail).forall { case (a, b) => b <= a })
    }
  }

  test("p15: each source admits its own best tokens; the straddler is kept") {
    val got = graft.queries.TextDedup.p15SourceQuota(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getInt(3), r.getLong(4)))
    // independent fold: per source, quality-desc cumulative admission
    val quality = graft.queries.TextDedup.t4QualityScore(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("quality")).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    val src = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val exp = src.groupBy(_._2).toSeq.flatMap { case (s, ds) =>
      var cum = 0L
      ds.map(_._1).sortBy(id => (-quality(id)._2, id)).flatMap { id =>
        val (nt, q) = quality(id)
        val out = if (cum < 500) Some((s, id, q, nt, cum)) else None
        cum += nt
        out
      }
    }.toSet
    assert(got.toSet == exp, s"diff: ${(exp -- got.toSet).take(2)} / ${(got.toSet -- exp).take(2)}")
    // every source admits at least its best doc; the quota bites exactly
    // when some source's token total exceeds it (guaranteed at the gate
    // scale — asserted there by the 183-of-500 oracle row count)
    val bySrc = got.groupBy(_._1)
    assert(bySrc.keySet == src.map(_._2).toSet)
    val srcTotals = src.groupBy(_._2).view
      .mapValues(_.map(d => quality(d._1)._1.toLong).sum)
    if (srcTotals.exists(_._2 > 500))
      assert(got.size < src.size, "quota must reject at least one doc")
    // straddler: last admitted doc's cum_before < 500 even if its own
    // tokens push past the budget
    bySrc.values.foreach { rows =>
      assert(rows.forall(_._5 < 500))
    }
  }

  test("v9: Aalen–Johansen CIFs match an independent fold; curves are monotone and bounded") {
    val rows = Tables.customer(spark, dir)
      .filter(col("c_custkey") <= 2000)
      .select(col("c_mktsegment"), col("c_custkey")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val exp = rows.groupBy(_._1).flatMap { case (seg, cs) =>
      val subj = cs.map { case (_, k) =>
        (k % 97, if (k % 4 == 0) 1 else if (k % 4 == 2) 2 else 0)
      }
      val byT = subj.groupBy(_._1).view.mapValues { v =>
        (v.count(_._2 == 1).toLong, v.count(_._2 == 2).toLong, v.size.toLong)
      }.toMap
      var atRisk = subj.size.toLong
      var acc = 0L
      var extinct = false
      var (cif1, cif2) = (0L, 0L)
      byT.keys.toSeq.sorted.flatMap { t =>
        val (d1, d2, m) = byT(t)
        val d = d1 + d2
        val sPrev = if (extinct) 0.0 else math.exp(acc.toDouble / 1e6)
        cif1 += math.round(sPrev * d1.toDouble / atRisk * 1e6)
        cif2 += math.round(sPrev * d2.toDouble / atRisk * 1e6)
        if (d < atRisk)
          acc += math.round(math.log((atRisk - d).toDouble / atRisk) * 1e6)
        else if (d > 0) extinct = true
        val out = if (d > 0)
          Some((seg, t) -> ((d1, d2, atRisk,
            round6(cif1.toDouble / 1e6), round6(cif2.toDouble / 1e6))))
        else None
        atRisk -= m
        out
      }
    }
    val got = graft.queries.Survival.v9CompetingRisks(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(got == exp, s"first diff: ${exp.collect {
      case (k, v) if got.get(k) != Some(v) => (k, got.get(k), v) }.take(2)}")
    got.groupBy(_._1._1).foreach { case (_, m) =>
      val ordered = m.toSeq.sortBy(_._1._2).map(_._2)
      val (c1, c2) = (ordered.map(_._4), ordered.map(_._5))
      assert(c1.zip(c1.tail).forall { case (a, b) => b >= a })
      assert(c2.zip(c2.tail).forall { case (a, b) => b >= a })
      // the two incidences never account for more than the whole cohort
      ordered.foreach { o => assert(o._4 + o._5 <= 1.0 + 1e-6) }
    }
    // both causes must actually occur somewhere
    assert(got.values.exists(_._1 > 0) && got.values.exists(_._2 > 0))
  }

  test("v11: quartile crossings invert the v4 curve; sentinels for never-crossed") {
    val km = graft.queries.Survival.v4KaplanMeier(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(5)))
    val exp = (for {
      seg <- km.map(_._1).distinct
      q <- Seq(0.75, 0.50, 0.25)
    } yield {
      val crossed = km.filter(r => r._1 == seg && r._3 <= q)
      val cell = if (crossed.isEmpty) (-1L, -1.0)
      else { val first = crossed.minBy(_._2); (first._2, first._3) }
      (seg, q) -> cell
    }).toMap
    val got = graft.queries.Survival.v11MedianSurvival(spark, dir)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == exp, s"first diff: ${exp.collect {
      case (k, v) if got.get(k) != Some(v) => (k, got.get(k), v) }.take(2)}")
    // the probe must carry signal: some quartile crossed, and the
    // crossing time is non-decreasing as the level drops
    assert(got.values.exists(_._1 >= 0))
    exp.keys.map(_._1).foreach { seg =>
      val ts = Seq(0.75, 0.50, 0.25).map(q => got((seg, q))._1)
        .filter(_ >= 0)
      assert(ts.zip(ts.tail).forall { case (a, b) => b >= a },
        s"$seg crossing times must be monotone: $ts")
    }
  }

  test("t22: sketch estimates are exact below capacity and merge associatively") {
    import spark.implicits._
    val got = graft.queries.TextDedup.t22HeavyHitters(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(got.length == 10)
    // below eviction capacity the frequent-items estimate IS the count
    got.foreach { case (tok, exact, est, ok) =>
      assert(est == exact && ok, s"$tok: est $est != exact $exact")
    }
    // independent exact fold from the raw text
    val trueCounts = Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.col("text"))
      .collect().flatMap(_.getString(0).trim.toLowerCase(
        java.util.Locale.ROOT).split("\\s+"))
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    got.foreach { case (tok, exact, _, _) =>
      assert(trueCounts(tok) == exact, s"$tok exact fold mismatch")
    }
    // mergeability: per-half accumulate → combine → estimate ≡ one-shot
    val docs = Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.trim(
              org.apache.spark.sql.functions.lower(
                org.apache.spark.sql.functions.col("text"))), "\\s+"))
          .as("token"))
    docs.createOrReplaceTempView("t22_toks")
    val merged = spark.sql(
      """SELECT approx_top_k_estimate(
        |  approx_top_k_combine(sk, 4096), 40) AS tops FROM (
        |  SELECT approx_top_k_accumulate(token, 4096) AS sk
        |  FROM t22_toks GROUP BY doc_id % 2)""".stripMargin)
      .selectExpr("explode(tops) AS e")
      .selectExpr("e.item AS token", "e.count AS n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oneShot = spark.sql(
      """SELECT approx_top_k_estimate(
        |  approx_top_k_accumulate(token, 4096), 40) AS tops
        |FROM t22_toks""".stripMargin)
      .selectExpr("explode(tops) AS e")
      .selectExpr("e.item AS token", "e.count AS n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == oneShot, "split-merge sketch must equal one-shot")
    assert(oneShot.nonEmpty)
  }

  test("s19: every filtered neighbour shares the query's namespace; the filter bites") {
    import org.apache.spark.sql.functions.col
    val labels = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = graft.queries.Embeddings.s19FilteredAnn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (q, _, v) =>
      assert(labels(v) == labels(q), s"neighbour $v outside query $q's namespace")
    }
    // pre-filter vs unfiltered: some query's top-3 must actually change
    val unfiltered = graft.queries.Embeddings.s1CosineTopK(spark, dir)
      .filter(col("rk") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.toSet != unfiltered, "the namespace filter must carry signal")
  }

  test("m12: decoded channel sums equal the generator formula, pixel for pixel") {
    val got = graft.multimodal.Multimodal.m12ColorStats(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7))))
    assert(got.nonEmpty)
    got.foreach { case (id, (w, h, sr, sg, sb, mean)) =>
      assert(w == 1 + id % 64 && h == 1 + id % 48, s"dims of $id")
      // independent fold straight from the pixel formula — decoder-free
      var (er, eg, eb) = (0L, 0L, 0L)
      for (y <- 0L until h; x <- 0L until w) {
        val v = (id * 31 + y * w + x) & 0xffffff
        er += (v >> 16) & 0xff; eg += (v >> 8) & 0xff; eb += v & 0xff
      }
      assert((sr, sg, sb) == ((er, eg, eb)), s"sums of $id")
      assert(mean >= 0.0 && mean <= 255.0)
    }
    // only stills appear; each doc exactly once
    assert(got.map(_._1).distinct.length == got.length)
    assert(got.forall(_._1 % 3 != 2))
  }

  test("p18: contamination only ever marks train docs, and it blocks the release keep") {
    val rows = graft.queries.TextDedup.p18CleanRelease(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4)))
    // d10's contaminated side is by construction the train split
    rows.filter(_._3).foreach { r =>
      assert(r._2 == "train", s"contaminated non-train doc: $r")
    }
    // keep = curation_keep ∧ ¬contaminated, row by row
    rows.foreach { r => assert(r._5 == (r._4 && !r._3), s"keep rule: $r") }
    // the channel must carry signal on the harness corpus: at least one
    // doc the curation kept is blocked by contamination alone
    assert(rows.exists(r => r._4 && r._3),
      "corpus must exercise the contamination-only rejection")
  }

  test("d20: integer PageRank matches an independent 3-iteration fold") {
    def halfUp(a: Long, b: Long): Long = (a + b / 2) / b
    val pairs = graft.queries.TextDedup.d6NgramJaccard(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = edges.groupBy(_._1).map { case (v, es) => v -> es.length.toLong }
    val n = deg.size.toLong
    var pr: Map[Long, Long] = deg.map { case (v, _) => v -> halfUp(1000000L, n) }.toMap
    for (_ <- 1 to 3) {
      val share = pr.map { case (v, p) => v -> halfUp(p, deg(v)) }
      val inflow = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => share(e._1)).sum
      }
      pr = pr.map { case (v, _) =>
        v -> (halfUp(150000L, n) + (inflow.getOrElse(v, 0L) * 85L + 50L) / 100L)
      }
    }
    val expTop = pr.toSeq.map { case (v, p) => (v, deg(v), p) }
      .sortBy { case (v, _, p) => (-p, v) }.take(50)
    val got = graft.queries.TextDedup.d20DupPagerank(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expTop, s"first got=${got.take(3).toSeq} want=${expTop.take(3)}")
    // damping floor: every rank strictly exceeds the teleport base
    assert(got.forall(_._3 > halfUp(150000L, n)))
    assert(got.nonEmpty)
  }

  test("p17: DSIR ranks val-split docs above train docs on average; fold matches") {
    import org.apache.spark.sql.functions.{col, avg}
    val scores = graft.queries.TextDedup.dsirScoresOf(Tables.documents(spark, dir))
    val bySplit = scores.groupBy(col("split"))
      .agg(avg(col("llr_micro")).as("mean_llr"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // the target LM was trained on 'val': val docs must look more
    // target-like than source-like, and more so than train docs do
    assert(bySplit("val") > 0, s"val mean llr must be positive: $bySplit")
    assert(bySplit("val") > bySplit("train"), s"ordering violated: $bySplit")
    // independent driver-side fold of the full two-LM arithmetic
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def bucket(text: String): Int = {
      val norm = text.trim.toLowerCase(java.util.Locale.ROOT)
        .replaceAll("\\s+", " ")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(norm.getBytes("UTF-8"))
      (((md(0) & 0xff) << 8) | (md(1) & 0xff)) % 100
    }
    val tagged = docs.map { case (id, text) =>
      val b = bucket(text)
      val sp = if (b < 80) "train" else if (b < 90) "val" else "test"
      val toks = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
      (id, sp, toks)
    }
    def lm(sp: String) = {
      val grams = tagged.filter(_._2 == sp)
        .flatMap(d => d._3.sliding(2).filter(_.length == 2)
          .map(p => p(0) + " " + p(1)))
      val cb = grams.groupBy(identity).map { case (g, xs) => g -> xs.length.toLong }
      val cw = cb.groupBy(_._1.split(" ")(0)).map { case (w, m) => w -> m.values.sum }
      val v = tagged.filter(_._2 == sp).flatMap(_._3).distinct.length.toLong
      (cb, cw, v)
    }
    val (cbS, cwS, vS) = lm("train")
    val (cbT, cwT, vT) = lm("val")
    def lnp(cb: Map[String, Long], cw: Map[String, Long], v: Long)(g: String): Long = {
      val w1 = g.split(" ")(0)
      math.round((math.log(cb.getOrElse(g, 0L).toDouble + 1.0)
        - math.log(cw.getOrElse(w1, 0L).toDouble + v.toDouble)) * 1e6)
    }
    val exp = tagged.filter(_._3.length >= 2).map { case (id, sp, toks) =>
      val grams = toks.sliding(2).map(p => p(0) + " " + p(1)).toSeq
      val llr = grams.map(g => lnp(cbT, cwT, vT)(g) - lnp(cbS, cwS, vS)(g)).sum
      (id, sp, grams.size.toLong, llr)
    }.sortBy { case (id, _, _, llr) => (-llr, id) }.take(100)
    val got = graft.queries.TextDedup.p17DsirSelect(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == exp.toSeq,
      s"first got=${got.take(2).toSeq} want=${exp.take(2)}")
  }
}
