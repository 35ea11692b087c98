package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 session operators, batch 2 (t31 Heaps'-law fit, p31
  * data-constrained repeat schedule, e34 diurnal autocorrelation, s28
  * embedding anisotropy, m17 aspect buckets): from-scratch driver-side
  * twins plus the analytic invariants each metric must obey — the
  * independent-recomputation layer the oracle hash can't localize.
  */
class Round11OpsSpec3 extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def toksOf(text: String): Array[String] =
    text.trim.toLowerCase.split("\\s+")

  test("t31: fit matches a from-scratch driver-side twin; beta in (0,1]") {
    val got = graft.queries.TextDedup.t31HeapsLaw(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val expected = docs.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (src, rows) =>
        val seen = scala.collection.mutable.Set.empty[String]
        var cumT = 0L
        val xs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        rows.sortBy(_._2).foreach { case (_, _, text) =>
          val ts = toksOf(text)
          cumT += ts.length
          ts.foreach(seen.add)
          xs += ((cumT, seen.size.toLong))
        }
        val xy = xs.filter(p => p._1 > 0 && p._2 > 0).map { case (n, v) =>
          (math.round(math.log(n.toDouble) * 1e6),
            math.round(math.log(v.toDouble) * 1e6))
        }
        val n = BigInt(xy.length)
        val sx = xy.map(p => BigInt(p._1)).sum
        val sy = xy.map(p => BigInt(p._2)).sum
        val sxy = xy.map(p => BigInt(p._1) * p._2).sum
        val sxx = xy.map(p => BigInt(p._1) * p._1).sum
        val den = n * sxx - sx * sx
        val beta = ((n * sxy - sx * sy) * 1000000 + den / 2) / den
        val lnk = (sxx * sy - sx * sxy + den / 2) / den
        (src, xy.length.toLong, beta.toLong.toDouble / 1e6,
          lnk.toLong.toDouble / 1e6)
    }
    assert(got == expected, s"got $got\nexpected $expected")
    // V(n) is non-decreasing, so the fitted slope is never negative; a
    // tiny source whose later docs mint no new types can legitimately
    // read beta = 0, and snapping noise on 2-point fits can nudge past
    // 1, so the invariant is one-sided.
    got.foreach { case (src, _, beta, _) =>
      assert(beta >= 0.0, s"$src beta=$beta")
    }
    // the harness corpus re-draws from a ~30-type shared vocabulary, so
    // V saturates after the first docs and betas sit near 0 (a natural
    // corpus reads 0.7–0.9); the theorem is only the [0, 1] range
    val big = got.filter(_._2 >= 10)
    assert(big.nonEmpty && big.forall(r => r._3 >= 0.0 && r._3 <= 1.0),
      s"large-sample betas must sit in [0,1]: $big")
  }

  test("p31: repeat schedule matches the shared multiplier table exactly") {
    val got = graft.queries.TextDedup.p31RepeatSchedule(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.nonEmpty)
    val f = graft.queries.TextDedup.p31EffMicro.toMap
    got.foreach { case (src, r, u, budget, eff, ratio) =>
      assert(budget == u * r, s"$src budget")
      val expEff = ((BigInt(u) * f(r.toInt) + 500000) / 1000000).toLong
      assert(eff == expEff, s"$src r=$r eff $eff vs $expEff")
      val expRatio =
        ((BigInt(eff) * 1000000 + budget / 2) / budget).toLong / 1e6
      assert(ratio == expRatio, s"$src r=$r ratio")
    }
    // R = 1 is exactly the unique data; marginal value only decays
    got.groupBy(_._1).foreach { case (src, rows) =>
      val byR = rows.map(r => r._2 -> r._5).toMap
      assert(byR(1L) == rows.head._3, s"$src eff(1) != U")
      val ratios = rows.sortBy(_._2).map(_._6).toSeq
      assert(ratios == ratios.sorted.reverse, s"$src ratio must decay")
    }
  }

  test("e34: autocorrelation matches a driver-side integer-moment twin") {
    val got = graft.queries.Events.e34DiurnalAutocorr(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2),
        r.getLong(3), r.getDouble(4), r.getBoolean(5))).toSeq
    val ev = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val counts = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val h0 = ev.map(_._2).min
    val h1 = ev.map(_._2).max
    val expected = ev.map(_._1).distinct.sorted.map { et =>
      val xs = (h0 to h1).map(h => counts.getOrElse((et, h), 0L))
      val pairs = xs.dropRight(24).zip(xs.drop(24))
      val n = BigInt(pairs.length)
      val sx = pairs.map(p => BigInt(p._1)).sum
      val sy = pairs.map(p => BigInt(p._2)).sum
      val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
      val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
      val syy = pairs.map(p => BigInt(p._2) * p._2).sum
      val denx = n * sxx - sx * sx
      val deny = n * syy - sy * sy
      val defined = denx > 0 && deny > 0
      val rMicro = if (!defined) 0L
        else math.round((n * sxy - sx * sy).toDouble * 1e6
          / (math.sqrt(denx.toDouble) * math.sqrt(deny.toDouble)))
      (et, pairs.length.toLong, defined, rMicro,
        math.round(rMicro.toDouble / 1e6 * 1e6) / 1e6.toDouble,
        defined && rMicro >= 300000L)
    }.toSeq
    assert(got == expected, s"got $got\nexpected $expected")
    got.foreach { case (et, _, defined, rMicro, _, _) =>
      if (defined)
        assert(rMicro.abs <= 1000000L, s"$et |r| must be <= 1")
    }
  }

  test("e34: a synthetic 24h-periodic stream reads r = 1, a flat one undefined") {
    import spark.implicits._
    // periodic: counts cycle 1,2,...,24 across 72 hours; flat: constant
    val base = 1700000000000000L
    val rows = (0 until 72).flatMap { h =>
      val burst = 1 + (h % 24)
      (0 until burst).map(i =>
        (h.toLong * 100 + i, base + h.toLong * 3600000000L + i, 1L,
          "periodic", 0.0, "{}")) ++
        Seq((100000L + h, base + h.toLong * 3600000000L, 2L, "flat", 0.0, "{}"))
    }
    val df = rows.toDF("event_id", "ts_us", "user_id", "event_type",
        "value", "props")
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    val tmp = java.nio.file.Files.createTempDirectory("e34spec")
    df.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = graft.queries.Events.e34DiurnalAutocorr(spark, tmp.toString)
      .collect()
      .map(r => r.getString(0) -> (r.getBoolean(2), r.getLong(3))).toMap
    assert(got("periodic") == ((true, 1000000L)), s"periodic: $got")
    assert(got("flat")._1 == false, s"flat series must be undefined: $got")
  }

  test("e35: lag-24 leg equals e34 exactly; all lags match the integer twin") {
    val got = graft.queries.Events.e35LagSweep(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4), r.getDouble(5))).toSeq
    val e34 = graft.queries.Events.e34DiurnalAutocorr(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2),
        r.getLong(3)))).toMap
    got.filter(_._2 == 24L).foreach { case (et, _, n, d, rm, _) =>
      assert(e34(et) == ((n, d, rm)), s"$et lag-24 leg must equal e34")
    }
    val ev = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val counts = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val h0 = ev.map(_._2).min
    val h1 = ev.map(_._2).max
    val expected = (for {
      et <- ev.map(_._1).distinct.sorted
      lag <- Seq(1, 12, 24, 168)
    } yield {
      val xs = (h0 to h1).map(h => counts.getOrElse((et, h), 0L))
      val pairs = xs.dropRight(lag).zip(xs.drop(lag))
      val n = BigInt(pairs.length)
      val sx = pairs.map(p => BigInt(p._1)).sum
      val sy = pairs.map(p => BigInt(p._2)).sum
      val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
      val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
      val syy = pairs.map(p => BigInt(p._2) * p._2).sum
      val denx = n * sxx - sx * sx
      val deny = n * syy - sy * sy
      val defined = denx > 0 && deny > 0
      val rMicro = if (!defined) 0L
        else math.round((n * sxy - sx * sy).toDouble * 1e6
          / (math.sqrt(denx.toDouble) * math.sqrt(deny.toDouble)))
      (et, lag.toLong, pairs.length.toLong, defined, rMicro,
        math.round(rMicro.toDouble / 1e6 * 1e6) / 1e6.toDouble)
    }).toSeq
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("s28: anisotropy matches a BigInt twin and stays in [0,1]") {
    val got = graft.queries.Embeddings.s28Anisotropy(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    val em = Tables.embeddings(spark, dir)
      .select(col("label"), col("embedding")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray
        .map(x => math.round(x.toDouble * 1e6)))
    val expected = em.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (label, vs) =>
        val dims = vs.head._2.length
        val s2 = (0 until dims).map { d =>
          val sd = vs.map(v => BigInt(v._2(d))).sum
          sd * sd
        }.sum
        val sumsq = vs.flatMap(_._2).map(x => BigInt(x) * x).sum
        val n = BigInt(vs.length)
        val aniso = (s2 * 1000000 + (n * sumsq) / 2) / (n * sumsq)
        (label, vs.length.toLong, aniso.toLong.toDouble / 1e6)
    }
    assert(got == expected, s"got $got\nexpected $expected")
    got.foreach { case (l, _, a) =>
      assert(a >= 0.0 && a <= 1.0, s"label $l anisotropy $a")
    }
  }

  test("t32: Simpson matches a BigInt twin; eff_vocab bounded by vocab") {
    val got = graft.queries.TextDedup.t32SimpsonDiversity(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (src, rows) =>
        val counts = rows.flatMap(r => toksOf(r._2))
          .groupBy(identity).values.map(_.length.toLong)
        val n = counts.sum
        val s = counts.map(c => BigInt(c) * (c - 1)).sum
        val d = BigInt(n) * (n - 1)
        val simpson = ((s * 1000000 + d / 2) / d).toLong / 1e6
        val eff = ((d * 1000000 + s / 2) / s).toLong / 1e6
        (src, n, counts.size.toLong,
          math.round(simpson * 1e6) / 1e6.toDouble,
          math.round(eff * 1e6) / 1e6.toDouble)
    }
    assert(got == expected, s"got $got\nexpected $expected")
    // the UNBIASED inverse Simpson is not bounded by the observed
    // vocabulary (all-c=2 corpora read 2V−1); only positivity and the
    // λ probability range are theorems here
    got.foreach { case (src, _, _, simpson, eff) =>
      assert(simpson >= 0.0 && simpson <= 1.0, s"$src simpson")
      assert(eff >= 1.0, s"$src eff_vocab")
    }
  }

  test("s29: balance audit matches a twin over the gated codes table") {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding")).persist()
    emb.count()
    val codes = graft.queries.Embeddings.pqCodesOf(emb)
      .collect().map(r => (r.getAs[Number](1).intValue,
        r.getAs[Number](2).intValue))
    val labels = Tables.embeddings(spark, dir).select(col("label"))
      .distinct().collect().map(_.getInt(0)).toSet
    val got = graft.queries.Embeddings.s29CodeBalance(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6))).toSeq
    val expected = (0 until 4).map { sub =>
      val cs = codes.filter(_._1 == sub).map(_._2)
      val byCode = labels.toSeq.map(l => cs.count(_ == l).toLong)
      val nVec = byCode.sum
      val k = labels.size.toLong
      val ss = byCode.map(c => BigInt(c * k - nVec).pow(2)).sum
      val chi2 = ((ss * 1000000 + BigInt(nVec * k) / 2) / BigInt(nVec * k))
        .toLong / 1e6
      val top = byCode.max
      val topShare =
        ((BigInt(top) * 1000000 + nVec / 2) / BigInt(nVec)).toLong / 1e6
      (sub, nVec, k, byCode.count(_ > 0).toLong,
        math.round(chi2 * 1e6) / 1e6.toDouble,
        math.round(topShare * 1e6) / 1e6.toDouble, top * k <= nVec * 2)
    }
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("m18: bit balance matches a twin over the phash asset") {
    val hashes = graft.multimodal.Multimodal.phashAsset(spark, dir)
      .collect().map(_.getString(1))
    assert(hashes.nonEmpty && hashes.forall(_.length == 64))
    val got = graft.multimodal.Multimodal.m18PhashBitBalance(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toSeq
    val n = hashes.length.toLong
    val expected = (0 until 64).map { bit =>
      val nSet = hashes.count(_.charAt(bit) == '1').toLong
      val shareMicro = (BigInt(nSet) * 1000000 + n / 2) / BigInt(n)
      (bit, n, nSet, shareMicro.toLong / 1e6,
        shareMicro < 200000 || shareMicro > 800000)
    }
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("d31: lang rollup matches a driver-side composition over the pair asset") {
    val langs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = graft.queries.TextDedup.dupPairs(spark, dir)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val got = graft.queries.TextDedup.d31CrossLangPairs(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2),
        r.getLong(3), r.getDouble(4))).toSeq
    val nAll = pairs.length.toLong
    val expected = pairs.map { case (a, b) =>
      val (la, lb) = (langs(a), langs(b))
      (if (la <= lb) la else lb, if (la <= lb) lb else la)
    }.groupBy(identity).toSeq.sortBy(_._1).map { case ((lo, hi), vs) =>
      val n = vs.length.toLong
      val share = (BigInt(n) * 1000000 + nAll / 2) / BigInt(nAll)
      (lo, hi, lo != hi, n, share.toLong / 1e6)
    }
    assert(got == expected, s"got $got\nexpected $expected")
    assert(got.map(_._4).sum == nAll && nAll > 0,
      "every pair lands in exactly one lang bucket")
  }

  test("p32: dedup-aware schedule matches a BigInt twin; eff never beats budget") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        toksOf(r.getString(2)).length.toLong))
    val keepers = graft.queries.TextDedup.componentLabels(spark, dir)
      .collect().filter(r => r.getLong(0) == r.getLong(1))
      .map(_.getLong(0)).toSet
    val f = graft.queries.TextDedup.p31EffMicro
    val got = graft.queries.TextDedup.p32DedupEpochs(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    val expected = docs.groupBy(_._2).toSeq.sortBy(_._1).flatMap {
      case (src, rows) =>
        val uRaw = rows.map(_._3).sum
        val uUnique = rows.filter(r => keepers(r._1)).map(_._3).sum
        f.map { case (r, fm) =>
          val budget = uRaw * r
          val eff = ((BigInt(uUnique) * fm + 500000) / 1000000).toLong
          val ratio =
            ((BigInt(eff) * 1000000 + budget / 2) / BigInt(budget)).toLong
          (src, r.toLong, uRaw, uUnique, budget, eff, ratio / 1e6)
        }
    }
    assert(got == expected, s"got $got\nexpected $expected")
    got.foreach { case (src, r, uRaw, uUnique, _, _, ratio) =>
      assert(uUnique <= uRaw, s"$src unique>raw")
      assert(ratio <= 1.0 + 1e-9, s"$src r=$r dedup can't mint data")
    }
  }

  test("d32: df profile matches a from-scratch driver-side twin; shares sum to 1") {
    val got = graft.queries.TextDedup.d32ShingleDfProfile(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val dfCounts = docs.flatMap { case (_, text) =>
      val ts = toksOf(text)
      if (ts.length < 3) Seq.empty
      else ts.sliding(3).map(_.mkString(" ")).toSet.toSeq
    }.groupBy(identity).values.map(_.length.toLong).toSeq
    val totalPw2 = dfCounts.map(d => BigInt(d) * (d - 1)).sum
    val expected = dfCounts
      .groupBy(d => java.lang.Long.highestOneBit(d))
      .toSeq.sortBy(_._1).map { case (lo, ds) =>
        val pw2 = ds.map(d => BigInt(d) * (d - 1)).sum
        val share = ((pw2 * 1000000 + totalPw2 / 2) / totalPw2).toLong / 1e6
        (lo, ds.size.toLong, ds.sum, (pw2 / 2).toLong, share)
      }
    assert(got == expected, s"got $got\nexpected $expected")
    val shareSum = math.round(got.map(_._5).sum * 1e6)
    assert(math.abs(shareSum - 1000000L) <= got.length, s"share sum $shareSum")
  }

  test("p33: Lorenz/Gini match a BigInt twin; curve is convex to the diagonal") {
    val got = graft.queries.TextDedup.p33SourceLorenz(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSeq
    val u = Tables.documents(spark, dir)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), toksOf(r.getString(1)).length.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy(p => (p._2, p._1))
    val sAll = BigInt(u.map(_._2).sum)
    val n = BigInt(u.length)
    val six = u.zipWithIndex.map { case ((_, x), i) => BigInt(i + 1) * x }.sum
    val gini = ((six * 2 - (n + 1) * sAll) * 1000000
      + (n * sAll) / 2) / (n * sAll)
    var cum = 0L
    val expected = u.zipWithIndex.map { case ((src, x), i) =>
      cum += x
      val lorenz = ((BigInt(cum) * 1000000 + sAll / 2) / sAll).toLong / 1e6
      (i + 1, src, x, cum, lorenz, gini.toLong / 1e6)
    }
    assert(got == expected, s"got $got\nexpected $expected")
    // ascending-order ranking makes the Lorenz curve lie on or below
    // the diagonal; Gini in [0, 1)
    got.foreach { case (rank, _, _, _, lorenz, g) =>
      assert(lorenz <= rank.toDouble / got.length + 1e-6)
      assert(g >= 0.0 && g < 1.0)
    }
  }

  test("v14: Weibull fit matches a BigInt twin over the gated v3 frame") {
    val v3 = graft.queries.Survival.v3CumHazard(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(5)))
    val got = graft.queries.Survival.v14WeibullFit(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    val expected = v3.filter(_._2 > 0).groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (seg, rows) =>
        val xy = rows.map { case (_, t, cum) =>
          (math.round(math.log(t.toDouble) * 1e6),
            math.round(math.log(cum.toDouble / 1e6) * 1e6))
        }
        val n = BigInt(xy.length)
        val sx = xy.map(p => BigInt(p._1)).sum
        val sy = xy.map(p => BigInt(p._2)).sum
        val sxy = xy.map(p => BigInt(p._1) * p._2).sum
        val sxx = xy.map(p => BigInt(p._1) * p._1).sum
        val den = n * sxx - sx * sx
        val shape = ((n * sxy - sx * sy) * 1000000 + den / 2) / den
        val inter = (sxx * sy - sx * sxy + den / 2) / den
        (seg, xy.length.toLong, shape.toLong / 1e6, inter.toLong / 1e6)
      }
    assert(got == expected, s"got $got\nexpected $expected")
    // a cumulative hazard is non-decreasing in t, so the fitted shape
    // can't be negative; the harness frame is near-memoryless (α ≈ 1)
    got.foreach { case (seg, n, shape, _) =>
      assert(n >= 10 && shape > 0.0, s"$seg n=$n shape=$shape")
    }
  }

  test("s30: distortion matches a driver-side recomputation over the query's codebook") {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding")).persist()
    emb.count()
    val cb = graft.queries.Embeddings.pqCodebook(emb).collect()
      .map(r => (r.getAs[Number](1).intValue,
        (r.getAs[Number](0).intValue, r.getSeq[Double](2).toArray,
          r.getDouble(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val vecs = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val perSub = (0 until 4).map { sub =>
      val ds = vecs.map { case (_, v) =>
        val sl = v.slice(sub * 16, sub * 16 + 16)
        def dotF(cw: Array[Double]): Double = {
          var s = 0.0; var i = 0
          while (i < 16) { s += sl(i).toDouble * cw(i); i += 1 }; s
        }
        var xx = 0.0
        var xi = 0
        while (xi < 16) { xx += sl(xi).toDouble * sl(xi).toDouble; xi += 1 }
        val best = cb(sub).map { case (label, cw, cnorm2) =>
          (r6(cnorm2 - 2.0 * dotF(cw)), label)
        }.minBy(identity)
        (BigDecimal((best._1 + r6(xx)) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact)
      }
      val n = BigInt(ds.length)
      val mean = ((ds.map(BigInt(_)).sum + n / 2) / n).toLong / 1e6
      (sub, ds.length.toLong, math.round(mean * 1e6) / 1e6.toDouble,
        ds.max / 1e6)
    }
    val got = graft.queries.Embeddings.s30PqDistortion(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(got == perSub, s"got $got\nexpected $perSub")
    got.foreach { case (sub, _, mean, mx) =>
      assert(mean >= 0.0 && mx >= mean, s"sub $sub")
    }
  }

  test("d33: sweep matches a from-scratch driver twin; index shrinks as w grows") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    // the sweep measures the WIDE 36-bit space (r12): first 9 hex chars
    // of md5 = d0 << 28 | d1 << 20 | d2 << 12 | d3 << 4 | d4 >> 4
    def hashesOf(text: String): Array[Long] = {
      val ts = toksOf(text)
      if (ts.length < 3) Array.empty
      else ts.sliding(3).map { sh =>
        md.reset()
        val d = md.digest(sh.mkString(" ").getBytes("UTF-8"))
        ((d(0) & 0xffL) << 28) | ((d(1) & 0xffL) << 20) |
          ((d(2) & 0xffL) << 12) | ((d(3) & 0xffL) << 4) |
          ((d(4) & 0xf0L) >> 4)
      }.toArray
    }
    val hashed = docs.map { case (id, t) => id -> hashesOf(t) }
    val nPostings = hashed.map(_._2.length.toLong).sum
    // truth: exact >=0.8 Jaccard over distinct shingle sets
    val sets = docs.map { case (id, t) =>
      val ts = toksOf(t)
      id -> (if (ts.length < 3) Set.empty[String]
             else ts.sliding(3).map(_.mkString(" ")).toSet)
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val truth = (for {
      (a, sa) <- sets; (b, sb) <- sets
      if a < b && sa.nonEmpty
      shared = (sa & sb).size
      if shared > 0 && r6(shared.toDouble / (sa.size + sb.size - shared)) >= 0.8
    } yield (a, b)).toSet
    def halfUp(num: Long, den: Long): Double =
      ((BigInt(num) * 1000000 + den / 2) / BigInt(den)).toLong / 1e6
    val cap = graft.queries.TextDedup.WinnowSweepCap
    val expected = Seq(2, 4, 8).map { w =>
      val fps = hashed.map { case (id, hs) =>
        id -> (if (hs.length < w) Set.empty[Long]
          else (0 to hs.length - w).map { i =>
            (i until i + w)
              .map(j => hs(j) * 16777216L + (16777215L - j)).min
          }.map(_ / 16777216L).toSet)
      }
      val nFp = fps.map(_._2.size.toLong).sum
      // r12: pairs run in the capped posting space — per fingerprint,
      // only the cap smallest doc_ids participate (mirrors
      // winnowPairsCapped; at this fixture scale the cap rarely bites,
      // the dedicated cap spec pins the cut itself)
      val posting = fps.flatMap { case (id, s) => s.map(f => (f, id)) }
        .groupBy(_._1).view
        .mapValues(_.map(_._2).sorted.take(cap).toSet).toMap
      val pairs = (for {
        (a, fa) <- fps; (b, fb) <- fps
        if a < b
        shared = (fa & fb).count(f =>
          posting(f).contains(a) && posting(f).contains(b))
        if shared >= 2
      } yield (a, b)).toSet
      (w, nPostings, nFp, halfUp(nFp, nPostings), pairs.size.toLong,
        truth.size.toLong, (pairs & truth).size.toLong,
        halfUp((pairs & truth).size.toLong, truth.size.toLong))
    }
    val got = graft.queries.TextDedup.d33WinnowSweep(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getDouble(7))).toSeq
    assert(got == expected, s"got $got\nexpected $expected")
    // wider windows select fewer fingerprints — the whole point of w
    val byW = got.map(r => r._1 -> r._3).toMap
    assert(byW(2) >= byW(4) && byW(4) >= byW(8), s"$byW")
  }

  test("d34: ledger merge equals the full-recompute labels; both halves populated") {
    val merged = graft.queries.TextDedup
      .d34IncrementalComponents(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val batch = graft.queries.TextDedup.componentLabels(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged.nonEmpty && merged.length == batch.size)
    merged.foreach { case (id, comp, isInc) =>
      assert(comp == batch(id), s"doc $id: merged $comp vs batch ${batch(id)}")
      assert(isInc == (id % 5 == 0), s"doc $id flag")
    }
    assert(merged.count(_._3) > 0 && merged.count(!_._3) > 0,
      "both the increment and the standing corpus must be non-empty")
    // the merge genuinely crossed the arrival boundary somewhere: at
    // least one component must contain docs from both halves (the
    // harness corpus has verbatim dups spread across ids)
    val mixed = merged.groupBy(_._2).values
      .exists(g => g.exists(_._3) && g.exists(!_._3) && g.size > 1)
    assert(mixed, "no component spans the increment boundary — the " +
      "cross-probe leg is untested by this corpus")
  }

  test("t33: length profile matches a driver twin; shares sum to 1 per lang") {
    val got = graft.queries.TextDedup.t33TokenLengthProfile(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val docs = Tables.documents(spark, dir)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.flatMap { case (lang, t) =>
      toksOf(t).map(tok =>
        (lang, java.lang.Long.highestOneBit(math.max(1L, tok.length.toLong))))
    }.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .groupBy(_._1._1).toSeq.sortBy(_._1).flatMap { case (lang, rows) =>
        val nLang = rows.map(_._2).sum
        rows.sortBy(_._1._2).map { case ((_, lo), n) =>
          (lang, lo, n,
            ((BigInt(n) * 1000000 + nLang / 2) / BigInt(nLang)).toLong / 1e6)
        }
      }
    assert(got == expected, s"got $got\nexpected $expected")
    got.groupBy(_._1).foreach { case (lang, rs) =>
      val s = math.round(rs.map(_._4).sum * 1e6)
      assert(math.abs(s - 1000000L) <= rs.length, s"$lang share sum $s")
    }
  }

  test("m17: buckets match the generator arithmetic; partition is total") {
    val got = graft.multimodal.Multimodal.m17AspectBuckets(spark, dir)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val ids = Tables.documents(spark, dir).select(col("doc_id"))
      .collect().map(_.getLong(0))
    val expected = ids.map { id =>
      val mt = (id % 3) match {
        case 0 => "image/bmp"; case 1 => "image/png"; case _ => "video/gif"
      }
      val w = 1 + id % 64
      val h = 1 + id % 48
      val b = if (w > h * 4 || h > w * 4) "extreme"
        else if (w * 4 < h * 3) "portrait"
        else if (w * 3 > h * 4) "landscape"
        else "square"
      ((mt, b), w * h)
    }.groupBy(_._1).map { case (k, vs) =>
      val n = vs.length.toLong
      val tot = vs.map(_._2).sum
      val mean = ((BigInt(tot) * 1000000 + n / 2) / n).toLong / 1e6
      k -> ((n, tot, mean))
    }
    assert(got == expected, s"got $got\nexpected $expected")
    assert(got.values.map(_._1).sum == ids.length.toLong,
      "every payload lands in exactly one bucket")
  }
}
