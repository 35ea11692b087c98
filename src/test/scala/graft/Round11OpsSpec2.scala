package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 session operators (d30 winnowing, s27 int8 recall, m16
  * luminance histogram, v13 Nelson–Aalen CI, p29 temperature mix):
  * invariant checks and driver-side twins the oracle hash can't
  * localize — fingerprint-set equality for a verbatim copy, a from-
  * scratch brute-force recall twin, pixel-count conservation, band
  * containment + v3 agreement, and share algebra across the τ sweep.
  */
class Round11OpsSpec2 extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("d30: a verbatim copy shares every fingerprint; unrelated docs none") {
    import spark.implicits._
    val text = (1 to 40).map(i => s"tok$i").mkString(" ")
    val other = (1 to 40).map(i => s"zz$i").mkString(" ")
    val docs = Seq(
      (1L, text, "en", "web", text.length.toLong),
      (2L, text, "en", "web", text.length.toLong),
      (3L, other, "en", "web", other.length.toLong)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("d30spec")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // driver-side twins: winnow `text` from scratch with the same
    // (min hash, rightmost pos) selection rule, at both hash widths
    val toks = text.trim.toLowerCase.split("\\s+")
    val w = graft.queries.TextDedup.WinnowW
    def fpsAt(hexChars: Int): Set[Long] = {
      val hashes = toks.sliding(3).map { sh =>
        java.lang.Long.parseLong(
          java.security.MessageDigest.getInstance("MD5")
            .digest(sh.mkString(" ").getBytes("UTF-8"))
            .map(b => f"$b%02x").mkString.take(hexChars), 16)
      }.toArray
      hashes.indices.dropRight(w - 1).map { i =>
        (i until i + w).map(j => hashes(j) * 16777216L + (16777215L - j)).min
      }.map(_ / 16777216L).toSet
    }
    // the GATED leg (r13): wide 36-bit capped space — the cap never
    // bites at 3 docs, so the pair must share exactly the wide count
    val widePairs = graft.queries.TextDedup.d30Winnowing(spark, tmp.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val wideFps = fpsAt(9)
    assert(wideFps.nonEmpty && wideFps.size < toks.length - 1,
      s"winnowing must thin the index (${wideFps.size})")
    assert(widePairs.toSeq == Seq((1L, 2L, wideFps.size.toLong)),
      s"got ${widePairs.toSeq}, expected one pair sharing ${wideFps.size}")
    // the NARROW audit leg keeps the pre-r13 16-bit semantics
    val narrowPairs = graft.queries.TextDedup
      .d30WinnowingNarrow(spark, tmp.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val narrowFps = fpsAt(4)
    assert(narrowPairs.toSeq == Seq((1L, 2L, narrowFps.size.toLong)),
      s"got ${narrowPairs.toSeq}, expected one pair sharing ${narrowFps.size}")
  }

  test("s27: query output equals a from-scratch driver-side twin") {
    val em = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    val micro = em.map { case (id, v) =>
      id -> v.map(x => math.round(x.toDouble * 1e6))
    }
    val dims = micro.head._2.length
    val scales = (0 until dims).map(d => micro.map(_._2(d).abs).max).toArray
    def q(v: Array[Long]): Array[Long] = v.zip(scales).map { case (x, s) =>
      if (s == 0L) 0L
      else if (x >= 0) (x * 127 + s / 2) / s
      else -((-x * 127 + s / 2) / s)
    }
    val qs = micro.map { case (id, v) => (id, v, q(v)) }
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val expected = qs.filter(_._1 % 100 == 0).map { case (qid, qe, qq) =>
      val cands = qs.filter(_._1 != qid)
      val exact = cands.minBy(c => (-dot(qe, c._2), c._1))._1
      val quant = cands.minBy(c => (-dot(qq, c._3), c._1))._1
      (qid, exact, quant, exact == quant)
    }.toSeq
    val got = graft.queries.Embeddings.s27Int8Recall(spark, dir)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("m16: pixel counts conserve the generator's w*h totals, shares sum to 1") {
    val rows = graft.multimodal.Multimodal.m16LumHistogram(spark, dir)
      .collect()
    val gotByType = rows.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    // every decoded pixel lands in exactly one bin, so per-format sums
    // must equal the doc_id-arithmetic pixel totals
    val docIds = Tables.documents(spark, dir).select(col("doc_id"))
      .collect().map(_.getLong(0))
    val expByType = docIds.filter(id => id % 3 == 0 || id % 3 == 1)
      .groupBy(id => if (id % 3 == 0) "image/bmp" else "image/png")
      .view.mapValues(_.map(id => (1 + id % 64) * (1 + id % 48)).sum).toMap
    assert(gotByType == expByType, s"$gotByType vs $expByType")
    rows.groupBy(_.getString(0)).foreach { case (mt, rs) =>
      val shareSum = rs.map(r => math.round(r.getDouble(3) * 1e6)).sum
      assert(math.abs(shareSum - 1000000L) <= rs.length, s"$mt $shareSum")
    }
  }

  test("v13: band contains the point estimate and agrees with v3") {
    val v13 = graft.queries.Survival.v13NelsonAalenCi(spark, dir).collect()
    assert(v13.nonEmpty)
    v13.foreach { r =>
      val (h, v, lo, hi) =
        (r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))
      assert(v >= 0.0 && lo <= h + 1e-9 && h <= hi + 1e-9, r)
    }
    val v3 = graft.queries.Survival.v3CumHazard(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(6)).toMap
    v13.foreach { r =>
      assert(v3((r.getString(0), r.getLong(1))) == r.getDouble(4),
        s"v13 cum_hazard must equal v3's at ${r.getString(0)}/${r.getLong(1)}")
    }
  }

  test("p30: packing matches a from-scratch driver-side next-fit twin") {
    val got = graft.queries.TextDedup.p30ContextPacking(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    val c = graft.queries.TextDedup.PackC
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).trim.toLowerCase.split("\\s+").length.toLong))
    val expected = docs.groupBy(_._1).toSeq.map { case (src, rows) =>
      val shards = rows.groupBy(_._2 / graft.queries.TextDedup.PackShard)
      var bins = 0L; var sumT = 0L; var nTrunc = 0L
      shards.toSeq.sortBy(_._1).foreach { case (_, ds) =>
        var fill = c
        ds.sortBy(_._2).foreach { case (_, _, nt) =>
          val t = math.min(nt, c)
          if (fill + t <= c) fill += t else { bins += 1; fill = t }
          sumT += t
          if (nt > c) nTrunc += 1
        }
      }
      val denom = bins * c
      val fillFrac = ((sumT * 1000000L + denom / 2) / denom).toDouble / 1e6
      (src, rows.length.toLong, bins, sumT, nTrunc,
        math.round(fillFrac * 1e6) / 1e6.toDouble)
    }.sortBy(_._1)
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // every window is genuinely needed: fill can never exceed 1
    got.foreach { case (src, _, w, tk, _, f) =>
      assert(w >= 1 && tk <= w * c && f <= 1.0, src)
    }
  }

  test("e33: chi-square matches a driver-side integer twin; human traffic flags") {
    val got = graft.queries.Events.e33HourUniformity(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).toSeq
    val counts = Tables.events(spark, dir)
      .select(col("event_type"), hour(col("ts")).cast("long").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = counts.keys.map(_._1).toSeq.distinct.sorted.map { et =>
      val o = (0L until 24L).map(h => counts.getOrElse((et, h), 0L))
      val n = o.sum
      val ss = o.map(c => BigInt(c * 24 - n).pow(2)).sum
      val chi2Micro = ((ss * 1000000 + BigInt(n * 24) / 2) / BigInt(n * 24)).toLong
      (et, n, chi2Micro.toDouble / 1e6, chi2Micro >= 49728000L)
    }
    assert(got == expected, s"got $got\nexpected $expected")
    assert(got.nonEmpty)
  }

  test("p29: shares normalize per tau; tau=1 is natural; tau<1 flattens") {
    val rows = graft.queries.TextDedup.p29TemperatureMix(spark, dir)
      .collect()
      .map(r => (r.getDouble(0), r.getString(1), r.getLong(2),
        math.round(r.getDouble(4) * 1e6)))
    val byTau = rows.groupBy(_._1)
    assert(byTau.keySet == Set(0.3, 0.7, 1.0))
    byTau.foreach { case (tau, rs) =>
      val s = rs.map(_._4).sum
      assert(math.abs(s - 1000000L) <= rs.length, s"tau=$tau sum=$s")
    }
    // τ = 1: share ∝ n_docs up to the snapping (micro tolerance scaled
    // by the source count)
    val nat = byTau(1.0)
    val total = nat.map(_._3).sum
    nat.foreach { case (_, src, n, share) =>
      val expected = math.round(n.toDouble * 1e6 / total)
      assert(math.abs(share - expected) <= 10L, s"$src $share vs $expected")
    }
    // flattening: the smallest source gains share as τ drops, the
    // largest loses it
    val smallest = nat.minBy(r => (r._3, r._2))._2
    val largest = nat.maxBy(r => (r._3, r._2))._2
    def shareOf(tau: Double, src: String): Long =
      byTau(tau).find(_._2 == src).get._4
    assert(shareOf(0.3, smallest) >= shareOf(0.7, smallest))
    assert(shareOf(0.7, smallest) >= shareOf(1.0, smallest))
    assert(shareOf(0.3, largest) <= shareOf(0.7, largest))
    assert(shareOf(0.7, largest) <= shareOf(1.0, largest))
  }
}
