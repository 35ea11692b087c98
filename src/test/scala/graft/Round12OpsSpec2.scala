package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 new operators (e36 gap histogram, d35 cluster-size profile,
  * t34 Zipf fit, q34 supplier HHI, s31 norm audit): from-scratch
  * driver-side twins plus the analytic invariants each metric must obey
  * — the independent-recomputation layer the oracle hash can't localize.
  */
class Round12OpsSpec2 extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def bucketOf(v: Long): Long =
    java.lang.Long.highestOneBit(math.max(1L, v))

  private def halfUp(num: BigInt, den: BigInt): Double =
    ((num * 1000000 + den / 2) / den).toLong / 1e6

  test("e36: gap histogram matches a driver twin; shares sum to ~1 per type") {
    val events = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val gaps = events.groupBy(_._1).values.flatMap { g =>
      val s = g.sortBy(e => (e._4, e._2))
      s.sliding(2).collect { case Array(a, b) =>
        (b._3, (b._4 - a._4) / 1000000L)
      }
    }.toSeq
    val expected = gaps.map { case (t, gs) => (t, bucketOf(gs)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .groupBy(_._1._1).toSeq.sortBy(_._1).flatMap { case (t, rows) =>
        val nType = rows.map(_._2).sum
        rows.sortBy(_._1._2).map { case ((_, lo), n) =>
          (t, lo, n, halfUp(BigInt(n), BigInt(nType)))
        }
      }
    val got = graft.queries.Events.e36GapHistogram(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == expected, s"got ${got.take(4)}…\nexp ${expected.take(4)}…")
    got.groupBy(_._1).values.foreach { rows =>
      val s = rows.map(_._4).sum
      assert(math.abs(s - 1.0) < 1e-3, s"shares sum $s")
    }
    assert(got.nonEmpty)
  }

  test("d35: cluster-size profile matches a union-find driver twin " +
      "over the exact pair graph") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sets = docs.map { case (id, t) =>
      val ts = t.trim.toLowerCase.split("\\s+")
      id -> (if (ts.length < 3) Set.empty[String]
             else ts.sliding(3).map(_.mkString(" ")).toSet)
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val parent = scala.collection.mutable.Map(docs.map(d => d._1 -> d._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    for {
      (a, sa) <- sets; (b, sb) <- sets
      if a < b && sa.nonEmpty
      shared = (sa & sb).size
      if shared > 0 && r6(shared.toDouble / (sa.size + sb.size - shared)) >= 0.8
    } {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val sizes = docs.map(d => find(d._1)).groupBy(identity)
      .values.map(_.length.toLong).toSeq
    val nAll = sizes.sum
    val byBucket = sizes.groupBy(bucketOf).toSeq.sortBy(_._1).map {
      case (lo, cs) => (lo, cs.size.toLong, cs.sum,
        halfUp(BigInt(cs.sum), BigInt(nAll)))
    }
    val got = graft.queries.TextDedup.d35ClusterSizeProfile(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == byBucket, s"got $got\nexp $byBucket")
    assert(got.map(_._3).sum == docs.length.toLong)
  }

  test("t34: Zipf fit matches a driver twin; head-heavy langs slope " +
      "below zero") {
    val docs = Tables.documents(spark, dir)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.flatMap { case (l, t) =>
        t.trim.toLowerCase.split("\\s+").map(tok => (l, tok))
      }.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .groupBy(_._1._1).toSeq.sortBy(_._1).map { case (lang, rows) =>
        val ranked = rows.map { case ((_, tok), f) => (tok, f) }
          .sortBy { case (tok, f) => (-f, tok) }
          .take(graft.queries.TextDedup.ZipfTopK).zipWithIndex
        val xy = ranked.map { case ((_, f), i) =>
          (math.round(math.log((i + 1).toDouble) * 1e6),
            math.round(math.log(f.toDouble) * 1e6))
        }
        val n = BigInt(xy.length)
        val sx = xy.map(p => BigInt(p._1)).sum
        val sy = xy.map(p => BigInt(p._2)).sum
        val sxy = xy.map(p => BigInt(p._1) * p._2).sum
        val sxx = xy.map(p => BigInt(p._1) * p._1).sum
        val den = n * sxx - sx * sx
        val slope = ((n * sxy - sx * sy) * 1000000 + den / 2) / den
        val lnc = (sxx * sy - sx * sxy + den / 2) / den
        (lang, xy.length.toLong, slope.toLong / 1e6, lnc.toLong / 1e6)
      }
    val got = graft.queries.TextDedup.t34ZipfFit(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(got == expected, s"got $got\nexp $expected")
    // natural-language frequency tables decay: slope strictly negative
    got.foreach { case (l, _, s, _) => assert(s < 0.0, s"$l slope $s") }
  }

  test("q34: supplier HHI matches a BigInt driver twin; HHI in " +
      "[1/n, 1] per nation") {
    val rows = Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val supNat = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val units = rows.groupBy(r => (supNat(r._1), r._1)).view.mapValues {
      ls => ls.map { case (_, p, d) =>
        BigInt(BigDecimal(p * (1 - d) * 10000.0)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact)
      }.sum
    }.toSeq
    val expected = units.groupBy(_._1._1).toSeq.sortBy(_._1).map {
      case (nation, us) =>
        val tot = us.map(_._2).sum
        val shares = us.map { case (_, u) =>
          ((u * 1000000 + tot / 2) / tot).toLong }
        (nation, us.size.toLong,
          BigDecimal(tot.toDouble / 1e4)
            .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(shares.map(s => BigInt(s) * s).sum.toDouble / 1e12)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          shares.max / 1e6)
    }
    val got = graft.queries.Relational.q34SupplierHhi(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expected,
      s"got ${got.take(3)}…\nexp ${expected.take(3)}…")
    got.foreach { case (n, k, _, hhi, top) =>
      assert(hhi >= 1.0 / k - 1e-6 && hhi <= 1.0 + 1e-6, s"$n hhi $hhi")
      assert(top >= hhi - 1e-6, s"$n top $top < hhi $hhi")
    }
  }

  test("s31: norm audit matches a driver twin with the sequential " +
      "float-fold; outlier verdict is cross-multiplied") {
    val rows = Tables.embeddings(spark, dir)
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getSeq[Float](1).toArray))
    def n2micro(v: Array[Float]): Long = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      BigDecimal(BigDecimal(s).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
    }
    val expected = rows.map { case (l, v) => (l, n2micro(v)) }
      .groupBy(_._1).toSeq.sortBy(_._1).map { case (l, ms) =>
        val micros = ms.map(_._2)
        val n = micros.length.toLong
        val sum = micros.map(BigInt(_)).sum
        val out = micros.count(m => BigInt(m) * n > sum * 2).toLong
        // sum is already in micro units: mean is one half-up division
        (l, n, ((sum + n / 2) / n).toLong / 1e6,
          micros.min / 1e6, micros.max / 1e6, out)
      }
    val got = graft.queries.Embeddings.s31NormProfile(spark, dir)
      .collect().map(r => (r.getAs[Number](0).longValue, r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5))).toSeq
    assert(got == expected, s"got ${got.take(3)}…\nexp ${expected.take(3)}…")
    got.foreach { case (l, _, mean, mn, mx, _) =>
      assert(mn <= mean && mean <= mx, s"label $l ordering")
    }
  }

  test("t35: burstiness matches a driver twin; burstiness >= 1 always " +
      "(cf >= df by construction)") {
    val docs = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"), col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val expected = docs.flatMap { case (l, id, t) =>
        t.trim.toLowerCase.split("\\s+").map(tok => (l, tok, id))
      }.groupBy(p => (p._1, p._2)).toSeq.map { case ((l, tok), occ) =>
        (l, tok, occ.length.toLong, occ.map(_._3).distinct.length.toLong)
      }.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (l, vs) =>
        vs.sortBy { case (_, tok, cf, _) => (-cf, tok) }
          .take(graft.queries.TextDedup.BurstTopK).zipWithIndex
          .map { case ((_, tok, cf, df), i) =>
            (l, i + 1, tok, cf, df,
              ((BigInt(cf) * 1000000 + df / 2) / BigInt(df)).toLong / 1e6)
          }
      }
    val got = graft.queries.TextDedup.t35TermBurstiness(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got == expected, s"got ${got.take(3)}…\nexp ${expected.take(3)}…")
    got.foreach { case (l, _, tok, cf, df, b) =>
      assert(cf >= df && b >= 1.0, s"$l/$tok cf=$cf df=$df b=$b")
    }
  }

  test("e37: median/MAD outlier triage matches a driver twin with " +
      "Spark's percentile interpolation") {
    def pct(sorted: Array[Double], q: Double): Double = {
      val pos = (sorted.length - 1) * q
      val lo = pos.toInt
      if (lo == sorted.length - 1) sorted(lo)
      else sorted(lo) + (pos - lo) * (sorted(lo + 1) - sorted(lo))
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vals = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val expected = vals.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (t, vs) =>
        val med = r6(pct(vs.map(_._2).sorted, 0.5))
        val devs = vs.map(v => BigDecimal(r6(math.abs(v._2 - med)) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact)
        val madMicro = math.round(pct(devs.map(_.toDouble).sorted, 0.5))
        val nOut = devs.count(_ > madMicro * 3).toLong
        val n = vs.length.toLong
        (t, n, med, madMicro / 1e6, nOut,
          ((BigInt(nOut) * 1000000 + n / 2) / BigInt(n)).toLong / 1e6)
    }
    val got = graft.queries.Events.e37ValueOutliers(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got == expected, s"got ${got.take(3)}…\nexp ${expected.take(3)}…")
    got.foreach { case (t, n, _, mad, o, _) =>
      assert(mad >= 0.0 && o <= n, s"$t")
    }
  }

  test("s32: margin algebra is internally exact and pair coverage " +
      "complete; within-coherence beats inter-centroid cosine on the " +
      "harness labels") {
    val rows = graft.queries.Embeddings.s32LabelMargin(spark, dir)
      .collect().map(r => (r.getAs[Number](0).longValue,
        r.getAs[Number](1).longValue, r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    val labels = Tables.embeddings(spark, dir)
      .select(col("label")).distinct().collect()
      .map(_.getAs[Number](0).longValue).sorted
    assert(rows.length == labels.length * (labels.length - 1) / 2)
    rows.foreach { case (a, b, inter, wa, wb, margin) =>
      assert(a < b)
      // margin must equal min(within) − inter at micro precision
      val m = math.round((math.min(wa, wb) - inter) * 1e6) / 1e6
      assert(math.abs(margin - m) < 1e-9, s"($a,$b) margin $margin vs $m")
      Seq(inter, wa, wb).foreach(c =>
        assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"($a,$b) cos $c"))
    }
    // the harness embeds labels as separated clusters: every label's
    // within-coherence must beat at least one cross-label cosine
    assert(rows.exists(_._6 > 0), "no positive margin anywhere")
  }
}
