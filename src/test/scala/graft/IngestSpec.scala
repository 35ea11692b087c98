package graft

import graft.queries.Ingest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic edges of the ingest-side operators: the p4 admission rules
  * (thresholds, rule priority), the t14 PII regexes (detection AND
  * complete removal), and d13's increment-vs-corpus verdicts (exact dup,
  * near dup, unique — and that existing×existing pairs never surface).
  */
class IngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // --- p4 admission -------------------------------------------------

  private def decide(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    Ingest.admissionDecision(Ingest.admissionSignals(
        rows.toDF("doc_id", "text").withColumn("lang", lit("en"))))
      .select(col("doc_id"), col("reject_reason"), col("keep"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2)))
      .toMap
  }

  test("p4 rules fire individually and in priority order") {
    // 50 distinct tokens incl. stopwords + long words → quality well
    // over 0.55 (length 1.0*0.3 + ttr 1.0*0.3 ≥ 0.6 alone)
    val good = (1 to 44).map(i => s"word$i").mkString(" ") +
      " the of and is to tremendous"
    val short = "the quick brown fox jumps over lazy dogs again today"   // 10 < 20
    val repetitive = (1 to 30).map(_ => "buy now").mkString(" ") // dup bigrams
    // 60 copies of one token: length sat 0.3 + ttr ~0.017*0.3 + stop 0
    // + long_ratio 0.2 ≈ 0.505 < 0.55, but rep_frac ~1 fires FIRST
    val degenerate = (1 to 60).map(_ => "degenerate").mkString(" ")
    // short AND repetitive: too_short wins (rule priority)
    val shortRep = "go go go go go go go go go go"
    val got = decide(Seq(1L -> good, 2L -> short, 3L -> repetitive,
      4L -> degenerate, 5L -> shortRep))
    assert(got(1L) == ("kept", true), s"good doc: ${got(1L)}")
    assert(got(2L) == ("too_short", false))
    assert(got(3L) == ("repetitive", false))
    assert(got(4L) == ("repetitive", false))
    assert(got(5L) == ("too_short", false), "priority: too_short before repetitive")
  }

  test("p4 quality floor rejects low-quality docs that pass length and repetition") {
    // 25 tokens, all distinct, no stopwords, all short (<4 chars):
    // quality = 0.5*0.3 + 1.0*0.3 + 0 + 0 = 0.45 < 0.55; rep_frac 0
    val lowQ = (1 to 25).map(i => s"a$i").mkString(" ")
    val got = decide(Seq(7L -> lowQ))
    assert(got(7L) == ("low_quality", false), s"got ${got(7L)}")
  }

  test("p4 thresholds are tunable: the same doc flips verdict under a laxer config") {
    import spark.implicits._
    val lowQ = (1 to 25).map(i => s"a$i").mkString(" ") // quality 0.45
    val signals = Ingest.admissionSignals(
      Seq(7L -> lowQ).toDF("doc_id", "text").withColumn("lang", lit("en")))
    val lax = Ingest.admissionDecision(signals, minQuality = 0.4)
      .select(col("reject_reason"), col("keep")).collect().head
    assert(lax.getString(0) == "kept" && lax.getBoolean(1))
  }

  // --- t14 PII redaction ---------------------------------------------

  test("t14 injects by doc_id arithmetic, detects with real regexes, and scrubs completely") {
    import spark.implicits._
    // doc 60 hits all three rules (60 % 3 = 0, % 4 = 0, % 5 = 0); doc 7
    // hits none; doc 55 email only... 55%3!=0 — use 33 (email only) and
    // 55 (ip only: 55%5=0, 55%3=1, 55%4=3)
    val docs = Seq((60L, "plain words only"), (7L, "nothing here"),
      (33L, "email case"), (55L, "ip case")).toDF("doc_id", "text")
    val out = docs
      .select(col("doc_id"), Ingest.injectPii(col("text"), col("doc_id")).as("txt"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(60L) ==
      "plain words only reach me at user60@example.com call 555-0060 from 10.60.8.60")
    assert(out(7L) == "nothing here")
    assert(out(33L) == "email case reach me at user33@example.com")
    assert(out(55L) == "ip case from 10.55.7.55")

    // run the real operator end-to-end on a temp dir? not needed: gate
    // covers the table path. Here: regex layer on the injected text.
    // counts must equal the arithmetic prediction, and no PII shape may
    // survive redaction (same regex constants as the operator)
    val scrubbed = docs
      .select(col("doc_id"), Ingest.injectPii(col("text"), col("doc_id")).as("text"))
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phoneRe = "\\b555-[0-9]{4}\\b"
    val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    val red = scrubbed.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(emailRe), lit(0))).as("ne"),
      size(regexp_extract_all(col("text"), lit(phoneRe), lit(0))).as("np"),
      size(regexp_extract_all(col("text"), lit(ipRe), lit(0))).as("ni"),
      regexp_replace(regexp_replace(regexp_replace(col("text"),
        emailRe, "<EMAIL>"), ipRe, "<IP>"), phoneRe, "<PHONE>").as("red"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(red(60L)._1 == 1 && red(60L)._2 == 1 && red(60L)._3 == 1)
    assert(red(60L)._4 ==
      "plain words only reach me at <EMAIL> call <PHONE> from <IP>")
    assert(red(7L) == ((0, 0, 0, "nothing here")))
    assert(red(33L)._4 == "email case reach me at <EMAIL>")
    assert(red(55L)._4 == "ip case from <IP>")
  }

  test("t14 counts are staged: a phone-shaped run inside an email is one email, no phantom phone") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail user555-1234x@example.com now"), // phone shape in local part
      (2L, "mail a@b.co and call 555-1234"))      // genuinely both
      .toDF("doc_id", "text")
    val got = Ingest.piiScrubOf(docs)
      .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(got(1L) == ((1, 0, 0)), s"staged counts: ${got(1L)}")
    assert(got(2L) == ((1, 1, 0)), s"real email+phone: ${got(2L)}")
  }

  // --- d13 incremental dedup ------------------------------------------

  test("d13 verdicts: exact dup, near dup, unique — against existing only") {
    import spark.implicits._
    val base = (1 to 40).map("w" + _).mkString(" ")   // 38 shingles
    val docs = Seq(
      (1L, base, false),                    // existing original
      (2L, "alpha beta gamma delta five six seven eight nine ten", false),
      (10L, base, true),                    // new: exact copy of 1
      (11L, base + " tail", true),          // new: near dup (38/39 ≈ 0.974)
      (12L, (1 to 20).map("q" + _).mkString(" "), true), // new: unique
      (13L, "alpha beta gamma delta five six seven eight nine ten", true),
    ).toDF("doc_id", "text", "is_new")
    val got = Ingest.incrementalDedupOf(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got.keySet == Set(10L, 11L, 12L, 13L), "existing docs never emitted")
    assert(got(10L) == ((true, 1L, false)), s"exact copy: ${got(10L)}")
    assert(got(11L) == ((false, 1L, false)), s"near dup: ${got(11L)}")
    assert(got(12L) == ((false, -1L, true)), s"unique: ${got(12L)}")
    assert(got(13L) == ((true, 2L, false)), s"exact copy of doc 2: ${got(13L)}")
  }

  test("d13 never pairs two NEW near-dups with each other") {
    import spark.implicits._
    val t = (1 to 30).map("n" + _).mkString(" ")
    val docs = Seq(
      (1L, "one two three four five six seven eight nine ten", false),
      (20L, t, true), (21L, t, true), // identical NEW docs
    ).toDF("doc_id", "text", "is_new")
    val got = Ingest.incrementalDedupOf(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getLong(2), r.getBoolean(3))).toMap
    // both admitted: within-increment dedup is d1/d6's job on the next
    // snapshot — d13 only answers "is it already IN the corpus"
    assert(got(20L) == ((false, -1L, true)))
    assert(got(21L) == ((false, -1L, true)))
  }
}
