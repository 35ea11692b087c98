package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming surface over the documents corpus — ingest-time operators.
  *
  * A production pretraining pipeline doesn't only dedup a finished
  * corpus snapshot (the batch d-family); it also filters AT INGEST, as
  * crawl shards arrive. This module carries those twins: the plans are
  * the streaming halves of [[graft.queries.TextDedup]] queries, proven
  * equivalent in `StreamingSpec`.
  */
object CorpusStreams {

  /** Ingest-time exact dedup — the streaming twin of d1's decision: a
    * document is admitted iff its normalized-content hash was never seen
    * before (`dropDuplicates` keyed on the d1 hash — the same
    * `fast_md5(regexp_replace(trim(lower(text))))` normalization, so the
    * streaming filter and the batch canonical-set agree on what "same
    * document" means). Across micro-batches the earlier arrival always
    * wins (keyed state); within one micro-batch the survivor among
    * simultaneous duplicates is arbitrary — at ingest that tie is
    * meaningless (the copies are identical by construction). State is
    * one (hash) entry per distinct document, unbounded by design: exact
    * corpus-lifetime dedup IS an unbounded-state problem; the bounded
    * variant is `dropDuplicatesWithinWatermark` when the product only
    * needs near-arrival dedup (crawler re-fetch suppression), which
    * trades completeness for GC — the same completeness/state dial as
    * the batch d6b/d9b caps.
    */
  def ingestDedup(docs: DataFrame): DataFrame = {
    import graft.functions.FastMd5.fastMd5
    docs.select(col("doc_id"),
        fastMd5(regexp_replace(trim(lower(col("text"))), "\\s+", " "))
          .as("text_hash"))
      .dropDuplicates("text_hash")
  }

  /** Ingest-time quality admission — the streaming twin of p4's filter.
    * The batch operator is stateless per-row math, so the twin IS the
    * same code: [[graft.queries.Ingest.admissionSignals]] +
    * [[graft.queries.Ingest.admissionDecision]] applied to a streaming
    * DataFrame. No watermark, no state store, no shuffle — each arriving
    * micro-batch is filtered inside its own scan stage, which is exactly
    * why a pipeline runs this rule AT ingest rather than batching it:
    * rejected documents never cost downstream storage or dedup work.
    * `StreamingSpec` proves stream ≡ batch row-for-row.
    */
  def qualityAdmission(docs: DataFrame): DataFrame =
    graft.queries.Ingest.admissionDecision(
      graft.queries.Ingest.admissionSignals(docs))

  /** Ingest-time PII scrub — the streaming twin of t14's redaction
    * layer, sharing [[graft.queries.Ingest.piiScrubOf]] verbatim (the
    * batch query additionally injects its deterministic test PII; the
    * stream scrubs whatever arrives). Stateless map pass like
    * [[qualityAdmission]] — PII never crosses the ingest boundary, the
    * posture a production pipeline wants (scrubbing a 100 TB corpus
    * after the fact still leaves the raw crawl on disk). Together the
    * three CorpusStreams operators are the full ingest trio: admit
    * (quality), scrub (PII), dedup (content hash).
    */
  def piiScrub(docs: DataFrame): DataFrame =
    graft.queries.Ingest.piiScrubOf(docs)
}
