"""Streaming twin of the composed cleaning pipeline (★ — the batch
form is the oracle-checked `docs_clean_pipeline` query): quality
filter → language filter → exact dedup, over a STREAMING
(doc_id, text, ts) frame.

Why this composes with bounded state: the quality and (r6 rowwise)
language-ID predicates are pure projections, so the only stateful
operator is the exact-dedup `dropDuplicatesWithinWatermark` on the
content hash — state ∝ distinct content within the watermark horizon,
exactly the stream_exact_dedup bound. Near-dup canonicalization is
deliberately NOT in the streaming plan: connected components is a
global fixpoint, so the pipeline follows the documented
detect-streaming/verify-in-batch split — compose
`stream_neardup_candidates` on this function's output to mine
candidate pairs in-stream, and canonicalize them in the periodic
batch pass (operators/dedup.py connected_components).

Semantics note vs the batch pipeline: batch keep-first is min(doc_id)
per content hash (deterministic over a static corpus); a stream keeps
the FIRST ARRIVED copy (the only streaming-meaningful choice, shared
with stream_exact_dedup). Quality/language survivors are identical —
the predicates are the same expressions (test-pinned against
quality_scores / langid_scores_rowwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# single source of truth for the filter predicates: textops defines
# them next to the thresholds and tokenizer the batch scorers use, so
# the streaming-vs-batch row identity cannot silently drift
from vicinity_spark.operators.textops import (  # noqa: F401 (re-export)
    predicted_lang_col,
    quality_pass_col,
)


def stream_clean(
    docs_stream: DataFrame,
    *,
    lang: str = "en",
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    redact: bool = False,
) -> DataFrame:
    """Cleaned docs frame: quality_pass == 1, predicted language ==
    `lang`, first-arrived copy per exact content hash. The projection
    filters add no latency or state; rows emit in append mode in the
    arrival micro-batch (dedup is emit-first-seen). Works on a batch
    frame too (the dedup then keeps an arbitrary copy — use the batch
    pipeline when min-id determinism matters).

    ``redact=True`` scrubs PII (operators/pii.py redact_col) as a
    final projection — stateless, so the query still has exactly ONE
    stateful operator. Redaction runs AFTER the dedup hash is taken:
    quality/language/dedup see the text as crawled (two docs differing
    only inside a redacted span stay distinct), and only emitted
    survivors pay the regexp chain."""
    cleaned = (
        docs_stream.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"), F.col(ts_col)
        )
        .where(quality_pass_col("text"))
        .where(predicted_lang_col("text") == F.lit(lang))
        .withWatermark(ts_col, watermark)
        .withColumn("__ch", F.md5(F.col("text").cast("binary")))
        .dropDuplicatesWithinWatermark(["__ch"])
        .drop("__ch")
    )
    if redact:
        from vicinity_spark.operators.pii import redact_col

        cleaned = cleaned.withColumn("text", redact_col("text"))
    return cleaned


def stream_lm_scores(
    doc_stream: DataFrame,
    lm: DataFrame,
    sink,
    *,
    target_lm: "DataFrame | None" = None,
    lm_bi: "DataFrame | None" = None,
    backoff: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Streaming twin of the LM quality layer: score each arriving
    micro-batch of documents against a PRECOMPUTED unigram LM table —
    per-doc cross-entropy (the CCNet perplexity filter), plus the DSIR
    log importance ratio when a target-domain ``target_lm`` is also
    given. This is the production split the batch operators assume:
    fit the LM(s) once a day in batch (textops.fit_unigram_lm /
    sampling.dsir_weights), score the live crawl as it lands.

    ``lm_bi`` (r11): pass a fitted bigram table
    (textops.fit_bigram_lm) to score ``xent`` under the
    stupid-backoff BIGRAM model instead (textops.bigram_logprob —
    seen pairs at their ML conditional, unseen at
    ``backoff``·p_uni); the unigram ``lm`` stays required as the
    backoff distribution (and the DSIR feature model, which is
    unigram by construction, keeps using it).

    Stateless by construction — scoring is a token join + per-doc sum
    WITHIN one micro-batch, so it runs under foreachBatch (each
    trigger batch-planned: AQE sizes the token join, and a small LM
    broadcasts) and needs no watermark or state store; per-doc
    aggregation over a stream would otherwise be an unbounded-state
    groupBy the append planner rightly rejects. `sink(scored_df,
    batch_id)` receives (doc_id, n_tokens, xent[, llr]) per trigger.

    Returns the DataStreamWriter — call `.trigger(...).start()`."""
    from vicinity_spark.operators.sampling import _require_unk, dsir_weights_from_lms
    from vicinity_spark.operators.textops import unigram_logprob

    # pin the (vocab-bounded) LM tables ONCE at build time (r9): a
    # caller-supplied table that is still a lazy plan over its fit
    # corpus would re-run that corpus on EVERY micro-batch — and up to
    # 4× per batch, since the unk/combined joins read each table
    # several times (the repeated-evaluation cost measured in the
    # batch path, BENCHNOTES r9 "dsir_hashed pricing")
    lm = lm.localCheckpoint(eager=True)
    if target_lm is not None:
        target_lm = target_lm.localCheckpoint(eager=True)
    if lm_bi is not None:
        # a capped bigram table is bounded by construction; pin it for
        # the same repeated-evaluation reason as the unigram tables
        lm_bi = lm_bi.localCheckpoint(eager=True)
    # validate the floor rows ONCE at build time (ADVICE r8 — a table
    # missing '__unk__' silently zeroes every scored doc), then skip
    # the per-micro-batch re-check; the LM here is a plain-token
    # unigram fit (unigram_logprob shares it), so the DSIR feature
    # model is pinned to 'unigram' — the 'auto' → hashed_ngram default
    # would mismatch the vocabulary these tables were fit over
    _require_unk(lm, "lm")
    if target_lm is not None:
        _require_unk(target_lm, "target_lm")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        if lm_bi is not None:
            from vicinity_spark.operators.textops import bigram_logprob

            out = bigram_logprob(
                batch_df, text_col=text_col, id_col=id_col,
                lm_bi=lm_bi, lm_uni=lm, backoff=backoff,
            )
        else:
            out = unigram_logprob(batch_df, text_col=text_col, id_col=id_col, lm=lm)
        if target_lm is not None:
            w = dsir_weights_from_lms(
                batch_df, lm, target_lm, text_col=text_col, id_col=id_col,
                features="unigram", validate=False,
            )
            out = out.join(w.select("doc_id", "llr"), "doc_id", "left")
        sink(out, batch_id)

    return doc_stream.writeStream.foreachBatch(_process).outputMode("append")
