"""Deterministic dataset splitting for training pipelines.

A train/holdout split at 100 TB must be (a) deterministic — re-running
the pipeline, or re-computing a lost partition under speculation,
must route every row to the same side; (b) engine-portable — the
split a Spark job writes is the split a downstream DuckDB/Trino
validation job reads back. Both rule out `rand()` and engine-native
hash functions (Spark's xxhash64 and DuckDB's hash() disagree).

The split key is md5 over a salted textual id — portable across
engines (the same trick the MinHash dedup family uses,
operators/dedup.py:127) — compared lexicographically against a hex
threshold: md5 hex strings are uniform, so the fraction of keys below
threshold T equals the numeric value of T as a base-16 fraction.
(No reference analog — vicinity has no sampling surface; a
training-data pipeline needs one.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_key(id_col, salt: str = "split"):
    """Portable md5 hex split key over a salted id."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(F.concat(F.lit(salt + ":"), c.cast("string")).cast("binary"))


def hex_threshold(fraction: float, digits: int = 8) -> str:
    """Hex string T with P(md5_hex < T) == round(fraction, 16^-digits):
    the base-16 expansion of `fraction` to `digits` places."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    frac, out = fraction, []
    for _ in range(digits):
        frac *= 16
        d = min(int(frac), 15)
        out.append("0123456789abcdef"[d])
        frac -= d
    return "".join(out)


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_fraction: float = 0.9,
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Add a deterministic `split` column ('train' / 'holdout'). Pure
    narrow projection — no shuffle, no RNG, stable under retries and
    across engines."""
    key = split_key(id_col, salt)
    t = hex_threshold(train_fraction)
    return df.withColumn(
        split_col, F.when(key < F.lit(t), F.lit("train")).otherwise(F.lit("holdout"))
    )


def stratified_hash_split(
    df: DataFrame,
    strata_col: str,
    fractions: "dict[str, float]",
    default_fraction: float = 0.9,
    id_col: str = "doc_id",
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Per-stratum deterministic split: each stratum gets its own
    train fraction (e.g. keep 99% of rare languages, 80% of the
    dominant one). Same md5-key mechanics as hash_split — portable,
    retry-stable, no shuffle."""
    key = split_key(id_col, salt)
    expr = F.lit(hex_threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        expr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(hex_threshold(frac))
        ).otherwise(expr)
    return df.withColumn(
        split_col, F.when(key < expr, F.lit("train")).otherwise(F.lit("holdout"))
    )


def mix_sources(
    docs: DataFrame,
    weights: "dict[str, float]",
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Weighted dataset mixing for training pipelines (r7): each
    source's documents appear ``weights[source]`` times in the output
    stream — the "N epochs of source A + M of source B" recipe of
    large-scale LLM data mixes. Non-integer weights are honored
    deterministically: a doc gets floor(w) full repeats plus one more
    iff its salted split key falls below the fractional part (the
    same md5-hex construction as hash_split — no RNG, stable under
    retries, reproducible across engines). Sources absent from
    `weights` are dropped (weight 0).

    Output: (doc_id, source, repeat_idx, order_key) — one row per
    (doc, repeat), with `order_key` an md5 over (salt, doc_id,
    repeat_idx) giving every copy a deterministic pseudo-random
    position in the global training order. Feed `order_key` to
    pack_sequences(id_col="order_key") (after joining text back on
    doc_id) to produce a shuffled, mixed, packed token stream.

    Plan: pure narrow projection + one Generate (posexplode of a
    per-row repeat sequence) — ZERO shuffles at any corpus size; the
    repeat fan-out is bounded by max(weights)."""
    if not weights:
        raise ValueError("weights must name at least one source")
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for source {s!r}: {w}")
    whole = F.lit(None).cast("int")
    thr = F.lit(None).cast("string")
    for s, w in sorted(weights.items()):
        whole = F.when(F.col(source_col) == s, F.lit(int(w))).otherwise(whole)
        thr = F.when(
            F.col(source_col) == s, F.lit(hex_threshold(w - int(w)))
        ).otherwise(thr)
    key = split_key(id_col, salt)
    n_rep = whole + F.when(key < thr, F.lit(1)).otherwise(F.lit(0))
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(source_col).alias("source"),
            n_rep.alias("__n"),
        )
        .where(F.col("__n") > 0)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(0), F.col("__n") - 1)).alias("repeat_idx"),
        )
        .select(
            "doc_id",
            "source",
            F.col("repeat_idx").cast("long").alias("repeat_idx"),
            F.md5(
                F.concat_ws(":", F.lit(salt), F.col("doc_id").cast("string"),
                            F.col("repeat_idx").cast("string")).cast("binary")
            ).alias("order_key"),
        )
    )
