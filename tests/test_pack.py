"""Sequence packing (operators/textops.pack_sequences) — the
padding-free "concat then chunk" layout for LLM training pipelines.

The Spark plan is a two-phase prefix sum (range partition → windowed
cumsum per range → driver-cumulated offsets broadcast back); these
tests pin (a) exact agreement with a naive Python reference of the
single-stream semantics, (b) partitioning invariance (the property
that makes the two-phase plan valid at any cluster size), and (c) the
pack_summary audit row.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

DOCS = [
    (3, "a b c d e"),
    (1, "x y"),
    (2, "one two three four five six seven"),
    (4, ""),  # split('') → [''] → 1 token, matching token_stats
    (5, "k"),
    (9, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
]


def _py_reference(rows, seq_len):
    out = []
    start = 0
    for doc_id, text in sorted(rows):
        nt = len(text.lower().split(" "))
        out.append(
            (doc_id, nt, start, start // seq_len, (start + nt - 1) // seq_len, start % seq_len)
        )
        start += nt
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_pack_sequences_matches_python_reference(docs):
    from vicinity_spark.operators.textops import pack_sequences

    got = sorted(tuple(r) for r in pack_sequences(docs, seq_len=4).collect())
    assert got == _py_reference(DOCS, 4)


def test_pack_sequences_partitioning_invariant(docs):
    """Identical coordinates at every range-partition count — the
    two-phase prefix sum must equal the single global window for any
    physical split (including num_ranges > n_docs → empty ranges)."""
    from vicinity_spark.operators.textops import pack_sequences

    want = _py_reference(DOCS, 4)
    for nr in (1, 2, 5, 16):
        got = sorted(
            tuple(r) for r in pack_sequences(docs, seq_len=4, num_ranges=nr).collect()
        )
        assert got == want, nr


def test_pack_sequences_plan_has_no_global_window(docs):
    """The scale property itself: no windowed aggregation over an
    unpartitioned (single-partition) window anywhere in the plan —
    every Window node must be keyed by the range-partition id."""
    from vicinity_spark.operators.textops import pack_sequences

    plan = (
        pack_sequences(docs, seq_len=4, num_ranges=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Window" in line and "windowExpression" not in line.lower():
            assert "__pid" in line, line


def test_pack_summary(docs):
    from vicinity_spark.operators.textops import pack_sequences, pack_summary

    total = sum(len(t.lower().split(" ")) for _, t in DOCS)
    s = pack_summary(pack_sequences(docs, seq_len=4), 4).collect()[0]
    assert s.total_tokens == total
    assert s.n_docs == len(DOCS)
    assert s.n_sequences == -(-total // 4)
    assert s.tail_padding == s.n_sequences * 4 - total
    ref = _py_reference(DOCS, 4)
    assert s.n_straddling == sum(1 for r in ref if r[4] > r[3])


def test_pack_sequences_rejects_bad_seq_len(docs):
    from vicinity_spark.operators.textops import pack_sequences

    with pytest.raises(ValueError):
        pack_sequences(docs, seq_len=0)


from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abc", min_size=1, max_size=2)
_doc = st.lists(_word, min_size=0, max_size=6).map(" ".join)


@settings(max_examples=10, deadline=None)
@given(texts=st.lists(_doc, min_size=1, max_size=8), seq_len=st.integers(1, 7))
@pytest.mark.slow
def test_pack_sequences_property(spark, texts, seq_len):
    """For ARBITRARY corpora and seq_len, the two-phase plan equals the
    naive single-stream reference at two different range counts."""
    from vicinity_spark.operators.textops import pack_sequences

    rows = list(enumerate(texts))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    want = _py_reference(rows, seq_len)
    for nr in (1, 3):
        got = sorted(
            tuple(r)
            for r in pack_sequences(docs, seq_len=seq_len, num_ranges=nr).collect()
        )
        assert got == want, (texts, seq_len, nr)


def test_pack_sequences_null_text_zero_width(spark):
    """NULL text is a zero-width doc: coordinates are total (no crash
    on the driver-side offset fold), it consumes no stream space, and
    last_seq never precedes first_seq even on a boundary."""
    from pyspark.sql import functions as F
    from vicinity_spark.operators.textops import pack_sequences

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, None), (2, "d e"), (3, None)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in pack_sequences(docs, seq_len=4).collect()}
    assert rows[1].n_tokens == 0 and rows[3].n_tokens == 0
    # zero-width docs sit at the position of the next doc's start
    assert rows[1].start == 3 and rows[2].start == 3
    assert rows[1].last_seq >= rows[1].first_seq
    # stream total unaffected by NULL docs
    assert rows[3].start == 5


def test_select_token_budget_null_tokens_weigh_zero(spark):
    from pyspark.sql import functions as F
    from vicinity_spark.operators.sampling import select_token_budget

    scored = spark.createDataFrame(
        [(0, 3.0, 60), (1, 2.0, None), (2, 1.0, 50)],
        "doc_id long, score double, n_tokens long",
    )
    rows = {r.doc_id: r for r in select_token_budget(scored, 110).collect()}
    # NULL weighs 0: doc 1 fits for free between 0 and 2
    assert set(rows) == {0, 1, 2}
    assert rows[1].cum_tokens == 60 and rows[2].cum_tokens == 110
