"""PII detection/redaction (operators/pii.py): exact counts and
redactions on planted examples, cross-engine (DuckDB/RE2) dialect
parity, schema preservation, and the zero-shuffle plan contract."""

import duckdb
import pytest
from pyspark.sql import functions as F

from vicinity_spark.operators.pii import PII_PATTERNS, pii_scan, redact_pii
from vicinity_spark.plans.checks import plan_summary

PII_DOCS = [
    (0, "plain text with no personal information at all"),
    (1, "reach me at jane.doe+spam@mail.example.org thanks"),
    (2, "server 192.168.3.44 and backup 10.0.0.1 are down"),
    (3, "ssn 123-45-6789 phone 555-867-5309 alt 555.867.5309"),
    (4, "mixed: bob@x.io from 8.8.8.8 call 111-222-3333"),
    (5, ""),
]

REDACTED = {
    0: "plain text with no personal information at all",
    1: "reach me at <EMAIL> thanks",
    2: "server <IP> and backup <IP> are down",
    3: "ssn <SSN> phone <PHONE> alt <PHONE>",
    4: "mixed: <EMAIL> from <IP> call <PHONE>",
    5: "",
}

COUNTS = {  # (n_email, n_ipv4, n_ssn, n_phone)
    0: (0, 0, 0, 0),
    1: (1, 0, 0, 0),
    2: (0, 2, 0, 0),
    3: (0, 0, 1, 2),
    4: (1, 1, 0, 1),
    5: (0, 0, 0, 0),
}


@pytest.fixture(scope="module")
def pii_df(spark):
    return spark.createDataFrame(PII_DOCS, "doc_id long, text string")


def test_pii_scan_counts_and_redaction(pii_df):
    rows = {r.doc_id: r for r in pii_scan(pii_df).collect()}
    assert len(rows) == len(PII_DOCS)
    for did, (ne, ni, ns, np_) in COUNTS.items():
        r = rows[did]
        assert (r.n_email, r.n_ipv4, r.n_ssn, r.n_phone) == (ne, ni, ns, np_), did
        assert r.n_pii == ne + ni + ns + np_
        assert r.redacted == REDACTED[did], did


def test_redact_pii_preserves_schema_and_other_columns(pii_df):
    tagged = pii_df.withColumn("lang", F.lit("en"))
    out = redact_pii(tagged)
    assert out.columns == tagged.columns
    rows = {r.doc_id: r for r in out.collect()}
    for did in COUNTS:
        assert rows[did].text == REDACTED[did]
        assert rows[did].lang == "en"


def test_redaction_idempotent(pii_df):
    once = redact_pii(pii_df)
    twice = redact_pii(once)
    assert [r.text for r in once.orderBy("doc_id").collect()] == [
        r.text for r in twice.orderBy("doc_id").collect()
    ]


def test_pii_scan_plan_is_projection(pii_df):
    # the whole scan (counts + redaction) must ride a scan for free:
    # no Exchange anywhere in the plan
    assert "Exchange" not in plan_summary(pii_scan(pii_df))


def test_patterns_match_duckdb_re2(pii_df):
    """The pattern table's portability claim, tested directly: DuckDB
    (RE2) produces the same per-category counts AND the same redacted
    text as Spark (Java regex) on every planted example."""
    spark_rows = {r.doc_id: r for r in pii_scan(pii_df).collect()}
    con = duckdb.connect()
    for did, text in PII_DOCS:
        chain = "?"
        args = [text]
        for cat, (pat, repl) in PII_PATTERNS.items():
            n = con.execute(
                "select len(regexp_extract_all(?, ?))", [text, pat]
            ).fetchone()[0]
            assert n == spark_rows[did][f"n_{cat}"], (did, cat)
            chain = f"regexp_replace({chain}, '{pat}', '{repl}', 'g')"
        red = con.execute(f"select {chain}", args).fetchone()[0]
        assert red == spark_rows[did].redacted, did


def test_pii_scan_null_and_unicode_text(spark):
    """Totality: NULL text propagates as NULL counts/redaction (same
    as the SQL oracle's semantics); unicode text passes through the
    ASCII-shaped patterns untouched."""
    df = spark.createDataFrame(
        [(0, None), (1, "héllo wörld — ünïcode 123-45-6789 ok")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in pii_scan(df).collect()}
    assert rows[0].n_email is None and rows[0].n_pii is None
    assert rows[0].redacted is None
    assert rows[1].n_ssn == 1 and rows[1].n_pii == 1
    assert rows[1].redacted == "héllo wörld — ünïcode <SSN> ok"
