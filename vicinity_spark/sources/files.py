"""File-format sources for the engine's two pipeline tables (r7):
documents (text corpus) and embeddings (vector corpus) from parquet,
ORC (r8), JSON-lines, or CSV — with the SAME enforced schema regardless of
format, so every downstream operator (dedup, textops, knn, packing,
mixing) sees one contract.

Why explicit schemas instead of inference: at 100 TB, schema
inference is a full extra pass over the data (Spark reads every file
to infer JSON/CSV types) and is non-deterministic under dirty rows.
Declaring the schema makes the scan single-pass, keeps column pruning
and predicate pushdown available (parquet), and turns malformed rows
into an explicit policy (`mode`) instead of silent type widening.

Embeddings carry an `array<float>` column, which CSV cannot represent
natively — the CSV reader accepts a delimited-string vector column
(e.g. "0.1|0.2|0.3") and converts it JVM-side (split + transform +
cast; no UDF)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("label", T.StringType()),
        T.StructField("vector", T.ArrayType(T.FloatType())),
    ]
)

_FORMATS = ("parquet", "orc", "json", "csv")


def _read(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: T.StructType,
    mode: str,
    csv_options: "dict[str, str] | None" = None,
) -> DataFrame:
    if fmt not in _FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {_FORMATS}")
    if fmt in ("parquet", "orc"):
        # parquet/ORC are self-describing columnar formats (both keep
        # column pruning + predicate pushdown); select enforces
        # presence + order
        df = spark.read.format(fmt).load(path)
        missing = [f.name for f in schema.fields if f.name not in df.columns]
        if missing:
            raise ValueError(f"{fmt} at {path} lacks columns {missing}")
        return df.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
        )
    reader = spark.read.schema(schema).option("mode", mode)
    if fmt == "json":
        return reader.json(path)
    opts = {"header": "true", **(csv_options or {})}
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_documents(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    mode: str = "FAILFAST",
) -> DataFrame:
    """The documents table from parquet / JSON-lines / CSV under the
    enforced DOCUMENTS_SCHEMA. `mode` is Spark's malformed-row policy
    for the text formats: FAILFAST (default — corrupt input is an
    error, not silent data loss), PERMISSIVE, or DROPMALFORMED."""
    return _read(spark, path, fmt, DOCUMENTS_SCHEMA, mode)


def read_embeddings(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    mode: str = "FAILFAST",
    vector_delimiter: str = "|",
) -> DataFrame:
    """The embeddings table from parquet / JSON-lines / CSV. For CSV
    the vector column is a `vector_delimiter`-joined string of floats,
    converted JVM-side; for parquet/JSON it is a native array."""
    if fmt == "csv":
        csv_schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("label", T.StringType()),
                T.StructField("vector", T.StringType()),
            ]
        )
        df = _read(spark, path, fmt, csv_schema, mode)
        # \Q…\E quotes the delimiter as a Java-regex LITERAL — a bare
        # backslash prefix only works for single metachars and turns an
        # alphanumeric delimiter into an escape class (\d, \s) that
        # silently mis-splits vectors (ADVICE r7).
        return df.withColumn(
            "vector",
            F.transform(
                F.split(F.col("vector"), "\\Q" + vector_delimiter + "\\E"),
                lambda x: x.cast("float"),
            ),
        )
    return _read(spark, path, fmt, EMBEDDINGS_SCHEMA, mode)


def write_documents(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Write the documents table in any supported format (CSV quotes
    text; JSON is json-lines). Mostly a test/interchange surface —
    parquet is the production layout."""
    if fmt not in _FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {_FORMATS}")
    w = df.select(*[f.name for f in DOCUMENTS_SCHEMA.fields]).write.mode("error")
    if fmt in ("parquet", "orc"):
        w.format(fmt).save(path)
    elif fmt == "json":
        w.json(path)
    else:
        w.option("header", "true").csv(path)


def write_embeddings(
    df: DataFrame, path: str, fmt: str = "parquet", vector_delimiter: str = "|"
) -> None:
    """Write the embeddings table; for CSV the vector array is joined
    into a delimited string (the read_embeddings CSV contract)."""
    if fmt not in _FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {_FORMATS}")
    out = df.select(*[f.name for f in EMBEDDINGS_SCHEMA.fields])
    w = out.write.mode("error")
    if fmt in ("parquet", "orc"):
        w.format(fmt).save(path)
    elif fmt == "json":
        w.json(path)
    else:
        out.withColumn(
            "vector",
            F.array_join(
                F.transform(F.col("vector"), lambda x: x.cast("string")),
                vector_delimiter,
            ),
        ).write.mode("error").option("header", "true").csv(path)


def write_corpus_layout(
    df: DataFrame,
    path: str,
    partition_by: "tuple[str, ...] | list[str]" = ("lang",),
    sort_within: "tuple[str, ...] | list[str]" = ("doc_id",),
    max_records_per_file: int = 0,
    mode: str = "error",
) -> None:
    """Write a corpus in the PRODUCTION parquet layout: directory-
    partitioned by low-cardinality columns (so downstream scans with
    a `lang = 'en'`-style predicate prune whole directories before
    reading a byte), rows sorted within each file (so min/max
    row-group statistics make point/range predicates on the sort key
    prune row groups too), and file sizes bounded by
    `max_records_per_file` (one hot partition value never becomes one
    multi-GB file that a single task must read).

    Plan: one hash repartition on `partition_by` routes each
    partition value's rows to one task set (without it, every input
    task writes a file into every partition directory — the
    small-files explosion at 100 TB: tasks × partitions files), then
    sortWithinPartitions orders rows inside each task for the
    row-group stats. No global sort."""
    if not partition_by:
        raise ValueError("partition_by must name at least one column")
    for c in (*partition_by, *sort_within):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in frame: {df.columns}")
    out = df.repartition(*[F.col(c) for c in partition_by])
    if sort_within:
        out = out.sortWithinPartitions(*[F.col(c) for c in sort_within])
    w = out.write.mode(mode).partitionBy(*partition_by)
    if max_records_per_file > 0:
        w = w.option("maxRecordsPerFile", str(int(max_records_per_file)))
    w.parquet(path)
