"""Explicit schemas for the test corpus (FIXTURES.md) and the engine's
own datasets.

The reference keeps every value a string and lets pandas infer columns
from whichever dict keys happened to be set
(``ETFQuarterlyHoldingsExtractor.py:46-51``, ``:131``). The engine's
design is the opposite: fixed, explicit ``StructType`` per dataset,
``nullable=True`` on extracted fields, and typed parsing at the
boundary (SURVEY.md §1.2-1.3).

Note on ``events.ts``: the corpus has shipped this column as both
TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across refreshes. The loader
(sources/tables.py) probes the parquet footer's unit and picks the
schema: ``EVENTS`` (native timestamp_ntz) for micros/millis, or
``EVENTS_RAW`` (nanos long + exact DIV-1000 truncation, matching
DuckDB) only when the footer says nanos.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Test corpus tables (/root/testdata/sf*/; see FIXTURES.md)
# ---------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampNTZType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampNTZType()),
    ]
)

# Legacy on-disk schema for nanos-typed corpora: ts read as a
# nanosecond epoch long (see module docstring).
EVENTS_RAW = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

# Loader output schema: ts converted to timestamp_ntz (micros).
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

#: name -> on-disk read schema. The events entry is nominal: the loader
#: (sources/tables.py) probes the footer unit and picks EVENTS (native
#: micros read) or EVENTS_RAW (nanos-as-long) itself.
TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS_RAW,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

TABLES = tuple(TABLE_SCHEMAS)

# ---------------------------------------------------------------------------
# Engine datasets: the reference's filing index and holdings rows
# (ETFQuarterlyHoldingsExtractor.py:46-51 / :91-131), typed per
# SURVEY.md §1.2 instead of all-strings. Extraction fields nullable —
# the reference's conditional dict-key writes become nullable columns.
# ---------------------------------------------------------------------------

FILING_INDEX = T.StructType(
    [
        T.StructField("cik", T.StringType(), False),
        T.StructField("accession_number", T.StringType(), False),
        T.StructField("filing_date", T.DateType(), True),
        T.StructField("form_type", T.StringType(), True),
        T.StructField("primary_document", T.StringType(), True),
        # position within the SEC `recent` arrays; later == more recent
        # amendment. Drives the keep-last dedup (reference :158).
        T.StructField("filing_seq", T.IntegerType(), False),
    ]
)

HOLDINGS = T.StructType(
    [
        T.StructField("accession_number", T.StringType(), False),
        T.StructField("filing_seq", T.IntegerType(), True),
        T.StructField("reporting_date", T.DateType(), True),
        T.StructField("issuer_name", T.StringType(), True),
        T.StructField("cusip", T.StringType(), True),
        T.StructField("shares", T.DecimalType(38, 6), True),
        T.StructField("value_usd", T.DecimalType(38, 6), True),
        T.StructField("pct_net_assets", T.DoubleType(), True),
        # skip-on-failure (reference :36-38,:61-63) becomes an observable
        # error column instead of print-and-drop (SURVEY.md R22).
        T.StructField("error", T.StringType(), True),
    ]
)
