"""The document pipeline (SURVEY.md §2A R7-R17/R22-R23, Phase 4): the
reference's entire ``run()`` — per-filing HTML parse, anchored field
extraction, error-column skip-on-failure, keep-last dedup, partitioned
sink (`/root/reference/ETFQuarterlyHoldingsExtractor.py:54-132,
145-159`) — re-expressed as lazy distributed plans.

Fixture strategy: filings are RENDERED deterministically from the
corpus tables as a column expression (JVM-side), then parsed BACK by
the executor-side DOM walk in ``operators/documents.py``. Because the
HTML derives from `customer`/`nation`, the DuckDB oracle can state the
expected extraction directly against those tables — a full
hash-matched correctness check on a genuinely HTML-parsing UDTF (the
driver's strongest check, not rows-only). The parser is generic DOM
navigation; it never sees the generator.

Numeric transport mirrors the reference exactly: cells carry
``format_number`` strings ("1,234,567.89"); the boundary parse
(functions/boundary.py) types them back. Sources are chosen so
format→parse is lossless (c_acctbal is exactly 2dp; share/pct sources
are integers scaled by powers of ten).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etfconstituentextractor_spark.functions.boundary import parse_money
from etfconstituentextractor_spark.functions.parity import dec, dsum
from etfconstituentextractor_spark.operators.documents import (
    filing_html,
    holding_fragment,
    parse_filings,
)
from etfconstituentextractor_spark.plans.registry import query
from etfconstituentextractor_spark.sources.tables import load

#: nations whose filings render without a reporting-date section —
#: the malformed-document fixture (reference :80-82 silently skips
#: these; the engine emits an error row instead).
_BAD_NATION_PRED = "n_nationkey % 7 = 3"


def _filings(spark: SparkSession, sf_dir: str, seqs: int = 1) -> DataFrame:
    """Filing index with rendered HTML: one filing per (nation,
    filing_seq). seq 0 is the original filing; seq k amends it with
    holding values shifted by +k (same reporting date — the keep-last
    scenario of reference R19). Rendering is pure column algebra: the
    per-holding fragments build per customer row, then one groupBy
    assembles each document (sorted by custkey → byte-deterministic)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    rows = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .withColumn("filing_seq", F.explode(F.array(*[F.lit(i) for i in range(seqs)])))
    )
    # CUSIP only on every third holding — the nullable-column path
    # (reference R12: README-promised, code commented out :105-107).
    cusip = F.when(
        F.col("c_custkey") % 3 == 0,
        F.concat(F.lit("CUS"), F.lpad((F.col("c_custkey") % 1000000).cast("string"), 6, "0")),
    )
    frag = holding_fragment(
        issuer=F.col("c_name"),
        shares=F.format_number(F.col("c_custkey") % 100000, 0),
        value=F.format_number(F.col("c_acctbal") + F.col("filing_seq"), 2),
        pct=F.format_number((F.col("c_custkey") % 9999) / F.lit(10000.0), 4),
        cusip=cusip,
    )
    per_filing = (
        rows.select(
            "n_nationkey",
            "filing_seq",
            F.struct(F.col("c_custkey").alias("k"), frag.alias("frag")).alias("h"),
        )
        .groupBy("n_nationkey", "filing_seq")
        .agg(
            F.expr("array_join(transform(array_sort(collect_list(h)), x -> x.frag), '')").alias(
                "body"
            )
        )
    )
    rdate = F.date_format(
        F.date_add(F.lit("2024-03-31").cast("date"), F.col("n_nationkey")), "yyyy-MM-dd"
    )
    html = F.when(
        F.expr(_BAD_NATION_PRED), filing_html(None, F.col("body"))
    ).otherwise(filing_html(rdate, F.col("body")))
    # filing_seq 2 carries a different form type — q52's index filter
    # must drop it before any per-document work (reference R4, :52).
    return per_filing.select(
        (F.col("n_nationkey").cast("bigint") * 10 + F.col("filing_seq")).alias("filing_id"),
        "filing_seq",
        F.when(F.col("filing_seq") == 2, "OTHER").otherwise(F.lit("NPORT-P")).alias("form_type"),
        html.alias("html"),
    )


# ---------------------------------------------------------------------------
# q50 — document → rows extraction with error column: render one
# filing per nation, parse on executors, boundary-cast the extracted
# strings. Failed filings surface as exactly one error row (R22 as
# data, not prints). Oracle states the expected extraction directly
# from customer/nation — hash-matched.
#
# Round 9: the 'warc' leg additionally carries the crawl-hygiene
# stage every real pipeline runs FIRST — each filing's WARC capture
# is written under a deliberately MESSY target URI (one of the
# _URL_VARIANTS shapes below, chosen by nation), and the read-back
# normalizes it with the REAL operators (operators/urls.py:
# normalize_url, host_of, registrable_domain_from_table over the
# committed Mozilla PSL snapshot). url_raw round-trips the WARC
# header; url_norm and url_domain are the operator outputs; the
# oracle states the EXPECTED strings per variant (the house fixture
# pattern — the oracle never re-runs the algorithm). This closes the
# round-8 verdict's last un-oracled LLM-pipeline family.
# ---------------------------------------------------------------------------

#: (raw_prefix, raw_suffix, expected_norm_prefix, expected_norm_suffix,
#: expected_registrable_domain) — raw target URI = prefix || filing_id
#: || suffix; variant = nationkey % len. Shapes cover: case folding,
#: default/non-default ports, fragments, tracking-vs-kept query
#: params, userinfo strip, FQDN trailing dot, trailing slash, PSL
#: fallback (.test is unlisted), a compound literal rule (co.uk), an
#: IPv6 literal, a wildcard rule (*.kawasaki.jp) and its exception
#: (!city.kawasaki.jp).
_URL_VARIANTS = [
    ("https://www.filings.test/holdings/", "",
     "https://www.filings.test/holdings/", "", "filings.test"),
    ("HTTPS://WWW.Filings.TEST:443/holdings/", "#top",
     "https://www.filings.test/holdings/", "", "filings.test"),
    ("https://www.filings.test/holdings/", "?utm_source=feed&page=2&fbclid=xx",
     "https://www.filings.test/holdings/", "?page=2", "filings.test"),
    ("https://bot:pw@www.filings.test./holdings/", "",
     "https://www.filings.test/holdings/", "", "filings.test"),
    ("http://filings.test:80/holdings/", "/",
     "http://filings.test/holdings/", "", "filings.test"),
    ("https://archive.example.co.uk/holdings/", "",
     "https://archive.example.co.uk/holdings/", "", "example.co.uk"),
    ("https://[2001:db8::1]:8443/holdings/", "",
     "https://[2001:db8::1]:8443/holdings/", "", "[2001:db8::1]"),
    ("http://crawl.filings.test:8080/holdings/", "?a=1&utm_medium=x",
     "http://crawl.filings.test:8080/holdings/", "?a=1", "filings.test"),
    ("https://www.city.kawasaki.jp/holdings/", "",
     "https://www.city.kawasaki.jp/holdings/", "", "city.kawasaki.jp"),
    ("https://archive.foo.kawasaki.jp/holdings/", "",
     "https://archive.foo.kawasaki.jp/holdings/", "", "archive.foo.kawasaki.jp"),
]


def _messy_url(fid: Column) -> Column:
    """The variant-shaped raw target URI for a filing (variant =
    nationkey % len; filing_id = nationkey*10 in q50's seqs=1 index)."""
    v = F.pmod((fid / 10).cast("bigint"), F.lit(len(_URL_VARIANTS)))
    out = None
    for i, (rp, rs, *_rest) in enumerate(_URL_VARIANTS):
        branch = F.concat(F.lit(rp), fid.cast("string"), F.lit(rs))
        out = F.when(v == i, branch) if out is None else out.when(v == i, branch)
    return out


def _sql_url_expect() -> str:
    """Oracle CTE: per-filing expected (url_raw, url_norm,
    url_domain) — raw restates the construction, norm/domain state
    the EXPECTED operator outputs per variant."""
    raw = " ".join(
        f"WHEN {i} THEN '{rp}' || filing_id || '{rs}'"
        for i, (rp, rs, *_r) in enumerate(_URL_VARIANTS)
    )
    norm = " ".join(
        f"WHEN {i} THEN '{np}' || filing_id || '{ns}'"
        for i, (_rp, _rs, np, ns, _d) in enumerate(_URL_VARIANTS)
    )
    dom = " ".join(
        f"WHEN {i} THEN '{d}'"
        for i, (*_x, d) in enumerate(_URL_VARIANTS)
    )
    return f"""urlcols AS (
      SELECT CAST(n_nationkey AS BIGINT) * 10 AS filing_id,
             CASE n_nationkey % {len(_URL_VARIANTS)} {raw} END AS url_raw,
             CASE n_nationkey % {len(_URL_VARIANTS)} {norm} END AS url_norm,
             CASE n_nationkey % {len(_URL_VARIANTS)} {dom} END AS url_domain
      FROM nation
    )"""


# ---------------------------------------------------------------------------
@query(
    "q50_doc_extract_holdings",
    oracle=f"""
    WITH base AS (
      SELECT CAST(n_nationkey AS BIGINT) * 10 AS filing_id,
             strftime(DATE '2024-03-31' + n_nationkey, '%Y-%m-%d') AS reporting_date,
             c_name AS issuer,
             CASE WHEN c_custkey % 3 = 0
                  THEN 'CUS' || lpad(CAST(c_custkey % 1000000 AS VARCHAR), 6, '0') END AS cusip,
             CAST(c_custkey % 100000 AS DOUBLE) AS shares,
             CAST(CAST(c_acctbal AS DECIMAL(14,4)) AS DOUBLE) AS value_usd,
             CAST(c_custkey % 9999 AS DOUBLE) / 10000 AS pct,
             CAST(NULL AS VARCHAR) AS error
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE n_nationkey % 7 <> 3
      UNION ALL
      SELECT CAST(n_nationkey AS BIGINT) * 10, NULL, NULL, NULL, NULL, NULL, NULL,
             'missing_reporting_date'
      FROM nation
      WHERE n_nationkey % 7 = 3
        AND EXISTS (SELECT 1 FROM customer WHERE c_nationkey = n_nationkey)
    ),
    {_sql_url_expect()}
    SELECT 'html' AS leg, base.*,
           CAST(NULL AS VARCHAR) AS url_raw,
           CAST(NULL AS VARCHAR) AS url_norm,
           CAST(NULL AS VARCHAR) AS url_domain
    FROM base
    UNION ALL
    SELECT 'warc' AS leg, base.*, u.url_raw, u.url_norm, u.url_domain
    FROM base JOIN urlcols u USING (filing_id)
    """,
)
def q50_doc_extract_holdings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document extraction under two ingestion paths, as tagged legs:
    'html' parses the rendered filings directly; 'warc' first writes
    them as Common-Crawl-style ``.warc.gz`` shards (sources/warc.py —
    one gzip member per captured HTTP response), reads them back with
    the distributed WARC reader, and parses the recovered payloads.
    Identical extraction either way, so the oracle states the same
    rows for both legs — the WARC writer, multi-member gzip reader,
    HTTP payload split, and UTF-8 transport are all under the hash."""
    import os

    from etfconstituentextractor_spark.operators.urls import (
        host_of,
        normalize_url,
        psl_rules,
        registrable_domain_from_table,
    )
    from etfconstituentextractor_spark.sources.warc import read_warc, write_warc

    def _extract(parsed: DataFrame, leg: str) -> DataFrame:
        return parsed.select(
            F.lit(leg).alias("leg"),
            "filing_id",
            "reporting_date",
            "issuer",
            "cusip",
            parse_money("shares_str").cast("double").alias("shares"),
            parse_money("value_str").cast("double").alias("value_usd"),
            parse_money("pct_str").cast("double").alias("pct"),
            "error",
        )

    # the index feeds two consumers (direct parse + WARC write);
    # checkpoint so the render's customer/nation scan runs once
    filings = _filings(spark, sf_dir, seqs=1).localCheckpoint()
    html_leg = _extract(parse_filings(filings), "html").select(
        "*",
        F.lit(None).cast("string").alias("url_raw"),
        F.lit(None).cast("string").alias("url_norm"),
        F.lit(None).cast("string").alias("url_domain"),
    )

    # pid+sf_dir-keyed scratch with atexit sweep (the r7 concurrency
    # finding, now the shared sources.tables.scratch_dir discipline);
    # write_warc rewrites identical filenames, so in-place rebuilds
    # keep earlier frames readable and unique=False is right here
    from etfconstituentextractor_spark.sources.tables import scratch_dir

    out = scratch_dir("etfce_warc_filings", sf_dir)
    write_warc(
        filings.select(_messy_url(F.col("filing_id")).alias("url"), "html"),
        out,
        n_files=4,
    )
    # ONE WARC scan serves both consumers — made true by the
    # localCheckpoint below (the filings discipline 20 lines up):
    # without it the urlcols broadcast job and the parse job each
    # re-read and re-gunzip every shard (round-9 review finding). The
    # crawl-hygiene columns (normalize_url / host_of — pure codegen)
    # ride the single scan.
    records = (
        read_warc(spark, os.path.join(out, "*.warc.gz"))
        .filter(F.col("warc_type") == "response")
        .select(
            # the path segment is variant-invariant: every raw shape
            # keeps /holdings/<id> intact (suffixes start ?, #, or /)
            F.regexp_extract("target_uri", r"/holdings/(\d+)", 1)
            .cast("bigint")
            .alias("filing_id"),
            F.lit(0).cast("int").alias("filing_seq"),
            F.col("payload").cast("string").alias("html"),
            F.col("target_uri").alias("url_raw"),
        )
        .withColumn("url_norm", normalize_url("url_raw"))
        .withColumn("__host", host_of("url_raw"))
        .localCheckpoint()
    )
    urlcols = registrable_domain_from_table(
        records.select("filing_id", "url_raw", "url_norm", "__host"),
        psl_rules(spark),
        host_col="__host",
        out_col="url_domain",
    ).drop("__host")
    warc_leg = _extract(
        parse_filings(records.select("filing_id", "filing_seq", "html")), "warc"
    ).join(F.broadcast(urlcols), "filing_id")
    return html_leg.unionByName(warc_leg)


# ---------------------------------------------------------------------------
# q52 — the reference's run() end-to-end as ONE lazy program: filing
# index → form-type filter → distributed parse → error filter →
# keep-last dedup per reporting date (amended filing wins, R19) →
# partitioned CSV sink (R20) → typed read-back → summary. The sink
# read-back is what the driver hashes, so the whole chain — including
# file layout and CSV round-trip — is under the oracle.
# ---------------------------------------------------------------------------
@query(
    "q52_doc_pipeline_e2e",
    oracle="""
    SELECT strftime(DATE '2024-03-31' + n_nationkey, '%Y-%m-%d') AS reporting_date,
           COUNT(*) AS n_holdings,
           CAST(ROUND(SUM(CAST(c_acctbal + 1 AS DECIMAL(14,4))), 2) AS DOUBLE) AS sum_value
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE n_nationkey % 7 <> 3
    GROUP BY 1
    """,
)
def q52_doc_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    # index: original (seq 0) + amendment (seq 1) + a non-NPORT filing
    # (seq 2, form OTHER) per nation; seqs 0/1 share a reporting date —
    # keep-last must keep the amendment's values.
    filings = _filings(spark, sf_dir, seqs=3)
    # R4 index filter BEFORE the opaque UDTF boundary: the non-NPORT
    # third of the index never reaches the expensive per-document work.
    filings = filings.filter(F.col("form_type") == "NPORT-P")

    parsed = parse_filings(filings)
    good = parsed.filter(F.col("error").isNull())

    # keep-last dedup: the highest filing_seq per reporting date wins
    # (reference R19: dict-key overwrite at :158).
    w = W.partitionBy("reporting_date")
    latest = good.withColumn("max_seq", F.max("filing_seq").over(w)).filter(
        F.col("filing_seq") == F.col("max_seq")
    )

    typed = latest.select(
        "reporting_date",
        "issuer",
        parse_money("value_str").alias("value_usd"),
    )
    out = os.path.join(
        tempfile.gettempdir(),
        f"etfce_doc_sink_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    (
        typed.repartition("reporting_date")
        .write.mode("overwrite")
        .option("header", True)
        .partitionBy("reporting_date")
        .csv(out)
    )
    back = spark.read.option("header", True).schema(
        "issuer string, value_usd decimal(38,6), reporting_date string"
    ).csv(out)
    return back.groupBy("reporting_date").agg(
        F.count(F.lit(1)).alias("n_holdings"),
        dsum(dec("value_usd"), "sum_value"),
    )
