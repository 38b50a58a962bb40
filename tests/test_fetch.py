"""Executor-side HTTP fetch stage (operators/fetch.py) — validated
entirely against fake transports; no network is used.

Covers the capabilities the reference exercises over real HTTP
(ETFQuarterlyHoldingsExtractor.py:30-39 index GET, :58-63 per-filing
GET) plus the production behaviors it lacks: per-partition session
reuse, bounded retry with exponential backoff, rate limiting, and
errors-as-data instead of print-and-skip (:37, :62)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from etfconstituentextractor_spark.operators.documents import parse_filings
from etfconstituentextractor_spark.operators.fetch import fetch_documents, fetch_rows


# ---------------------------------------------------------------------------
# fetch_rows — the per-partition loop with an injected clock: the
# retry/backoff/rate-limit schedule is asserted exactly.
# ---------------------------------------------------------------------------
class _FakeClock:
    def __init__(self):
        self.t = 0.0
        self.sleeps: list[float] = []

    def clock(self) -> float:
        return self.t

    def sleep(self, d: float) -> None:
        self.sleeps.append(round(d, 6))
        self.t += d


def _run(rows, transport, clock, rate=0.0, retries=3, backoff=0.5):
    return list(
        fetch_rows(
            iter(rows),
            transport,
            headers={"User-Agent": "test"},
            max_retries=retries,
            backoff_base_s=backoff,
            rate_limit_per_sec=rate,
            clock=clock.clock,
            sleep=clock.sleep,
        )
    )


def test_fetch_rows_success_retry_permanent_and_exhaustion():
    calls: dict[str, int] = {}

    def transport(url, headers):
        assert headers == {"User-Agent": "test"}
        calls[url] = calls.get(url, 0) + 1
        if url == "ok":
            return 200, "body-ok"
        if url == "flaky":  # transient 500, then succeeds
            return (500, "oops") if calls[url] == 1 else (200, "body-flaky")
        if url == "gone":
            return 404, "nope"
        raise ConnectionError("boom")

    ck = _FakeClock()
    out = _run([(1, "ok"), (2, "flaky"), (3, "gone"), (4, "dead")], transport, ck)

    assert out[0] == (1, "ok", 200, "body-ok", None, 1)
    assert out[1] == (2, "flaky", 200, "body-flaky", None, 2)
    # 404 is permanent: exactly one attempt, error recorded, no body
    assert out[2] == (3, "gone", 404, None, "http_status_404", 1)
    # exceptions retry to exhaustion
    did, _, status, body, error, attempts = out[3]
    assert (did, status, body, attempts) == (4, None, None, 3)
    assert error.startswith("transport_error: boom")
    # backoff schedule: one 0.5s for flaky's retry; 0.5 + 1.0 for dead
    assert ck.sleeps == [0.5, 0.5, 1.0]


def test_fetch_rows_rate_limit_spacing():
    ck = _FakeClock()
    _run(
        [(i, f"u{i}") for i in range(3)],
        lambda url, headers: (200, "x"),
        ck,
        rate=2.0,
    )
    # first request starts immediately; each later START waits out the
    # 0.5s minimum interval (clock only advances via sleep here)
    assert ck.sleeps == [0.5, 0.5]


# ---------------------------------------------------------------------------
# fetch_documents — the distributed stage with a fake per-partition
# session: statuses/errors as data, one output row per URL, and the
# factory's result (the "session") reused across a partition's rows.
# ---------------------------------------------------------------------------
def _session_factory():
    token = uuid.uuid4().hex  # one per factory call = one per partition

    def transport(url, headers):
        if "missing" in url:
            return 404, ""
        return 200, f"{token}|{url}"

    return transport


def test_fetch_documents_distributed(spark):
    urls = spark.createDataFrame(
        [(i, f"https://example.test/doc/{'missing' if i % 5 == 0 else 'ok'}/{i}") for i in range(20)],
        "doc_id bigint, url string",
    )
    out = fetch_documents(urls, transport_factory=_session_factory).collect()

    assert len(out) == 20  # every input row accounted for
    ok = [r for r in out if r.error is None]
    bad = [r for r in out if r.error is not None]
    assert len(bad) == 4 and all(r.error == "http_status_404" and r.status == 404 for r in bad)
    assert all(r.status == 200 and r.body.endswith(r.url) for r in ok)
    # session reuse: rows share their partition's factory token — far
    # fewer distinct sessions than rows
    tokens = {r.body.split("|")[0] for r in ok}
    assert len(tokens) <= spark.sparkContext.defaultParallelism


_FILING_HTML = (
    "<html><body><h4>FORM NPORT-P</h4>"
    "<table><tr><td>Reporting date</td><td>2024-03-31</td></tr></table>"
    "<h1>Portfolio investment</h1><table>"
    "<tr><td>Name of Issuer</td><td>ACME CORP {i}</td></tr>"
    "<tr><td>Number of Shares</td><td>1,000</td></tr>"
    "<tr><td>Value (USD)</td><td>5,000.00</td></tr>"
    "<tr><td>Pct of Net Assets</td><td>1.5</td></tr>"
    "</table></body></html>"
)


def _filing_factory():
    def transport(url, headers):
        i = url.rsplit("/", 1)[-1]
        if i == "7":
            return 404, ""
        return 200, _FILING_HTML.replace("{i}", i)

    return transport


def test_fetch_then_parse_pipeline(spark):
    """The reference's run() transport+parse, composed distributedly:
    fetch stage feeds the doc→rows UDTF; HTTP failures and parse
    results stay observable side by side (R7+R8-R17 as one lazy
    plan)."""
    urls = spark.createDataFrame(
        [(i, f"https://example.test/filing/{i}") for i in range(10)],
        "doc_id bigint, url string",
    )
    fetched = fetch_documents(urls, transport_factory=_filing_factory)
    parsed = parse_filings(
        fetched.filter(F.col("error").isNull()).select(
            F.col("doc_id").alias("filing_id"),
            F.lit(1).alias("filing_seq"),
            F.col("body").alias("html"),
        )
    )
    rows = parsed.collect()
    assert len(rows) == 9  # one 404 skipped before the parse stage
    assert all(r.error is None and r.reporting_date == "2024-03-31" for r in rows)
    issuers = {r.issuer for r in rows}
    assert issuers == {f"ACME CORP {i}" for i in range(10) if i != 7}
