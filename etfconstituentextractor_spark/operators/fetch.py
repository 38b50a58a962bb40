"""Executor-side HTTP document fetch stage — the reference's actual
transport, made distributed and observable.

The reference fetches over HTTP on the driver, sequentially: one GET
for the submissions index (`ETFQuarterlyHoldingsExtractor.py:30-39`)
and one blocking GET per filing inside the scrape loop (`:58-63`,
driven by the `iterrows` loop `:153-158`), with etiquette headers
(`:12-26`) but no session reuse, no retry, no backoff, no rate
limiting — failures print-and-skip (`:37`, `:62`).

Here the fetch is a `mapInPandas` stage over a URL frame:

- **transport-injectable**: callers pass ``transport_factory`` — a
  zero-arg callable built ONCE PER PARTITION whose result is called
  per URL (``transport(url, headers) -> (status, body)``). That is the
  session-reuse point: a production factory returns a pooled HTTP
  session; tests return deterministic fakes, so no network is needed
  or used in CI. When no factory is given, a stdlib urllib opener is
  built per partition (never exercised in tests).
- **bounded retry with exponential backoff**: transient statuses
  (429/5xx) and transport exceptions retry up to ``max_retries``
  attempts, sleeping ``backoff_base_s * 2**k`` between attempts.
  Non-retryable statuses (e.g. 404) fail immediately.
- **polite rate limiting**: each partition enforces a minimum
  interval of ``1/rate_limit_per_sec`` between request STARTS (the
  per-executor analogue of the reference's implicit
  one-request-at-a-time politeness).
- **failures become data**: every input row yields exactly one output
  row; errors land in an ``error`` column with the terminal status —
  at 100 TB failure rates are a groupBy, not a grep.

Clock and sleep are injectable so the retry/backoff/rate-limit
schedule is unit-testable without waiting.

Plan shape: like the parse stage (documents.py), the URL frame is
repartitioned to cluster parallelism before the opaque Python
boundary so fetches actually fan out instead of serializing on
however many partitions the upstream plan ended with.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

#: output schema of the fetch stage.
FETCH_SCHEMA = (
    "doc_id bigint, url string, status int, body string, "
    "error string, n_attempts int"
)

_OUT_COLS = ["doc_id", "url", "status", "body", "error", "n_attempts"]

#: statuses worth retrying (transient); everything else non-200 is a
#: permanent error for that URL.
RETRY_STATUSES = (429, 500, 502, 503, 504)

Transport = Callable[[str, dict], tuple[int, str]]


def default_transport_factory() -> Transport:
    """stdlib urllib opener, one per partition (reused across the
    partition's requests). Production would return a pooled-connection
    session instead; tests always inject a fake."""
    import urllib.request

    opener = urllib.request.build_opener()

    def transport(url: str, headers: dict) -> tuple[int, str]:
        req = urllib.request.Request(url, headers=headers)
        with opener.open(req, timeout=30) as resp:
            return resp.status, resp.read().decode("utf-8", errors="replace")

    return transport


def fetch_rows(
    rows: Iterator[tuple[int, str]],
    transport: Transport,
    headers: dict,
    max_retries: int,
    backoff_base_s: float,
    rate_limit_per_sec: float,
    clock: Callable[[], float],
    sleep: Callable[[float], None],
) -> Iterator[tuple]:
    """The per-partition fetch loop, factored out of the Spark stage so
    retry/backoff/rate-limit behavior is directly unit-testable.

    Yields one FETCH_SCHEMA tuple per input (doc_id, url)."""
    min_interval = 1.0 / rate_limit_per_sec if rate_limit_per_sec > 0 else 0.0
    last_start: float | None = None
    for doc_id, url in rows:
        status: int | None = None
        body: str | None = None
        error: str | None = None
        attempts = 0
        while attempts < max_retries:
            if last_start is not None and min_interval > 0:
                wait = last_start + min_interval - clock()
                if wait > 0:
                    sleep(wait)
            last_start = clock()
            attempts += 1
            try:
                status, body = transport(url, headers)
            except Exception as exc:  # transport failure — retryable
                status, body = None, None
                error = f"transport_error: {exc}"
            else:
                if status == 200:
                    error = None
                    break
                body = None
                error = f"http_status_{status}"
                if status not in RETRY_STATUSES:
                    break  # permanent (4xx): no retry
            if attempts < max_retries:
                sleep(backoff_base_s * (2 ** (attempts - 1)))
        yield (doc_id, url, status, body, error, attempts)


def fetch_documents(
    urls: DataFrame,
    transport_factory: Callable[[], Transport] | None = None,
    id_col: str = "doc_id",
    url_col: str = "url",
    headers: dict | None = None,
    max_retries: int = 3,
    backoff_base_s: float = 0.5,
    rate_limit_per_sec: float = 5.0,
) -> DataFrame:
    """Distributed document fetch: (id, url) frame in, FETCH_SCHEMA
    out — one row per input URL, success or not.

    The factory runs once per partition (session reuse); the transport
    runs once per attempt. See module docstring for the retry /
    backoff / rate-limit contract.
    """
    hdrs = dict(headers or {})
    factory = transport_factory or default_transport_factory
    n_tasks = urls.sparkSession.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        transport = factory()
        for pdf in batches:
            out = list(
                fetch_rows(
                    zip(pdf[id_col], pdf[url_col]),
                    transport,
                    hdrs,
                    max_retries,
                    backoff_base_s,
                    rate_limit_per_sec,
                    clock=time.monotonic,
                    sleep=time.sleep,
                )
            )
            yield pd.DataFrame(out, columns=_OUT_COLS)

    return (
        urls.select(urls[id_col].alias("doc_id"), urls[url_col].alias("url"))
        .repartition(n_tasks, "doc_id")
        .mapInPandas(gen, schema=FETCH_SCHEMA)
    )
