"""Footer-probe contracts of the unit-aware events loader
(sources/tables.py): the ts unit AND timezone-adjustment flag are read
from the parquet footer per corpus state, never assumed.

The corpus has shipped events.ts as both TIMESTAMP(NANOS) and
TIMESTAMP(MICROS) across refreshes; these tests synthesize all the
footer variants (micros NTZ, micros tz-adjusted, nanos) plus the
staleness and layout modes the advice flagged: an in-place rewrite
that flips the unit mid-process must re-probe (mtime-keyed cache), and
a directory-partitioned layout must probe recursively.
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etfconstituentextractor_spark.sources.tables import _events_ts_meta, _load_events

_ROWS = [
    (1, datetime.datetime(2024, 3, 1, 12, 30, 45, 123456), 7, "click", 1.5, "{}"),
    (2, datetime.datetime(2024, 3, 2, 1, 2, 3, 654321), 8, "view", 2.5, "{}"),
]


def _write_events(path: str, unit: str, tz: str | None) -> None:
    ids, tss, uids, types_, vals, props = zip(*_ROWS)
    tbl = pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array(list(tss), pa.timestamp(unit, tz)),
            "user_id": pa.array(uids, pa.int64()),
            "event_type": pa.array(types_, pa.string()),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(props, pa.string()),
        }
    )
    pq.write_table(tbl, path)


def _loaded_ts(spark, path):
    rows = _load_events(spark, path).orderBy("event_id").collect()
    assert [r.event_id for r in rows] == [1, 2]
    return [r.ts for r in rows]


@pytest.mark.parametrize(
    "unit,tz", [("us", None), ("us", "UTC"), ("ns", None)],
    ids=["micros-ntz", "micros-utc", "nanos"],
)
def test_all_footer_variants_read_identical_wallclock(spark, tmp_path, unit, tz):
    p = str(tmp_path / "events.parquet")
    _write_events(p, unit, tz)
    assert _events_ts_meta(p) == (unit, tz)
    # every variant must produce the same NTZ wall-clock values
    assert _loaded_ts(spark, p) == [r[1] for r in _ROWS]


def test_probe_reprobes_after_inplace_rewrite(spark, tmp_path):
    p = str(tmp_path / "events.parquet")
    _write_events(p, "us", None)
    assert _events_ts_meta(p)[0] == "us"
    # in-place refresh flips the unit; bump mtime past fs granularity
    _write_events(p, "ns", None)
    st = os.stat(p)
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    assert _events_ts_meta(p)[0] == "ns"
    assert _loaded_ts(spark, p) == [r[1] for r in _ROWS]


def test_probe_descends_partitioned_directory(tmp_path):
    d = tmp_path / "events.parquet"
    (d / "day=2024-03-01").mkdir(parents=True)
    _write_events(str(d / "day=2024-03-01" / "part-0.parquet"), "us", None)
    assert _events_ts_meta(str(d)) == ("us", None)


def test_tz_adjusted_requires_utc_session(spark, tmp_path):
    p = str(tmp_path / "events.parquet")
    _write_events(p, "us", "UTC")
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(RuntimeError, match="tz-adjusted"):
            _load_events(spark, p)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
