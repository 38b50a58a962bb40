"""Malformed-input handling at the source boundary (SURVEY.md §1.3 /
§2A R15-R16: every reference extraction is None-guarded and records
with no extracted fields are dropped — the engine's equivalent at the
SOURCE is Spark's per-record parse modes, pinned here on planted bad
files so the behavior is a tested contract, not an accident):

- PERMISSIVE (default): bad record → nulls + the raw line captured in
  a `_corrupt_record` column (the error-column pattern q50's document
  parser uses, applied by the built-in readers);
- DROPMALFORMED: bad records silently vanish;
- FAILFAST: the read raises on first bad record.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException  # noqa: F401


@pytest.fixture(scope="module")
def bad_json_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("mal") / "docs.jsonl"
    p.write_text(
        '{"id": 1, "v": 10.5}\n'
        "{this is not json}\n"
        '{"id": 3, "v": "not-a-number"}\n'
        '{"id": 4, "v": 2.5}\n'
    )
    return str(p)


@pytest.fixture(scope="module")
def bad_csv_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("mal") / "docs.csv"
    p.write_text(
        "id,v\n"
        "1,10.5\n"
        "2,notanumber\n"
        "3,2.5\n"
    )
    return str(p)


_JSON_DDL = "id bigint, v double, _corrupt_record string"


def test_json_permissive_keeps_error_column(spark, bad_json_path):
    df = spark.read.schema(_JSON_DDL).json(bad_json_path)
    rows = {r.id: r for r in df.collect()}
    # well-formed rows parse; id=3 has a type mismatch on v only
    assert rows[1].v == 10.5 and rows[1]._corrupt_record is None
    assert rows[4].v == 2.5
    # structurally broken line -> all-null fields + raw text captured
    bad = [r for r in rows.values() if r.id is None]
    assert len(bad) == 1
    assert bad[0]._corrupt_record.startswith("{this is not")
    # type-mismatch line: corrupt record captured, row retained
    assert rows.get(3) is None or rows[3]._corrupt_record is not None


def test_json_dropmalformed_drops_silently(spark, bad_json_path):
    df = (
        spark.read.schema("id bigint, v double")
        .option("mode", "DROPMALFORMED")
        .json(bad_json_path)
    )
    ids = sorted(r.id for r in df.collect())
    assert ids == [1, 4]


def test_json_failfast_raises(spark, bad_json_path):
    df = (
        spark.read.schema("id bigint, v double")
        .option("mode", "FAILFAST")
        .json(bad_json_path)
    )
    with pytest.raises(Exception) as ei:
        df.collect()
    assert "Malformed" in str(ei.value) or "FAILFAST" in str(ei.value)


def test_csv_permissive_and_dropmalformed(spark, bad_csv_path):
    perm = (
        spark.read.schema("id bigint, v double, _corrupt_record string")
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .csv(bad_csv_path)
    )
    rows = {r.id: r for r in perm.collect()}
    assert rows[1].v == 10.5 and rows[1]._corrupt_record is None
    assert rows[2].v is None and rows[2]._corrupt_record == "2,notanumber"
    assert rows[3].v == 2.5

    dropped = (
        spark.read.schema("id bigint, v double")
        .option("header", True)
        .option("mode", "DROPMALFORMED")
        .csv(bad_csv_path)
    )
    assert sorted(r.id for r in dropped.collect()) == [1, 3]


def test_corrupt_quarantine_split(spark, bad_json_path):
    """The production pattern the reference's drop-all-null guard
    (R16, :129-130) maps to: split the permissive read into a clean
    frame and a quarantine frame in ONE scan's lineage — no re-read,
    and nothing silently lost.

    Gotcha pinned here: Spark disallows queries whose referenced
    columns are ONLY the internal corrupt-record column (the parser
    would have to re-read just to reproduce raw lines) — the
    documented workaround is caching the parsed frame before the
    split, which is also what a quarantine pipeline wants anyway
    (one parse, two consumers)."""
    df = spark.read.schema(_JSON_DDL).json(bad_json_path).cache()
    clean = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    quarantine = df.filter(F.col("_corrupt_record").isNotNull()).select(
        "_corrupt_record"
    )
    assert clean.count() + quarantine.count() == df.count()
    assert quarantine.count() >= 1
    assert set(clean.columns) == {"id", "v"}


def test_compressed_text_sources_read_transparently(spark, tmp_path):
    """Corpus dumps arrive gzipped; Spark's text sources must
    round-trip compressed files transparently (codec from the file
    extension on read — no option needed) for CSV and JSON lines,
    with splittable-codec caveats left to the parquet path."""
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        "id",
        F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"),
    )
    csv_dir = str(tmp_path / "c")
    json_dir = str(tmp_path / "j")
    df.coalesce(1).write.option("compression", "gzip").option("header", True).csv(csv_dir)
    df.coalesce(1).write.option("compression", "gzip").json(json_dir)

    import glob

    assert glob.glob(csv_dir + "/*.csv.gz"), "csv sink must emit .gz parts"
    assert glob.glob(json_dir + "/*.json.gz"), "json sink must emit .gz parts"

    csv_back = (
        spark.read.option("header", True)
        .schema("id bigint, text string")
        .csv(csv_dir)
    )
    json_back = spark.read.schema("id bigint, text string").json(json_dir)
    want = {(r["id"], r["text"]) for r in df.collect()}
    assert {(r["id"], r["text"]) for r in csv_back.collect()} == want
    assert {(r["id"], r["text"]) for r in json_back.collect()} == want
