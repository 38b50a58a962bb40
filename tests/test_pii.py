"""Planted-fixture tests for the PII scrub stage (operators/pii.py).

The synthetic corpus contains no PII-shaped strings, so — like the
HTTP fetch stage — this operator is verified on hand-written rows
with exact expected counts and redactions, plus a plan assertion
that the stage stays Python-free.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from etfconstituentextractor_spark.operators.pii import scrub


def _one(spark, text: str):
    df = spark.createDataFrame([(1, text)], "id bigint, text string")
    return scrub(df).collect()[0]


def test_email_detected_and_redacted(spark):
    r = _one(spark, "contact jane.doe+x@example.co.uk for details")
    assert r.pii_counts.email == 1
    assert r.pii_total == 1
    assert r.text_redacted == "contact [EMAIL] for details"


def test_phone_and_ssn_disjoint(spark):
    r = _one(spark, "call 555-867-5309 or fax (212) 555-0100; ssn 123-45-6789")
    assert r.pii_counts.phone == 2
    assert r.pii_counts.ssn == 1
    assert r.pii_counts.card == 0
    assert "[PHONE]" in r.text_redacted and "[SSN]" in r.text_redacted
    assert not any(ch.isdigit() for ch in r.text_redacted)


def test_card_beats_phone_grouping(spark):
    # 4x4 grouped digits must be [CARD], not chewed up as phones
    r = _one(spark, "pay 4111 1111 1111 1111 now, plain 4111111111111111 too")
    assert r.pii_counts.card == 2
    assert r.text_redacted == "pay [CARD] now, plain [CARD] too"
    # inconsistent separators are NOT a card (backreference)
    r2 = _one(spark, "ref 1111 2222-3333 4444 code")
    assert r2.pii_counts.card == 0


def test_ipv4(spark):
    r = _one(spark, "peer at 192.168.0.1 and 10.0.0.254")
    assert r.pii_counts.ipv4 == 2
    assert r.text_redacted == "peer at [IP] and [IP]"


def test_clean_text_untouched_and_idempotent(spark):
    clean = "the quick brown fox jumps over the lazy dog"
    r = _one(spark, clean)
    assert r.pii_total == 0
    assert r.text_redacted == clean
    # redacting already-redacted text is a no-op
    mixed = _one(spark, "mail a@b.io at 10.0.0.1")
    again = _one(spark, mixed.text_redacted)
    assert again.pii_total == 0
    assert again.text_redacted == mixed.text_redacted


def test_scrub_plan_is_python_free(spark):
    df = spark.createDataFrame([(1, "x")], "id bigint, text string")
    plan = scrub(df)._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
