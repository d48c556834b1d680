"""PII screening/redaction (functions/text.py EMAIL_RE / PHONE_RE):
the phone pattern requires 7-15 actual digits with short separator
runs, so year ranges and sparse numeric text survive redaction."""

from pyspark.sql import functions as F

from rdf_spark.functions.text import pii_counts, redact_pii


def _redact(spark, text):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(
        redact_pii(F.col("t")).alias("r"),
        pii_counts(F.col("t")).alias("c"),
    ).first()


def test_phone_requires_digit_count(spark):
    r = _redact(spark, "served 2020 - 2023 in the office")
    assert r["r"] == "served 2020 - 2023 in the office"
    assert r["c"]["n_phones"] == 0


def test_real_phones_redacted(spark):
    for t in ("+1 (555) 123-4567", "call 555 123 4567 now",
              "+44 20 7946 0958"):
        r = _redact(spark, t)
        assert "<PHONE>" in r["r"], t
        assert r["c"]["n_phones"] == 1, t


def test_short_ids_and_quantities_survive(spark):
    r = _redact(spark, "order 123456 shipped 2024")
    assert r["r"] == "order 123456 shipped 2024"
    assert r["c"]["n_phones"] == 0


def test_email_and_phone_combined(spark):
    r = _redact(spark, "a@b.example or +1 555 000 1111")
    assert r["r"] == "<EMAIL> or <PHONE>"
    assert r["c"]["n_emails"] == 1 and r["c"]["n_phones"] == 1
