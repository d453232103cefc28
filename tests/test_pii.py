"""PII redaction: pattern hits, chaining order, and count semantics."""

import pytest

from bid_evaluation_spark.operators import pii as P


@pytest.fixture
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@sub.example.org today"),
            (2, "server 192.168.0.1 and 10.0.0.255 up"),
            (3, "ssn 123-45-6789 phone 555-123-4567"),
            (4, "nothing sensitive here"),
            (5, "two mails a@b.io c@d.co and ip 1.2.3.4"),
        ],
        "doc_id long, text string",
    )


def by_id(df, key="doc_id"):
    return {r[key]: r.asDict() for r in df.collect()}


def test_redact_each_kind(docs):
    r = by_id(P.redact_pii(docs))
    assert r[1]["text"] == "mail me at <EMAIL> today"
    assert r[2]["text"] == "server <IP> and <IP> up"
    assert r[3]["text"] == "ssn <SSN> phone <PHONE>"
    assert r[4]["text"] == "nothing sensitive here"
    assert r[5]["text"] == "two mails <EMAIL> <EMAIL> and ip <IP>"


def test_counts_on_original(docs):
    r = by_id(P.redact_pii(docs))
    assert (r[5]["n_email"], r[5]["n_ipv4"]) == (2, 1)
    assert (r[3]["n_ssn"], r[3]["n_phone"]) == (1, 1)
    assert all(r[4][k] == 0 for k in ("n_email", "n_ipv4", "n_ssn", "n_phone"))


def test_pii_counts_only(docs):
    r = by_id(P.pii_counts(docs))
    assert r[2]["n_ipv4"] == 2
    assert r[2]["text"].startswith("server 192")  # text untouched


def test_no_counts_flag(docs):
    cols = P.redact_pii(docs, with_counts=False).columns
    assert cols == ["doc_id", "text"]


def test_ssn_phone_disjoint(spark):
    # a phone is not an SSN and vice versa (group widths differ)
    df = spark.createDataFrame(
        [(1, "555-123-4567"), (2, "123-45-6789")], "doc_id long, text string")
    r = by_id(P.redact_pii(df))
    assert r[1]["text"] == "<PHONE>" and r[1]["n_ssn"] == 0
    assert r[2]["text"] == "<SSN>" and r[2]["n_phone"] == 0


def test_email_consumed_before_ip(spark):
    # digits inside an email's domain never surface as an IP match
    df = spark.createDataFrame([(1, "x 10.0.0.1@10.0.0.1.com y")],
                               "doc_id long, text string")
    r = by_id(P.redact_pii(df))
    assert r[1]["text"] == "x <EMAIL> y"
