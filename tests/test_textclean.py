"""c4_line_filter / encoding_garbage / redact_pii edge cases (the oracle
mirror covers end-to-end parity at sf0.01; these pin the gates on
hand-built rows)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from esa_pfa_spark.operators.textstats import (
    c4_line_filter,
    encoding_garbage,
    redact_pii,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def test_c4_gates(spark):
    df = _docs(spark, [
        "Good line with words here.\nshort.\nno terminal punct at all\n"
        "contains javascript banned.\nAnother keeper sentence stands well!",
        "",
    ])
    out = {r["doc_id"]: r for r in c4_line_filter(df).collect()}
    # doc 0: keepers are line 1 and line 5; short fails min_words,
    # unpunctuated fails the terminal gate, 'javascript' is banned
    assert out[0]["n_lines"] == 5 and out[0]["n_kept"] == 2
    assert out[0]["clean_text"] == (
        "Good line with words here.\nAnother keeper sentence stands well!"
    )
    # empty doc: split('') -> one empty line, nothing kept
    assert out[1]["n_kept"] == 0 and out[1]["clean_text"] == ""


def test_c4_ban_case_insensitive(spark):
    df = _docs(spark, ["This has LOREM IPSUM filler inside it."])
    out = c4_line_filter(df).collect()[0]
    assert out["n_kept"] == 0


def test_encoding_garbage_counts(spark):
    df = _docs(spark, ["clean ascii text", "bad �� decode", "ctrl\x07here", "café"])
    rows = {r["doc_id"]: r for r in encoding_garbage(df).collect()}
    assert rows[0]["n_replacement"] == 0 and rows[0]["n_control"] == 0
    assert rows[0]["nonascii_ratio"] == 0.0
    assert rows[1]["n_replacement"] == 2
    assert rows[2]["n_control"] == 1
    assert rows[3]["n_replacement"] == 0
    assert rows[3]["nonascii_ratio"] == round(1 / 4, 6)


def test_redact_pii_order_and_counts(spark):
    # the IP-like digits inside an email must count as EMAIL, not IPV4
    df = _docs(spark, [
        "mail me at a.b@10.1.2.3.example.com or at 10.9.8.7 or +44 123 4567",
        "nothing here",
    ])
    rows = {r["doc_id"]: r for r in redact_pii(df).collect()}
    r = rows[0]
    assert r["n_email"] == 1 and r["n_ipv4"] == 1 and r["n_phone"] == 1
    assert "<EMAIL>" in r["clean_text"] and "<IPV4>" in r["clean_text"]
    assert "<PHONE>" in r["clean_text"]
    assert "10.9.8.7" not in r["clean_text"]
    r1 = rows[1]
    assert (r1["n_email"], r1["n_ipv4"], r1["n_phone"]) == (0, 0, 0)
    assert r1["clean_text"] == "nothing here"
