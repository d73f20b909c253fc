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


# ---------------------------------------------------------------------------
# bm25_topk / token_entropy
# ---------------------------------------------------------------------------

def test_bm25_mirror_and_plan(spark):
    """Hand corpus vs a pure-python BM25; the df/stats tables ride
    broadcasts and the explode filters to query terms before any shuffle."""
    import math

    import pandas as pd

    from esa_pfa_spark.operators.textstats import bm25_topk
    from tests.test_plans import plan_of

    corpus = [
        (0, "cat sat on the mat"),
        (1, "dog and cat"),
        (2, "dog dog dog kennel"),
        (3, "fish swim"),
    ]
    df = spark.createDataFrame(pd.DataFrame(corpus, columns=["doc_id", "text"]))
    out = bm25_topk(df, ["cat", "dog"], k=4)
    got = {r["doc_id"]: (r["dl"], r["n_hit"], r["score"]) for r in out.collect()}

    N = len(corpus)
    dls = {i: len(t.split(" ")) for i, t in corpus}
    avgdl = sum(dls.values()) / N
    tf = {(i, w): t.split(" ").count(w) for i, t in corpus for w in ("cat", "dog")}
    dfreq = {w: sum(1 for i, _ in corpus if tf[(i, w)] > 0) for w in ("cat", "dog")}
    want = {}
    for i, _ in corpus:
        s = 0.0
        hits = 0
        for w in ("cat", "dog"):
            if tf[(i, w)] == 0:
                continue
            hits += 1
            idf = math.log((N - dfreq[w] + 0.5) / (dfreq[w] + 0.5) + 1.0)
            s += round(idf * tf[(i, w)] * 2.2
                       / (tf[(i, w)] + 1.2 * (0.25 + 0.75 * dls[i] / avgdl)), 6)
        if hits:
            want[i] = (dls[i], hits, round(s, 6))
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0] and got[i][1] == want[i][1]
        assert abs(got[i][2] - want[i][2]) < 2e-6
    # the no-hit fish doc is absent; the two-term doc scores its two hits
    assert 3 not in got and got[1][1] == 2
    assert "BroadcastHashJoin" in plan_of(out)


def test_token_entropy_mirror(spark):
    """Entropy of hand-built token arrays: uniform -> ln(k), constant -> 0
    (entropy_norm null), mixed checked against numpy."""
    import numpy as np
    import pandas as pd

    from esa_pfa_spark.operators.textstats import token_entropy

    rows = [
        (0, [1, 2, 3, 4]),          # uniform over 4 -> ln 4
        (1, [7, 7, 7, 7, 7]),       # constant -> 0, norm null
        (2, [1, 1, 2, 3]),          # mixed
        (3, [5]),                   # singleton -> 0, norm null
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "tokens"]))
    got = {r["doc_id"]: r.asDict() for r in token_entropy(df).collect()}

    def ent(toks):
        _, c = np.unique(toks, return_counts=True)
        p = c / c.sum()
        return float(sum(round(float(-x * np.log(x)), 6) for x in p * 1.0)), len(c)

    for i, toks in rows:
        h_terms = 0.0
        vals, cnts = np.unique(toks, return_counts=True)
        for c in cnts:
            p = c / len(toks)
            h_terms += round(float(-p * np.log(p)), 6)
        h_terms = round(h_terms, 6)
        g = got[i]
        assert g["n_tok"] == len(toks) and g["n_distinct"] == len(vals)
        assert abs(g["entropy"] - h_terms) < 2e-6
        if len(vals) > 1:
            assert abs(g["entropy_norm"] - round(h_terms / float(np.log(len(vals))), 6)) < 2e-6
        else:
            assert g["entropy_norm"] is None
    assert abs(got[0]["entropy"] - float(np.log(4))) < 1e-5
    assert got[1]["entropy"] == 0.0


def test_gopher_rules_semantics(spark):
    """Each rule trips on a purpose-built doc and the clean doc passes."""
    import pandas as pd

    from esa_pfa_spark.operators.textstats import gopher_rules

    clean = "the cat and the dog have fun with every single word " * 5  # 60 words
    rows = [
        (0, clean.strip()),
        (1, "too short of the and"),                       # < 50 words
        (2, ("hypercomplicated " * 60).strip()),           # mean len > 10
        (3, ("the of " + "# " * 20 + "word " * 50).strip()),  # symbol ratio
        (4, ("123 456 " * 30 + "the of").strip()),          # alpha frac < 0.8
        (5, ("cat dog bird fish " * 15).strip()),           # no required stopwords
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}
    assert got[0]["keep"] == 1 and got[0]["n_failed"] == 0
    assert got[1]["fail_word_count"] == 1
    assert got[2]["fail_mean_len"] == 1
    assert got[3]["fail_symbol_ratio"] == 1
    assert got[4]["fail_alpha"] == 1
    assert got[5]["fail_stopwords"] == 1
    for i in range(1, 6):
        assert got[i]["keep"] == 0


def test_ccnet_ppl_buckets(spark):
    """Within each source the thirds are (near-)balanced, head scores
    dominate tail scores, and every doc is bucketed exactly once."""
    import pandas as pd

    from esa_pfa_spark.operators.textstats import ccnet_ppl_buckets

    # source A: 9 docs of graded typicality (common words repeat corpus-wide)
    rows = []
    for i in range(9):
        common = "the cat sat " * (9 - i)
        rare = f"zxq{i}a wvu{i}b " * (i + 1)
        rows.append((i, (common + rare).strip(), "A"))
    rows.append((100, "the cat sat on the mat", "B"))
    rows.append((101, "qqq www eee", "B"))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text", "source"]))
    got = {r["doc_id"]: r for r in ccnet_ppl_buckets(df).collect()}
    assert len(got) == len(rows)
    a = [got[i] for i in range(9)]
    n_by = {"head": 0, "middle": 0, "tail": 0}
    for r in a:
        n_by[r["ppl_bucket"]] += 1
    assert min(n_by.values()) >= 2  # terciles of 9 are 3/3/3

    heads = [r["avg_logprob"] for r in a if r["ppl_bucket"] == "head"]
    tails = [r["avg_logprob"] for r in a if r["ppl_bucket"] == "tail"]
    assert min(heads) > max(tails)
    # source B buckets independently of A
    assert got[100]["ppl_bucket"] == "head" and got[101]["ppl_bucket"] == "tail"


def test_bigram_logprob_backoff(spark):
    """Closed-form mirror on a hand corpus: seen bigrams use c(vw)/c(v),
    unseen back off to 0.4*c(w)/N, first word is its unigram; scrambled
    word order scores strictly worse than the canonical order; a
    single-word doc survives with its unigram score."""
    import math

    import pandas as pd

    from esa_pfa_spark.operators.textstats import bigram_logprob

    corpus = [
        (0, "the cat sat"),
        (1, "the cat sat"),
        (2, "the cat sat"),
        (3, "sat cat the"),   # same words, scrambled -> unseen bigrams
        (4, "cat"),           # single word
    ]
    df = spark.createDataFrame(pd.DataFrame(corpus, columns=["doc_id", "text"]))
    got = {r["doc_id"]: r.asDict() for r in bigram_logprob(df).collect()}
    assert set(got) == {0, 1, 2, 3, 4}

    from collections import Counter
    unic = Counter(w for _, t in corpus for w in t.split(" "))
    bigc = Counter(
        (a, b) for _, t in corpus for a, b in zip(t.split(" "), t.split(" ")[1:])
    )
    N = sum(unic.values())

    def score(text):
        ws = text.split(" ")
        terms = [round(math.log(unic[ws[0]] / N), 6)]
        for v, w in zip(ws, ws[1:]):
            if bigc[(v, w)] > 0:
                terms.append(round(math.log(bigc[(v, w)] / unic[v]), 6))
            else:
                terms.append(round(math.log(0.4 * unic[w] / N), 6))
        return round(sum(terms) / len(terms), 6)

    for d, t in corpus:
        assert abs(got[d]["avg_logprob"] - score(t)) < 2e-6, d
        assert got[d]["n_words"] == len(t.split(" "))
    assert got[3]["avg_logprob"] < got[0]["avg_logprob"]
