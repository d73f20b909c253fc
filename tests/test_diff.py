"""plans/diff.py snapshot diff — classification fixtures incl. NULL
transitions, and the plan contract (one shuffle join, co-partitioned)."""

from __future__ import annotations

from pyspark.sql import functions as F

from esa_pfa_spark.plans.diff import table_diff, table_diff_summary


def test_diff_classifies_all_four(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        "k long, t string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 9.0), (3, "c", 3.0), (5, "e", 5.0)],
        "k long, t string, v double",
    )
    d = {r["k"]: r for r in table_diff(old, new, ["k"]).collect()}
    assert d[1]["change_type"] == "unchanged"
    assert d[2]["change_type"] == "update" and d[2]["chg_v"] and not d[2]["chg_t"]
    # NULL -> value is a change (null-safe compare)
    assert d[3]["change_type"] == "update" and d[3]["chg_v"]
    assert d[4]["change_type"] == "delete"
    assert d[5]["change_type"] == "insert"
    summ = {r["change_type"]: r for r in table_diff_summary(old, new, ["k"]).collect()}
    assert summ["update"]["n_rows"] == 2 and summ["update"]["n_chg_v"] == 2
    assert summ["insert"]["n_rows"] == 1 and summ["delete"]["n_rows"] == 1


def test_diff_single_join_plan(spark):
    from tests.test_plans import n_exchanges, plan_of

    old = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    new = spark.range(90).select(F.col("id").alias("k"), (F.col("id") * 2 + F.col("id") % 7).alias("v"))
    plan = plan_of(table_diff(old, new, ["k"], ["v"]), "simple")
    # one exchange per side of the single full-outer join, nothing more
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") == 1
    assert n_exchanges(plan) <= 2, plan


def test_diff_duplicate_key_fails_loudly_when_validated(spark):
    # Duplicate keys cross-multiply through the full-outer join and would
    # silently inflate the audit counts; with validate_keys=True the job
    # must fail instead (the documented per-unique-key precondition).
    import pytest

    old = spark.createDataFrame([(1, 1.0), (1, 2.0), (2, 3.0)], "k long, v double")
    new = spark.createDataFrame([(1, 1.0), (2, 3.0)], "k long, v double")
    with pytest.raises(Exception, match="duplicate key in 'old' snapshot"):
        table_diff(old, new, ["k"], validate_keys=True).collect()
    # ...and a clean pair still diffs identically with the guard on.
    clean_old = spark.createDataFrame([(1, 1.0), (2, 3.0)], "k long, v double")
    rows = {
        r["k"]: r["change_type"]
        for r in table_diff(clean_old, new, ["k"], validate_keys=True).collect()
    }
    assert rows == {1: "unchanged", 2: "unchanged"}


def test_diff_duplicate_key_inflation_documented(spark):
    # Without validation, the inflation the guard exists for: key 1 is
    # duplicated in old (2 rows x 1 new row = 2 join rows), so 2 unique
    # keys come back as 3 classified rows — a wrong audit, silently.
    old = spark.createDataFrame([(1, 1.0), (1, 2.0), (2, 3.0)], "k long, v double")
    new = spark.createDataFrame([(1, 1.0), (2, 3.0)], "k long, v double")
    assert table_diff(old, new, ["k"]).count() == 3
