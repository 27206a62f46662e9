"""Gates for the evaluation harness (A4/M6 shape + the triple P/R gate)."""

from kgforge.eval import classification_report, triple_set_pr


def test_classification_report_matches_manual(spark):
    pairs = spark.createDataFrame(
        # PERIOD: tp=2, fp=1 (pred PERIOD, label COMMA), fn=1
        [("PERIOD", "PERIOD"), ("PERIOD", "PERIOD"), ("PERIOD", "COMMA"),
         ("COMMA", "PERIOD"), ("COMMA", "COMMA"),
         ("O", "O"), ("O", "PERIOD")],
        "label string, pred string",
    )
    got = {r["cls"]: r for r in classification_report(pairs).collect()}
    assert set(got) == {"PERIOD", "COMMA"}  # O excluded
    # PERIOD: tp=2, pred_n=4 (2 tp + 1 from COMMA + 1 from O), label_n=3
    assert got["PERIOD"]["precision"] == 0.5
    assert round(got["PERIOD"]["recall"], 6) == round(2 / 3, 6)
    assert got["PERIOD"]["support"] == 3
    # COMMA: tp=1, pred_n=2, label_n=2
    assert got["COMMA"]["precision"] == 0.5 and got["COMMA"]["recall"] == 0.5


def test_classification_report_zero_division_safe(spark):
    pairs = spark.createDataFrame(
        [("A", "B"), ("B", "B")], "label string, pred string"
    )
    got = {r["cls"]: r for r in classification_report(pairs).collect()}
    assert got["A"]["precision"] == 0.0 and got["A"]["recall"] == 0.0
    assert got["A"]["f1"] == 0.0


def test_triple_set_pr(spark):
    keys = "url string, sent_id int, subj string, pred string, obj string"
    got = spark.createDataFrame(
        [("u1", 0, "a", "r", "b"), ("u1", 1, "c", "r", "d"), ("u2", 0, "x", "r", "y")],
        keys,
    )
    want = spark.createDataFrame(
        [("u1", 0, "a", "r", "b"), ("u1", 1, "c", "r", "d"), ("u3", 0, "p", "r", "q")],
        keys,
    )
    pr = triple_set_pr(got, want)
    assert pr["precision"] == 2 / 3 and pr["recall"] == 2 / 3
