"""Evaluation harness: per-class precision/recall/F1 report (the shape of
the reference's sklearn ``classification_report`` at
/root/reference/dbpunctuator/training/evalute.py:118-131, which excludes
the ``O`` tag) plus the triple-set P/R gate used against the oracle
(SURVEY.md §5.2-3, BASELINE.md P/R ≥ 0.95)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def classification_report(
    pairs: DataFrame,
    label_col: str = "label",
    pred_col: str = "pred",
    exclude: tuple[str, ...] = ("O",),
) -> DataFrame:
    """(label, pred) rows → per-class (cls, precision, recall, f1, support),
    excluding ``exclude`` classes from the report (evalute.py:118-131
    semantics). One shuffle (groupBy label,pred); the three totals reuse
    the tiny confusion matrix."""
    cm = (
        pairs.select(
            F.col(label_col).alias("label"), F.col(pred_col).alias("pred")
        )
        .groupBy("label", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tp = cm.where(F.col("label") == F.col("pred")).select(
        F.col("label").alias("cls"), F.col("n").alias("tp")
    )
    pred_tot = cm.groupBy("pred").agg(F.sum("n").alias("pred_n"))
    label_tot = cm.groupBy("label").agg(F.sum("n").alias("label_n"))
    # classes = union of observed labels AND predictions (sklearn
    # semantics): a hallucinated tag that never appears in gold still gets
    # a row (precision 0, support 0)
    classes = (
        cm.select(F.col("label").alias("cls"))
        .union(cm.select(F.col("pred").alias("cls")))
        .distinct()
    )
    report = (
        classes.join(tp, "cls", "left")
        .join(pred_tot, classes["cls"] == pred_tot["pred"], "left")
        .join(label_tot, classes["cls"] == label_tot["label"], "left")
        .select(
            "cls",
            (F.coalesce(F.col("tp"), F.lit(0)) / F.coalesce(F.col("pred_n"), F.lit(1)))
            .alias("precision"),
            (
                F.coalesce(F.col("tp"), F.lit(0))
                / F.coalesce(F.col("label_n"), F.lit(1))
            ).alias("recall"),
            F.coalesce(F.col("label_n"), F.lit(0)).alias("support"),
        )
        .where(~F.col("cls").isin(*exclude))
    )
    f1 = (
        2
        * F.col("precision")
        * F.col("recall")
        / F.when(
            (F.col("precision") + F.col("recall")) > 0,
            F.col("precision") + F.col("recall"),
        ).otherwise(F.lit(1.0))
    )
    return report.select(
        "cls",
        F.round("precision", 6).alias("precision"),
        F.round("recall", 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
        "support",
    )


def triple_set_pr(
    got: DataFrame, want: DataFrame, keys: tuple[str, ...] = ("url", "sent_id", "subj", "pred", "obj")
) -> dict[str, float]:
    """Set-level precision/recall of extracted triples vs the oracle set —
    the BASELINE.md gate (≥ 0.95 both). Computed with two distinct-joins,
    no collect of the triple data."""
    g = got.select(*keys).distinct()
    w = want.select(*keys).distinct()
    n_got = g.count()
    n_want = w.count()
    n_tp = g.join(w, list(keys), "inner").count()
    return {
        "precision": n_tp / n_got if n_got else 0.0,
        "recall": n_tp / n_want if n_want else 0.0,
        "tp": float(n_tp),
        "got": float(n_got),
        "want": float(n_want),
    }
