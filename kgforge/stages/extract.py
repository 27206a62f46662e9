"""Stage B — sentence split + triple extraction.

Sentence split is pure JVM-side Catalyst work (``split`` + ``posexplode``
inside WholeStageCodegen — no shuffle, no Python). Triple extraction calls
the shared pure extractor (kgforge.extract.triples) inside one Arrow-batched
``mapInPandas``. Neither stage shuffles; parallelism is inherited from the
input partitioning, so the plan scales linearly with executors.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.extract.triples import extract_triples

SENTENCES_SCHEMA = (
    "url string, warc_ts timestamp, lang string, sent_id int, sentence string"
)
TRIPLES_SCHEMA = (
    "url string, warc_ts timestamp, sent_id int, "
    "subj string, pred string, obj string, conf double"
)

# ender chars per language family (kgforge.extract.triples.split_sentences)
_EN_SPLIT = r"(?<=[.?!])\s+"
_ZH_SPLIT = r"(?<=[。？！?!])\s*"


def sentences(norm: DataFrame) -> DataFrame:
    """norm_text(url, lang, text_norm, ...) → sentences(url, sent_id,
    sentence). Trailing empty split parts are filtered; mid-document empty
    parts cannot occur (English enders always carry a following space, zh
    split is zero-width), so ``sent_id`` equals the oracle's enumeration."""
    parts = F.when(
        F.col("lang") == "zh", F.split("text_norm", _ZH_SPLIT)
    ).otherwise(F.split("text_norm", _EN_SPLIT))
    return (
        norm.select(
            "url",
            "warc_ts",
            "lang",
            F.posexplode(parts).alias("sent_id", "sentence"),
        )
        .withColumn("sentence", F.trim("sentence"))
        .filter(F.length("sentence") > 0)
    )


def triples(sentences_df: DataFrame) -> DataFrame:
    """sentences → triples_raw(url, sent_id, subj, pred, obj, conf)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls: list[str] = []
            tss: list = []
            sids: list[int] = []
            subjs: list[str] = []
            preds: list[str] = []
            objs: list[str] = []
            confs: list[float] = []
            for url, ts, lang, sid, sentence in zip(
                pdf["url"].tolist(),
                pdf["warc_ts"].tolist(),
                pdf["lang"].tolist(),
                pdf["sent_id"].tolist(),
                pdf["sentence"].tolist(),
            ):
                for subj, pred, obj, conf in extract_triples(sentence, lang or "en"):
                    urls.append(url)
                    tss.append(ts)
                    sids.append(sid)
                    subjs.append(subj)
                    preds.append(pred)
                    objs.append(obj)
                    confs.append(conf)
            yield pd.DataFrame(
                {
                    "url": pd.Series(urls, dtype="object"),
                    "warc_ts": pd.Series(tss, dtype="datetime64[us]"),
                    "sent_id": pd.Series(sids, dtype="int32"),
                    "subj": pd.Series(subjs, dtype="object"),
                    "pred": pd.Series(preds, dtype="object"),
                    "obj": pd.Series(objs, dtype="object"),
                    "conf": pd.Series(confs, dtype="float64"),
                }
            )

    return sentences_df.mapInPandas(run, TRIPLES_SCHEMA)
