"""Stage E (training-data export): cleaned text → token/tag corpus →
deterministic re-chunked training samples (S5/S6/R2/R3/R7, SURVEY §2).

The reference round-trips through files between every step
(data_process.py:59-67 → generate_corpus re-reads at :173); the engine
keeps the data columnar end-to-end and only materializes the final TSV if
an export path is given.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_TAG_SCHEMA = "doc_id string, tokens array<string>, tags array<string>"
CHUNK_SCHEMA = (
    "doc_id string, chunk_id int, tokens array<string>, tags array<string>"
)


def token_tag_corpus(
    cleaned: DataFrame, ner_mapping: dict[str, str] | None = None
) -> DataFrame:
    """cleaned(doc_id, line) → (doc_id, tokens, tags) via the oracle
    ``process_line`` state machine (R2) in one Arrow-batched stage."""
    from kgforge.textnorm.constants import DEFAULT_ENGLISH_NER_MAPPING

    mapping = ner_mapping or DEFAULT_ENGLISH_NER_MAPPING

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from kgforge.textnorm.cleaning import process_line

        for pdf in batches:
            ids, toks, tags = [], [], []
            for doc_id, line in zip(pdf["doc_id"].tolist(), pdf["line"].tolist()):
                token_list, tag_list = process_line(line or "", mapping)
                ids.append(doc_id)
                toks.append(token_list)
                tags.append(tag_list)
            yield pd.DataFrame({"doc_id": ids, "tokens": toks, "tags": tags})

    return cleaned.select("doc_id", "line").mapInPandas(run, TOKEN_TAG_SCHEMA)


def rechunk_corpus(
    corpus: DataFrame, min_sequence_length: int, max_sequence_length: int
) -> DataFrame:
    """R3: deterministic per-doc re-chunking into training samples —
    chunk lengths are hash-of-(doc_id, chunk_ordinal), so output is
    identical under any partitioning or resume (SURVEY §4.3-5)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from kgforge.textnorm.corpus import rechunk_doc

        for pdf in batches:
            ids, cids, toks, tags = [], [], [], []
            for doc_id, token_list, tag_list in zip(
                pdf["doc_id"].tolist(), pdf["tokens"].tolist(), pdf["tags"].tolist()
            ):
                chunks = rechunk_doc(
                    list(token_list),
                    list(tag_list),
                    str(doc_id),
                    min_sequence_length,
                    max_sequence_length,
                )
                for cid, (tok, tag) in enumerate(chunks):
                    ids.append(doc_id)
                    cids.append(cid)
                    toks.append(tok)
                    tags.append(tag)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "chunk_id": pd.Series(cids, dtype="int32"),
                    "tokens": toks,
                    "tags": tags,
                }
            )

    return corpus.mapInPandas(run, CHUNK_SCHEMA)


def token_tag_rows(corpus: DataFrame) -> DataFrame:
    """R7/J1: explode zipped token/tag arrays into rows."""
    z = F.explode(F.arrays_zip("tokens", "tags")).alias("tt")
    return corpus.select("doc_id", z).select(
        "doc_id",
        F.col("tt.tokens").alias("token"),
        F.col("tt.tags").alias("tag"),
    )


def export_token_tag_tsv(corpus: DataFrame, path: str) -> None:
    """S6 sink: one text part-file per partition of ``token\\ttag`` lines
    with a blank line between docs (generate_corpus format,
    data_process.py:160-182). Doc order within a partition is preserved;
    global file order is partition-parallel by design."""
    lines = corpus.select(
        F.concat_ws(
            "\n",
            F.transform(
                F.arrays_zip("tokens", "tags"),
                lambda tt: F.concat_ws("\t", tt["tokens"], tt["tags"]),
            ),
        ).alias("value")
    )
    lines.write.mode("overwrite").option("lineSep", "\n\n").text(path)
