"""Fused-stage gate: extract_docstream output == modular
triples(sentences(normalize)) exactly (same rows, same values)."""

from kgforge.fixtures.gen import gen_webdocs_rows
from kgforge.stages.docstream import extract_docstream
from kgforge.stages.extract import sentences, triples
from kgforge.stages.normalize import normalize

N_DOCS = 200


def _rows(df):
    return sorted(
        (r["url"], r["sent_id"], r["subj"], r["pred"], r["obj"], r["conf"])
        for r in df.collect()
    )


def test_fused_equals_modular(spark):
    docs = spark.createDataFrame(
        [
            (r["url"], r["warc_ts"], r["text"], r["lang"])
            for r in gen_webdocs_rows(N_DOCS)
        ],
        "url string, warc_ts timestamp, text string, lang string",
    )
    fused = _rows(extract_docstream(docs))
    modular = _rows(triples(sentences(normalize(docs))))
    assert fused == modular
    assert len(fused) > 0
