"""Offline coverage for the subword→word alignment seam (F6/J2/J3/M1/M2 —
the ONNX-backend-internal logic at inference_pipeline.py:266-277 that
round 1 left unexecuted): FakeSubwordTagger drives the exact
``(start == 0) & (end != 0)`` offset mask with decoy logits planted on
every continuation/special position, so word-level tags equal MockTagger's
ONLY if the alignment is right."""

import numpy as np
import pytest

from kgforge.fixtures.gen import gen_webdocs_rows
from kgforge.stages.normalize import _tag_map
from kgforge.textnorm.pipeline import punctuate_one
from kgforge.textnorm.tagger import (
    FakeSubwordTagger,
    MockTagger,
    align_first_subword_tags,
)


def _chunks(lang: str) -> list[list[str]]:
    docs = [
        r for r in gen_webdocs_rows(120) if r["lang"] == lang
    ]
    chunks = [d["text"].split()[:256] for d in docs[:10] if d["text"].split()]
    assert chunks
    return chunks


@pytest.mark.parametrize("lang", ["en", "zh"])
def test_fake_subword_equals_mock_word_tags(lang):
    chunks = _chunks("en") if lang == "en" else [list("今天天气很好我们去公园散步")]
    assert FakeSubwordTagger(lang=lang).tag(chunks) == MockTagger(lang=lang).tag(chunks)


def test_ragged_batch_padding_is_masked_out():
    chunks = [["alpha"], ["one", "two", "three", "considerations"], ["x", "y"]]
    assert FakeSubwordTagger().tag(chunks) == MockTagger().tag(chunks)


def test_punctuate_one_byte_identical_under_subword_backend():
    tag_map = _tag_map("en")
    mock, fake = MockTagger(), FakeSubwordTagger()
    for row in list(gen_webdocs_rows(40)):
        if row["lang"] != "en":
            continue
        assert punctuate_one(row["text"], fake, tag_map) == punctuate_one(
            row["text"], mock, tag_map
        )


def test_align_mask_semantics_handcrafted():
    """(0,0) specials and (start>0) continuations are dropped; first
    subwords (0, n) survive in order."""
    id2tag = {0: "O", 1: "PERIOD", 2: "COMMA"}
    #            [CLS]  wash    ##ing   ##ton   dc      [SEP]/pad
    offsets = np.array(
        [[(0, 0), (0, 4), (4, 8), (8, 10), (0, 2), (0, 0)]], dtype=np.int64
    )
    logits = np.zeros((1, 6, 3))
    logits[0, 0, 2] = 9.0  # decoy on [CLS]
    logits[0, 1, 0] = 1.0  # wash → O
    logits[0, 2, 1] = 9.0  # decoy on ##ing
    logits[0, 3, 2] = 9.0  # decoy on ##ton
    logits[0, 4, 1] = 1.0  # dc → PERIOD
    logits[0, 5, 2] = 9.0  # decoy on [SEP]
    assert align_first_subword_tags(offsets, logits, id2tag) == [["O", "PERIOD"]]
    # sanity: a broken (all-true) mask WOULD surface the decoys
    broken = [
        [id2tag[int(p)] for p in pred]
        for pred in logits.argmax(axis=2)
    ]
    assert broken != [["O", "PERIOD"]]


def test_spark_normalize_identical_under_subword_backend(spark):
    from kgforge.stages.normalize import normalize

    rows = [
        (r["url"], r["warc_ts"], r["text"], r["lang"])
        for r in gen_webdocs_rows(40)
    ]
    docs = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string, lang string"
    )
    cols = ["url", "text_norm", "n_tokens"]
    got = sorted(map(tuple, normalize(docs, backend="fakesubword").select(cols).collect()))
    want = sorted(map(tuple, normalize(docs, backend="mock").select(cols).collect()))
    assert got == want
