"""Stage-3 gates: pure-extractor unit tests, Spark sentences == oracle
sentences (exact, incl. sent_id), and the triple P/R harness
(BASELINE.md: P ≥ 0.95 ∧ R ≥ 0.95 vs the single-node oracle — expected
1.0, same shared code)."""

import pytest

from kgforge.extract.triples import (
    doc_triples,
    extract_triples,
    split_sentences,
)
from kgforge.fixtures.gen import gen_webdocs_rows
from kgforge.stages.extract import sentences, triples
from kgforge.stages.normalize import normalize
from kgforge.textnorm.constants import (
    DEFAULT_CHINESE_TAG_PUNCTUATOR_MAP,
    DEFAULT_ENGLISH_TAG_PUNCTUATOR_MAP,
)
from kgforge.textnorm.pipeline import punctuate_one
from kgforge.textnorm.tagger import MockTagger

N_DOCS = 300


def test_extract_simple_triple():
    got = extract_triples("Acme corp 3 acquired initech labs 9.")
    assert got == [("acme corp 3", "acquired", "initech labs 9", 1.0)]


def test_extract_multiword_relation_and_stopword_trim():
    got = extract_triples("Maria lopez 7 works at globex systems 4, now.")
    assert got[0][:3] == ("maria lopez 7", "works at", "globex systems 4")
    got2 = extract_triples("The report and maria khan 2 invested in apex labs 1")
    assert got2[0][:3] == ("maria khan 2", "invested in", "apex labs 1")


def test_extract_open_tier_verb():
    # "shows" is outside REL_LEXICON — caught by the open ReVerb tier
    got = extract_triples("The market report shows strong demand.")
    assert [t[:3] for t in got] == [("market report", "shows", "strong demand")]


def test_extract_no_relation_no_triple():
    assert extract_triples("Quarterly growth across all regions.") == []
    assert extract_triples("acquired nothing") == []  # no subject


def test_split_sentences_en_urls_safe():
    text = "Visit https://x.example/p now. Acme acquired initech! Done?"
    assert split_sentences(text) == [
        "Visit https://x.example/p now.",
        "Acme acquired initech!",
        "Done?",
    ]


def test_split_sentences_zh():
    assert split_sentences("今天天气。很好", "zh") == ["今天天气。", "很好"]


def test_extract_zh_patterns():
    got = extract_triples("王伟在天河科技工作。", "zh")
    assert got == [("王伟", "works at", "天河科技", 0.8)]
    got2 = extract_triples("蓝海集团收购了星辰软件", "zh")
    assert got2 == [("蓝海集团", "acquired", "星辰软件", 0.8)]
    assert extract_triples("今天天气很好。", "zh") == []
    # en sentences are untouched by the zh path
    assert extract_triples("acme acquired initech", "en")[0][:3] == (
        "acme", "acquired", "initech",
    )


def _oracle_doc(row):
    lang = row["lang"]
    tag_map = (
        DEFAULT_CHINESE_TAG_PUNCTUATOR_MAP
        if lang == "zh"
        else DEFAULT_ENGLISH_TAG_PUNCTUATOR_MAP
    )
    text_norm, _ = punctuate_one(row["text"], MockTagger(lang), tag_map)
    return text_norm, lang


@pytest.fixture(scope="module")
def spark_norm(spark):
    docs = spark.createDataFrame(
        [
            (r["url"], r["text"], r["lang"])
            for r in gen_webdocs_rows(N_DOCS)
        ],
        "url string, text string, lang string",
    )
    return normalize(docs, backend="mock").cache()


def test_sentences_match_oracle(spark, spark_norm):
    got = {}
    for r in sentences(spark_norm).collect():
        got.setdefault(r["url"], []).append((r["sent_id"], r["sentence"]))
    for url in got:
        got[url].sort()
    want = {}
    for row in gen_webdocs_rows(N_DOCS):
        text_norm, lang = _oracle_doc(row)
        sents = split_sentences(text_norm, lang)
        if sents:
            want[row["url"]] = list(enumerate(sents))
    assert got == want


def test_triples_pr_vs_oracle(spark, spark_norm):
    got = {
        (r["url"], r["sent_id"], r["subj"], r["pred"], r["obj"])
        for r in triples(sentences(spark_norm)).collect()
    }
    want = set()
    for row in gen_webdocs_rows(N_DOCS):
        text_norm, lang = _oracle_doc(row)
        for sent_id, subj, pred, obj, _conf in doc_triples(text_norm, lang):
            want.add((row["url"], sent_id, subj, pred, obj))
    assert want, "fixture must yield oracle triples"
    tp = len(got & want)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(want)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    # same shared code ⇒ exact equality expected, not just ≥0.95
    assert got == want
