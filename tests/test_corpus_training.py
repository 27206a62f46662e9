"""Gates for the training-data export operators: zh cleaning funcs
(P11-P13), file-faithful re-chunking incl. the duplicate-final-chunk quirk
(R3), tag-id mapping (A1), and the Spark corpus stages vs the oracle."""

from kgforge.textnorm.chinese import (
    normalize_puncs,
    remove_title,
    revert_ascii_chars_whitespace,
)
from kgforge.textnorm.cleaning import process_line
from kgforge.textnorm.constants import DEFAULT_ENGLISH_NER_MAPPING
from kgforge.textnorm.corpus import (
    PAD_TOKEN,
    generate_punctuator_tag_mappings,
    read_token_tag_stream,
    rechunk_doc,
)


def test_normalize_puncs():
    assert normalize_puncs("你好?再见!") == "你好？再见！"
    assert normalize_puncs("（x）...") == "(x)。"
    assert normalize_puncs("a,b") == "a，b"


def test_remove_title():
    assert remove_title("这是标题") == ""
    assert remove_title("这是句子。") == "这是句子。"
    assert remove_title("问题？") == "问题？"
    assert remove_title("  ") == "  "  # whitespace-only passes through


def test_revert_ascii_chars_whitespace():
    # spaces between latin chars removed; CJK spans padded with one space
    # each segment contributes " "+ascii and " "+cjk (empty pre-span still
    # adds its space — verified reference behavior)
    assert revert_ascii_chars_whitespace("中 a b c 文") == "  中 abc 文"
    assert revert_ascii_chars_whitespace("a b") == "a b"  # no CJK → unchanged


def _fixed_len(n):
    return lambda ordinal: n


def test_read_stream_chunks_and_blank_line_boundaries():
    lines = (
        ["tok%d\tO\n" % i for i in range(5)]
        + ["\n"]
        + ["tok%d\tO\n" % i for i in range(3)]
    )
    tokens, tags = read_token_tag_stream(lines, 4, 4, _fixed_len(4))
    # doc1: chunk of 4 closes, remaining 1 token closed by blank line;
    # doc2: 3 tokens padded to 4 at EOF
    assert [len(t) for t in tokens] == [4, 1, 4]
    assert tokens[2][-1] == PAD_TOKEN and tags[2][-1] == "O"


def test_read_stream_quirk_duplicate_final_chunk():
    # reference quirk (punctuation_data_process.py:51-59): input ending
    # exactly at a chunk boundary pads+re-appends the just-closed chunk
    lines = ["t%d\tO\n" % i for i in range(4)]
    tokens, tags = read_token_tag_stream(lines, 4, 4, _fixed_len(4))
    assert len(tokens) == 2
    assert tokens[0] is tokens[1]  # same object appended twice
    assert len(tokens[0]) == 8 and tokens[0][4:] == [PAD_TOKEN] * 4


def test_read_stream_bad_line_quirk():
    # F4 quirk (punctuation_data_process.py:43-49): the token append
    # succeeds BEFORE the tag IndexError, so a tagless line leaves an
    # orphan token and token/tag lists go out of step — pinned, not fixed
    lines = ["good\tO\n", "badline\n", "also\tO\n"]
    tokens, tags = read_token_tag_stream(lines, 10, 10, _fixed_len(10))
    assert tokens[0][:3] == ["good", "badline", "also"]
    assert tags[0][:2] == ["O", "O"]
    # pad counts from line_index (2 good lines) → tokens 3+8, tags 2+8
    assert len(tokens[0]) == 11 and len(tags[0]) == 10


def test_rechunk_doc_partition_independent():
    toks = [f"t{i}" for i in range(25)]
    tags = ["O"] * 25
    chunks = rechunk_doc(toks, tags, "docA", 4, 8)
    flat = [t for c, _ in [(c, g) for c, g in chunks] for t in c if t != PAD_TOKEN]
    assert flat == toks  # lossless, order-preserving
    again = rechunk_doc(list(toks), list(tags), "docA", 4, 8)
    assert chunks == again  # deterministic by key


def test_tag_mapping_sorted_dense():
    m = generate_punctuator_tag_mappings([["PERIOD", "O"], ["COMMA", "O"]])
    assert m == {"COMMA": 0, "O": 1, "PERIOD": 2}


def test_spark_corpus_stages_match_oracle(spark, tmp_path):
    from kgforge.stages.corpus import (
        export_token_tag_tsv,
        rechunk_corpus,
        token_tag_corpus,
        token_tag_rows,
    )

    lines = [
        ("d0", "hello , world . how are you ?"),
        ("d1", "a , b . c ! d ? e"),
        ("d2", ". . ."),
        ("d3", "tokens without any puncs at all"),
    ]
    df = spark.createDataFrame(lines, "doc_id string, line string")
    corpus = token_tag_corpus(df)
    got = {r["doc_id"]: (list(r["tokens"]), list(r["tags"])) for r in corpus.collect()}
    for doc_id, line in lines:
        assert got[doc_id] == process_line(line, DEFAULT_ENGLISH_NER_MAPPING)

    rows = token_tag_rows(corpus)
    assert rows.columns == ["doc_id", "token", "tag"]
    assert rows.count() == sum(len(t) for t, _ in got.values())

    chunks = rechunk_corpus(corpus, 3, 5)
    c = {(r["doc_id"], r["chunk_id"]): list(r["tokens"]) for r in chunks.collect()}
    from kgforge.textnorm.corpus import rechunk_doc as oracle_rechunk

    for doc_id, (toks, tags) in got.items():
        want = oracle_rechunk(toks, tags, doc_id, 3, 5)
        for cid, (wt, _) in enumerate(want):
            assert c[(doc_id, cid)] == wt

    out = str(tmp_path / "tsv")
    export_token_tag_tsv(corpus, out)
    text = spark.read.option("lineSep", "\n\n").text(out)
    assert text.count() == len(lines)  # one block per doc
    one = text.collect()[0]["value"]
    assert "\t" in one
