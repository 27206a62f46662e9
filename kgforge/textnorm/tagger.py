"""Tagger backends for the punctuation-restoration stage.

The reference's tagger is ``DistilBertForTokenClassification`` behind an HF
tokenizer (inference_pipeline.py:100-115,176-202: tokenize → forward →
argmax → subword-position mask). This sandbox has no torch/onnxruntime, so
the model sits behind a minimal backend protocol: a backend maps word-token
chunks to per-word tag names (subword alignment — inference_pipeline.py:
266-277 — is a backend-internal concern). The deterministic ``MockTagger``
is the sandbox backend; ``OnnxTagger`` is the production stub. Byte-identity
tests exercise the exact pre/post-process path production uses
(SURVEY.md §7 risk 3).
"""

from __future__ import annotations

import hashlib
from typing import Protocol


class TaggerBackend(Protocol):
    def tag(self, chunks: list[list[str]]) -> list[list[str]]:
        """One tag name per word token, per chunk."""
        ...


_HASH_CACHE: dict[str, int] = {}
_HASH_CACHE_CAP = 1 << 18  # ~260k entries; word vocab is Zipfian, hits ≫ misses


def _stable_hash(s: str) -> int:
    """Process-stable 64-bit hash (unlike builtin ``hash`` under
    PYTHONHASHSEED randomization) — safe for executor-side determinism.
    Memoized (bounded): callers hash per-token strings whose vocabulary is
    Zipf-distributed, so the md5 is computed once per distinct token
    instead of 3× per occurrence (round-5 docstream profile)."""
    h = _HASH_CACHE.get(s)
    if h is None:
        if len(_HASH_CACHE) >= _HASH_CACHE_CAP:
            _HASH_CACHE.clear()
        h = int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")
        _HASH_CACHE[s] = h
    return h


_EN_ENDERS = ("PERIOD", "PERIOD", "PERIOD", "PERIOD", "QUESTIONMARK", "EXLAMATIONMARK")
_ZH_ENDERS = ("C_PERIOD", "C_PERIOD", "C_PERIOD", "C_PERIOD", "C_QUESTIONMARK", "C_EXLAMATIONMARK")

_MOCK_HASHES: dict[str, tuple[int, int, int]] = {}


def _mock_hashes(tok: str) -> tuple[int, int, int]:
    """(len, end, comma) hash triple per token, memoized together
    (round-6): _tag_chunk probed up to three prefixed keys per token
    occurrence ("len:"/"end:"/"comma:" concat + _HASH_CACHE lookup each)
    — one dict probe on the bare token replaces them; values are the
    identical _stable_hash results."""
    v = _MOCK_HASHES.get(tok)
    if v is None:
        if len(_MOCK_HASHES) >= _HASH_CACHE_CAP:
            _MOCK_HASHES.clear()
        v = (
            _stable_hash("len:" + tok),
            _stable_hash("end:" + tok),
            _stable_hash("comma:" + tok),
        )
        _MOCK_HASHES[tok] = v
    return v


class MockTagger:
    """Deterministic rule tagger: sentence length is a hash of the sentence's
    first token (6..13 words); sentence-final token gets a hash-chosen ender
    tag; mid-sentence tokens occasionally get COMMA. Pure function of the
    chunk's tokens → identical output on driver (oracle) and executors."""

    def __init__(self, lang: str = "en"):
        self.lang = lang
        if lang == "zh":
            # zh tokens are single chars after chinese_split: longer
            # sentence targets + rare commas approximate real zh prose
            self.enders = _ZH_ENDERS
            self.comma = "C_COMMA"
            self.min_len, self.len_span, self.comma_mod = 10, 14, 37
        else:
            self.enders = _EN_ENDERS
            self.comma = "COMMA"
            self.min_len, self.len_span, self.comma_mod = 6, 8, 9

    def tag(self, chunks: list[list[str]]) -> list[list[str]]:
        return [self._tag_chunk(tokens) for tokens in chunks]

    def _tag_chunk(self, tokens: list[str]) -> list[str]:
        tags: list[str] = []
        sent_pos = 0
        target = 0
        last = len(tokens) - 1
        n_enders = len(self.enders)
        for i, tok in enumerate(tokens):
            h_len, h_end, h_comma = _mock_hashes(tok)
            if sent_pos == 0:
                target = self.min_len + h_len % self.len_span
            sent_pos += 1
            if sent_pos >= target and i < last:
                tags.append(self.enders[h_end % n_enders])
                sent_pos = 0
            elif sent_pos > 2 and h_comma % self.comma_mod == 0:
                tags.append(self.comma)
            else:
                tags.append("O")
        if tags:
            # close the final sentence of the chunk
            tags[-1] = self.enders[_mock_hashes(tokens[-1])[1] % n_enders]
        return tags


def align_first_subword_tags(offsets, logits, id2tag: dict[int, str]) -> list[list[str]]:
    """The subword→word alignment seam (inference_pipeline.py:266-277):
    keep exactly the positions whose offset mapping is (0, !=0) — the first
    subword of each real word; special tokens ([CLS]/[SEP]/padding) carry
    (0, 0) and continuation subwords carry start != 0. Shared by the
    production OnnxTagger and the offline FakeSubwordTagger so the mask
    logic itself is test-covered without onnxruntime."""
    marks = (offsets[:, :, 0] == 0) & (offsets[:, :, 1] != 0)
    preds = logits.argmax(axis=2)
    return [
        [id2tag[int(p)] for p in pred[mark]]
        for pred, mark in zip(preds, marks)
    ]


class FakeSubwordTagger:
    """Numpy-only twin of the ONNX path exercising the full subword seam:
    words are split into ≤``piece_len``-char subwords, encoded with
    HF-fast-tokenizer-style offset mappings ([CLS]/[SEP]/pad → (0,0),
    first subword → (0, n), continuation → (start>0, end)), padded to the
    batch max, and scored with logits whose argmax at FIRST-subword
    positions encodes MockTagger's word tag while every continuation /
    special position carries a DECOY argmax — so any alignment-mask bug
    changes the output. Word-level tags therefore must equal MockTagger's
    on the same chunks (asserted in tests/test_subword_alignment.py)."""

    def __init__(self, lang: str = "en", piece_len: int = 4):
        self._mock = MockTagger(lang=lang)
        tags = sorted(set(_EN_ENDERS) | set(_ZH_ENDERS) | {"O", "COMMA", "C_COMMA"})
        self.tag2id = {t: i for i, t in enumerate(tags)}
        self.id2tag = dict(enumerate(tags))
        self.piece_len = piece_len

    def _pieces(self, word: str) -> list[tuple[int, int]]:
        """Character-offset spans of the word's subword pieces."""
        n = max(1, len(word))
        return [
            (s, min(s + self.piece_len, n)) for s in range(0, n, self.piece_len)
        ]

    def tag(self, chunks: list[list[str]]) -> list[list[str]]:
        import numpy as np

        word_tags = self._mock.tag(chunks)
        k = len(self.id2tag)
        rows_off: list[list[tuple[int, int]]] = []
        rows_tag: list[list[int]] = []  # -1 = decoy position
        for tokens, tags in zip(chunks, word_tags):
            off: list[tuple[int, int]] = [(0, 0)]  # [CLS]
            tid: list[int] = [-1]
            for tok, tag in zip(tokens, tags):
                for j, span in enumerate(self._pieces(tok)):
                    off.append(span)
                    tid.append(self.tag2id[tag] if j == 0 else -1)
            off.append((0, 0))  # [SEP]
            tid.append(-1)
            rows_off.append(off)
            rows_tag.append(tid)
        width = max(len(o) for o in rows_off) if rows_off else 0
        offsets = np.zeros((len(rows_off), width, 2), dtype=np.int64)
        logits = np.zeros((len(rows_off), width, k), dtype=np.float64)
        for i, (off, tid) in enumerate(zip(rows_off, rows_tag)):
            for j, ((s, e), t) in enumerate(zip(off, tid)):
                offsets[i, j] = (s, e)
                if t >= 0:
                    logits[i, j, t] = 1.0
                else:
                    # decoy: a confident WRONG prediction on non-first
                    # positions; a broken mask would surface these
                    logits[i, j, (abs(s) + e + 1) % k] = 2.0
        return align_first_subword_tags(offsets, logits, self.id2tag)


class OnnxTagger:
    """Production backend: HF fast tokenizer + ONNX Runtime session, loaded
    lazily once per python worker (mirrors inference_pipeline.py:176-202 and
    its subword-mask alignment at :266-277). Not runnable in this sandbox
    (no onnxruntime/transformers); kept as the deployment seam."""

    def __init__(self, model_path: str, tokenizer_name: str, id2tag: dict[int, str]):
        self.model_path = model_path
        self.tokenizer_name = tokenizer_name
        self.id2tag = id2tag
        self._session = None

    def _load(self):  # pragma: no cover - requires onnxruntime
        import numpy  # noqa: F401
        import onnxruntime  # type: ignore
        from transformers import DistilBertTokenizerFast  # type: ignore

        self._tokenizer = DistilBertTokenizerFast.from_pretrained(self.tokenizer_name)
        self._session = onnxruntime.InferenceSession(self.model_path)

    def tag(self, chunks: list[list[str]]) -> list[list[str]]:  # pragma: no cover
        if self._session is None:
            self._load()
        import numpy as np

        enc = self._tokenizer(
            chunks,
            is_split_into_words=True,
            padding=True,
            return_offsets_mapping=True,
            return_tensors="np",
        )
        offsets = np.asarray(enc["offset_mapping"])
        logits = self._session.run(
            None,
            {
                "input_ids": np.asarray(enc["input_ids"]),
                "attention_mask": np.asarray(enc["attention_mask"]),
            },
        )[0]
        # first-subword alignment — inference_pipeline.py:266-277
        return align_first_subword_tags(offsets, logits, self.id2tag)


def get_tagger(backend: str, lang: str = "en", **kwargs) -> TaggerBackend:
    if backend == "mock":
        return MockTagger(lang=lang)
    if backend == "fakesubword":
        return FakeSubwordTagger(lang=lang, **kwargs)
    if backend == "onnx":  # pragma: no cover
        return OnnxTagger(**kwargs)
    raise ValueError(f"unknown tagger backend: {backend}")
