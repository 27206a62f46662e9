"""Deterministic synthetic fixtures (FIXTURES.md §1-2): the ``webdocs``
input table and the ``alias_dict`` entity-linking dictionary.

All randomness is hash-of-key (md5 of seed|doc_id|field) — no wall clock,
no ``random`` module state — so any partition of any scale tier can be
regenerated independently and re-runs/resumes agree exactly
(SURVEY.md §4.3-5).

Text content rules: sentences drawn from ``{ENT} {REL} {ENT}`` templates
mixed ~3:1 with distractor prose; ~5% of tokens are emails/urls/currency/
numbers (exercises sentinel masking); ~2% of docs exceed 256 whitespace
tokens (exercises chunk/merge); one hot entity appears in ~30% of docs
(skew fixture); 5% of docs are Chinese (exercises chinese_split + zh tags).
The stored ``text`` column is the punctuated prose passed through the
reference's ``produce_sample_text`` semantics (lower + strip ALL_PUNCS),
exactly how the reference synthesizes inference input
(/root/reference/examples/english_inference_sample.py:11-13).
"""

from __future__ import annotations

import datetime
import hashlib

from kgforge.textnorm.cleaning import produce_sample_text

SEED = "kgforge-fixtures-v1"

_ADJ = ["global", "united", "advanced", "pacific", "northern", "digital",
        "quantum", "stellar", "prime", "apex", "summit", "vertex", "blue",
        "crimson", "silver", "golden", "iron", "copper", "atlas", "nova"]
_NOUN = ["dynamics", "systems", "industries", "holdings", "labs", "media",
         "logistics", "energy", "networks", "robotics", "analytics",
         "biotech", "capital", "materials", "foods", "motors", "software",
         "aviation", "telecom", "marine"]
_PERSON_FIRST = ["maria", "james", "wei", "fatima", "carlos", "yuki",
                 "amara", "ivan", "priya", "liam", "sofia", "omar",
                 "elena", "david", "mei", "noah", "zara", "felix"]
_PERSON_LAST = ["lopez", "smith", "chen", "khan", "garcia", "tanaka",
                "okafor", "petrov", "sharma", "murphy", "rossi", "haddad",
                "novak", "cohen", "lin", "berg", "diallo", "fischer"]
_PLACE = ["singapore", "toronto", "berlin", "nairobi", "seattle", "lyon",
          "osaka", "austin", "zurich", "mumbai", "oslo", "dublin"]

# relation surface forms — derived from the extractor's lexicon so the
# fixture generator and kgforge.extract.triples stay in lockstep
from kgforge.extract.triples import REL_LEXICON

RELATIONS = [" ".join(rel) for rel in REL_LEXICON if rel != ("is", "a")]

_DISTRACTOR_WORDS = (
    "the market report shows strong demand while analysts expect steady "
    "growth across regions and customers continue to value reliable "
    "service despite rising costs teams shipped new features and the "
    "board reviewed quarterly results with cautious optimism about "
    "supply chains weather patterns and seasonal trends"
).split()

_ZH_SENTENCES = ["今天天气很好", "我们去公园散步", "这个项目进展顺利",
                 "市场需求持续增长", "团队发布了新产品"]

# zh entities + relation templates matching kgforge.extract.triples.ZH_REL_PATTERNS
_ZH_ENTITIES = ["天河科技", "蓝海集团", "星辰软件", "华光能源", "北斗物流",
                "王伟", "李娜", "张强", "陈静", "南山资本"]
_ZH_TEMPLATES = ["{s}在{o}工作", "{s}收购了{o}", "{s}位于{o}",
                 "{s}投资了{o}", "{s}成立于{o}"]

HOT_ENTITY_INDEX = 0  # entity 0 is the designated hot key (~30% of docs)


def _h(*parts) -> int:
    """Stable 64-bit hash of joined key parts."""
    key = (SEED + "|" + "|".join(str(p) for p in parts)).encode("utf-8")
    return int.from_bytes(hashlib.md5(key).digest()[:8], "big")


def n_entities(n_docs: int) -> int:
    return max(50, min(5000, n_docs // 2))


def entity_name(ent_ix: int) -> str:
    """Canonical surface form of entity ``ent_ix`` (orgs, people, places)."""
    kind = ent_ix % 3
    if kind == 0:  # org
        a = _ADJ[_h("adj", ent_ix) % len(_ADJ)]
        n = _NOUN[_h("noun", ent_ix) % len(_NOUN)]
        return f"{a} {n} {ent_ix // 3}"
    if kind == 1:  # person
        f = _PERSON_FIRST[_h("pf", ent_ix) % len(_PERSON_FIRST)]
        last = _PERSON_LAST[_h("pl", ent_ix) % len(_PERSON_LAST)]
        return f"{f} {last} {ent_ix // 3}"
    p = _PLACE[_h("pc", ent_ix) % len(_PLACE)]
    return f"{p} {ent_ix // 3}"


def _pick_entity(doc_id: int, slot: str, n_ent: int) -> int:
    # hot key: ~30% of picks land on entity 0 (skew fixture)
    if _h("hot", doc_id, slot) % 10 < 3:
        return HOT_ENTITY_INDEX
    return _h("ent", doc_id, slot) % n_ent


def _distractor_sentence(doc_id: int, s_ix: int) -> str:
    n_words = 6 + _h("dw", doc_id, s_ix) % 7
    words = [
        _DISTRACTOR_WORDS[_h("w", doc_id, s_ix, i) % len(_DISTRACTOR_WORDS)]
        for i in range(n_words)
    ]
    # ~5% of tokens are maskable specials
    for i in range(n_words):
        r = _h("sp", doc_id, s_ix, i) % 100
        if r < 2:
            words[i] = f"user{_h('em', doc_id, s_ix, i) % 99}@example.com"
        elif r < 3:
            words[i] = f"https://site{_h('ur', doc_id, s_ix, i) % 99}.example/p"
        elif r < 4:
            words[i] = f"${_h('cu', doc_id, s_ix, i) % 900 + 100}"
        elif r < 5:
            words[i] = str(_h("nm", doc_id, s_ix, i) % 10000)
    return " ".join(words)


def doc_sentences(doc_id: int, n_ent: int) -> list[str]:
    """Punctuated ground-truth sentences for one doc. Lengths mimic web
    pages (~150-250 words typical; ~2% long docs exceed the 256-token
    chunking threshold)."""
    is_long = _h("long", doc_id) % 50 == 0  # ~2% exceed 256 tokens
    n_sent = (45 + _h("nsl", doc_id) % 20) if is_long else (14 + _h("ns", doc_id) % 14)
    sentences = []
    for s in range(n_sent):
        if _h("kind", doc_id, s) % 4 < 3:  # 3:1 triple-bearing : distractor
            subj_ix = _pick_entity(doc_id, f"s{s}", n_ent)
            obj_ix = _pick_entity(doc_id, f"o{s}", n_ent)
            if obj_ix == subj_ix:
                obj_ix = (obj_ix + 1) % n_ent
            rel = RELATIONS[_h("rel", doc_id, s) % len(RELATIONS)]
            sentences.append(f"{entity_name(subj_ix)} {rel} {entity_name(obj_ix)}")
        else:
            sentences.append(_distractor_sentence(doc_id, s))
    return sentences


def make_doc(doc_id: int, n_docs: int) -> dict:
    n_ent = n_entities(n_docs)
    lang = "zh" if _h("lang", doc_id) % 100 < 5 else "en"
    if lang == "zh":
        n_sent = 3 + _h("zns", doc_id) % 5
        sents = []
        for s in range(n_sent):
            if _h("zkind", doc_id, s) % 2 == 0:  # half carry relations
                subj = _ZH_ENTITIES[_h("zsubj", doc_id, s) % len(_ZH_ENTITIES)]
                obj = _ZH_ENTITIES[_h("zobj", doc_id, s) % len(_ZH_ENTITIES)]
                if obj == subj:
                    obj = _ZH_ENTITIES[(_h("zobj", doc_id, s) + 1) % len(_ZH_ENTITIES)]
                tpl = _ZH_TEMPLATES[_h("ztpl", doc_id, s) % len(_ZH_TEMPLATES)]
                sents.append(tpl.format(s=subj, o=obj))
            else:
                sents.append(_ZH_SENTENCES[_h("zs", doc_id, s) % len(_ZH_SENTENCES)])
        prose = "。".join(sents) + "。"
        text = produce_sample_text(prose)
    else:
        # join sentence tokens directly: equivalent to produce_sample_text
        # over the punctuated prose for ordinary (lowercase alnum) tokens,
        # but special tokens (emails/urls/$amounts) keep their punctuation —
        # real extracted web text contains them, and they must reach the
        # masking path (inference_pipeline.py:122-146) intact.
        text = " ".join(
            tok for sent in doc_sentences(doc_id, n_ent) for tok in sent.split()
        )
    base = datetime.datetime(2025, 1, 1, tzinfo=datetime.timezone.utc)
    warc_ts = base + datetime.timedelta(
        days=doc_id % 90, seconds=_h("ts", doc_id) % 86400
    )
    return {
        "url": f"https://site{_h('site', doc_id) % 1000}.example/p/{doc_id}",
        "warc_ts": warc_ts,
        "html": b"<html><body>" + text.encode("utf-8") + b"</body></html>",
        "text": text,
        "lang": lang,
    }


def gen_webdocs_rows(n_docs: int, start: int = 0, end: int | None = None):
    """Rows [start, end) of the n_docs-tier webdocs table."""
    for doc_id in range(start, n_docs if end is None else end):
        yield make_doc(doc_id, n_docs)


def gen_alias_rows(n_docs: int):
    """alias_dict rows (FIXTURES.md §2): ~3 aliases per entity including
    abbreviations; deterministic popularity-skewed prior; alias collisions
    (~2% of abbreviations also map to the next entity); sameAs chains are
    expressed as shared ``canon`` between consecutive dup entities."""
    n_ent = n_entities(n_docs)
    for ent_ix in range(n_ent):
        canon = entity_name(ent_ix)
        eid = f"E{ent_ix:06d}"
        prior = 1.0 / (1 + (_h("prior", ent_ix) % 100) / 10.0)
        yield {"alias": canon, "entity_id": eid, "canon": canon, "prior": prior}
        parts = canon.split()
        if len(parts) > 1:
            yield {
                "alias": " ".join(parts[:-1]),  # name sans ordinal suffix
                "entity_id": eid,
                "canon": canon,
                "prior": prior * 0.8,
            }
            abbrev = "".join(p[0] for p in parts)
            yield {
                "alias": abbrev,
                "entity_id": eid,
                "canon": canon,
                "prior": prior * 0.5,
            }
            if _h("collide", ent_ix) % 50 == 0:
                # alias collision: same abbrev claimed by the next entity
                yield {
                    "alias": abbrev,
                    "entity_id": f"E{(ent_ix + 1) % n_ent:06d}",
                    "canon": entity_name((ent_ix + 1) % n_ent),
                    "prior": prior * 0.4,
                }
        if _h("sameas", ent_ix) % 25 == 0 and ent_ix + 1 < n_ent:
            # sameAs chain: alias of entity ent_ix also registered under a
            # duplicate id that canonicalization must merge (A=B edges)
            yield {
                "alias": canon,
                "entity_id": f"D{ent_ix:06d}",
                "canon": canon,
                "prior": prior * 0.9,
            }
    # Chinese entities (mentions emitted by the zh pattern extractor)
    for zix, zent in enumerate(_ZH_ENTITIES):
        yield {
            "alias": zent,
            "entity_id": f"Z{zix:06d}",
            "canon": zent,
            "prior": 0.9,
        }


def write_fixture_tables(spark, out_dir: str, n_docs: int, partitions: int = 8):
    """Materialize webdocs + alias_dict as parquet under ``out_dir``.

    Generation is distributed: parallelize doc_id ranges so each task
    generates its own slice (no driver-side row materialization) — the same
    pattern scales the fixture to any SF on a real cluster.
    """
    from pyspark.sql.types import (
        BinaryType,
        DoubleType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    doc_schema = StructType(
        [
            StructField("url", StringType()),
            StructField("warc_ts", TimestampType()),
            StructField("html", BinaryType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
        ]
    )
    step = max(1, n_docs // max(1, partitions))
    ranges = [(s, min(s + step, n_docs)) for s in range(0, n_docs, step)]

    def gen_range(rng):
        s, e = rng
        for row in gen_webdocs_rows(n_docs, s, e):
            yield (row["url"], row["warc_ts"], row["html"], row["text"], row["lang"])

    rdd = spark.sparkContext.parallelize(ranges, len(ranges)).flatMap(gen_range)
    docs = spark.createDataFrame(rdd, doc_schema)
    docs.write.mode("overwrite").parquet(f"{out_dir}/webdocs.parquet")

    alias_schema = StructType(
        [
            StructField("alias", StringType()),
            StructField("entity_id", StringType()),
            StructField("canon", StringType()),
            StructField("prior", DoubleType()),
        ]
    )
    alias_df = spark.createDataFrame(
        [(r["alias"], r["entity_id"], r["canon"], r["prior"]) for r in gen_alias_rows(n_docs)],
        alias_schema,
    )
    alias_df.write.mode("overwrite").parquet(f"{out_dir}/alias_dict.parquet")
    return f"{out_dir}/webdocs.parquet", f"{out_dir}/alias_dict.parquet"
