"""Materialized oracles for the kg_* contract queries.

Round 1 left the 8 kg_* queries with ``err: "no_oracle"`` — the driver's
hard correctness signal (rows+schema+hash) never touched the flagship KG
path. The kg semantics are deterministic pure Python (MockTagger +
kgforge.textnorm.pipeline + kgforge.extract.triples + linking/graph
oracles — the exact modules the Spark stages call inside mapInPandas), so
the expected outputs can be computed OFF-Spark and written as parquet;
``oracle_sql()`` then serves ``SELECT … FROM read_parquet('<path>')`` per
kg query and DuckDB hash-checks the distributed pipeline end to end.

Dtype discipline: each parquet is written with the exact Arrow types the
Spark query returns (int32 for sizes/ids-in-doc, int64 for counts, float64
for scores/ranks) so the driver's typed schema+hash compare passes.

Rounding discipline: where the Spark query applies ``F.round`` (HALF_UP on
the exact binary value of the double), the twin uses ``_round_spark`` —
``decimal.Decimal(x).quantize(…, ROUND_HALF_UP)`` — not Python's banker's
``round``.
"""

from __future__ import annotations

import hashlib
import itertools
import os
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

EXPECTED_VERSION = "v6"  # bump when any kg_* query semantics change
TIER_DOCS = {"sf0.001": 300, "sf0.01": 1000, "sf0.1": 2000}

KG_TABLES = [
    "kg_normalize",
    "kg_sentences",
    "kg_triples",
    "kg_entities",
    "kg_edges_topk",
    "kg_mentions",
    "kg_linked_fuzzy",
    "kg_cooccur",
    "kg_degree_hist",
    "kg_media_meta",
    "kg_token_tag_corpus",
    "kg_pagerank_topk",
]


def expected_dir(tier: str) -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "expected", tier)


def _round_spark(x: float, scale: int) -> float:
    """Spark's round(): BigDecimal(double).setScale(scale, HALF_UP)."""
    return float(Decimal(x).quantize(Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP))


def _md5_12(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()[:12]


def _self_entity(mention: str) -> str:
    return "M#" + _md5_12(mention)


# ---------------------------------------------------------------------------
# pure-Python twins of the Spark stages
# ---------------------------------------------------------------------------


def _normalized_docs(n_docs: int) -> list[dict]:
    """Twin of stages.normalize over the in-memory webdocs fixture."""
    from kgforge.fixtures.gen import gen_webdocs_rows
    from kgforge.stages.normalize import _tag_map
    from kgforge.textnorm.pipeline import DEFAULT_MAX_SEQUENCE_LENGTH, punctuate_one
    from kgforge.textnorm.tagger import MockTagger

    taggers: dict[str, MockTagger] = {}
    out = []
    for row in gen_webdocs_rows(n_docs):
        lang = row["lang"] or "en"
        tagger = taggers.setdefault(lang, MockTagger(lang=lang))
        text_norm, labels = punctuate_one(
            row["text"] or "", tagger, _tag_map(lang), DEFAULT_MAX_SEQUENCE_LENGTH
        )
        out.append(
            {
                "url": row["url"],
                "lang": lang,
                "text_norm": text_norm,
                "n_tokens": len(labels),
                "n_chunks": max(1, -(-len(labels) // DEFAULT_MAX_SEQUENCE_LENGTH)),
            }
        )
    return out


def _sentences(norm: list[dict]) -> list[dict]:
    from kgforge.extract.triples import split_sentences

    out = []
    for d in norm:
        for sent_id, sentence in enumerate(split_sentences(d["text_norm"], d["lang"])):
            out.append({"url": d["url"], "sent_id": sent_id, "sentence": sentence})
    return out


def _triples(norm: list[dict]) -> list[dict]:
    from kgforge.extract.triples import doc_triples

    out = []
    for d in norm:
        for sent_id, subj, pred, obj, conf in doc_triples(d["text_norm"], d["lang"]):
            out.append(
                {
                    "url": d["url"],
                    "sent_id": sent_id,
                    "subj": subj,
                    "pred": pred,
                    "obj": obj,
                    "conf": conf,
                }
            )
    return out


def _scores(texts_a: list[str], texts_b: list[str], priors: list[float]):
    """Bitwise twin of stages.link._pair_score: same embed_many + einsum."""
    import numpy as np

    from kgforge.linking.embed import embed_many

    m = embed_many(texts_a)
    c = embed_many(texts_b)
    cos = np.einsum("ij,ij->i", m, c) if len(m) else np.zeros(0)
    return cos * np.asarray(priors, dtype=np.float64)


def _entities(triples: list[dict], alias_rows: list[dict]) -> list[dict]:
    """Twin of link(mentions(triples), alias_df)."""
    mentions = sorted(
        {m for t in triples for m in (t["subj"], t["obj"]) if m}
    )
    by_alias: dict[str, list[dict]] = defaultdict(list)
    for r in alias_rows:
        by_alias[r["alias"]].append(r)
    out = []
    for mention in mentions:
        cands = by_alias.get(mention)
        if not cands:
            out.append(
                {
                    "mention": mention,
                    "entity_id": _self_entity(mention),
                    "canon": mention,
                    "score": 0.0,
                }
            )
            continue
        scores = _scores(
            [mention] * len(cands),
            [c["canon"] for c in cands],
            [c["prior"] for c in cands],
        )
        best_ix = min(
            range(len(cands)), key=lambda i: (-scores[i], cands[i]["entity_id"])
        )
        b = cands[best_ix]
        out.append(
            {
                "mention": mention,
                "entity_id": b["entity_id"],
                "canon": b["canon"],
                "score": float(scores[best_ix]),
            }
        )
    return out


def _union_find_components(edges: list[tuple[str, str]]) -> dict[str, str]:
    """Twin of graph.cc.connected_components: node → lexicographic-min
    component representative."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {n: find(n) for n in list(parent)}


def _alias_map(alias_rows: list[dict]) -> dict[str, str]:
    """Twin of stages.link.alias_resolution: alias → canon_id."""
    scores = _scores(
        [r["alias"] for r in alias_rows],
        [r["canon"] for r in alias_rows],
        [r["prior"] for r in alias_rows],
    )
    best: dict[str, tuple[float, str]] = {}
    for r, s in zip(alias_rows, scores):
        cur = best.get(r["alias"])
        cand = (-float(s), r["entity_id"])
        if cur is None or cand < cur:
            best[r["alias"]] = cand
    # sameAs edges: distinct entity_id pairs sharing identical (alias, canon)
    group: dict[tuple[str, str], set[str]] = defaultdict(set)
    for r in alias_rows:
        group[(r["alias"], r["canon"])].add(r["entity_id"])
    edges = sorted(
        {
            (a, b)
            for ids in group.values()
            for a, b in itertools.combinations(sorted(ids), 2)
        }
    )
    labels = _union_find_components(edges)
    return {
        alias: labels.get(eid, eid) for alias, (_negs, eid) in best.items()
    }


def _edge_rows(triples: list[dict], alias_map: dict[str, str]) -> list[tuple[str, str, str]]:
    out = []
    for t in triples:
        s = alias_map.get(t["subj"]) or _self_entity(t["subj"])
        o = alias_map.get(t["obj"]) or _self_entity(t["obj"])
        out.append((s, t["pred"], o))
    return out


def _edges_topk(edge_rows: list[tuple[str, str, str]], k: int = 20) -> list[dict]:
    counts = Counter(edge_rows)
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [
        {"subj_id": s, "pred": p, "obj_id": o, "n": n}
        for (s, p, o), n in ranked
    ]


def _mentions_topk(
    norm: list[dict], alias_rows: list[dict], amap: dict[str, str], k: int = 20
) -> list[dict]:
    """Twin of _kg_mentions: gazetteer scan over every sentence (shared
    matcher kgforge.linking.mentions) → canon_id mention counts, top-k."""
    from kgforge.extract.triples import split_sentences
    from kgforge.linking.mentions import build_mention_index, find_mentions

    en_index, zh_aliases = build_mention_index(
        sorted({r["alias"] for r in alias_rows})
    )
    counts: Counter = Counter()
    for d in norm:
        for sentence in split_sentences(d["text_norm"], d["lang"]):
            for surface in find_mentions(sentence, d["lang"], en_index, zh_aliases):
                counts[amap[surface]] += 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [{"canon_id": c, "n": n} for c, n in ranked]


def _linked_fuzzy_topk(
    triples: list[dict], alias_rows: list[dict], amap: dict[str, str], k: int = 20
) -> list[dict]:
    """Twin of _kg_linked_fuzzy: embedding candidate scoring for mentions
    with no exact alias hit (shared scorer kgforge.linking.fuzzy)."""
    from kgforge.linking.fuzzy import build_alias_matrix, fuzzy_link_batch

    alias_set = {r["alias"] for r in alias_rows}
    ms = sorted(
        {m for t in triples for m in (t["subj"], t["obj"]) if m}
        - alias_set
    )
    surfaces, mat = build_alias_matrix([r["alias"] for r in alias_rows])
    rows = [
        {"mention": m, "alias": a, "canon_id": amap[a], "score": s}
        for m, (a, s) in zip(ms, fuzzy_link_batch(ms, surfaces, mat))
        if a is not None
    ]
    return sorted(rows, key=lambda r: (-r["score"], r["mention"]))[:k]


def _cooccur_topk(
    norm: list[dict], alias_rows: list[dict], amap: dict[str, str], k: int = 20
) -> list[dict]:
    """Twin of _kg_cooccur: within-sentence canonical-entity pairs."""
    from kgforge.extract.triples import split_sentences
    from kgforge.linking.mentions import build_mention_index, find_mentions

    en_index, zh_aliases = build_mention_index(
        sorted({r["alias"] for r in alias_rows})
    )
    counts: Counter = Counter()
    for d in norm:
        for sentence in split_sentences(d["text_norm"], d["lang"]):
            ents = sorted(
                {
                    amap[surface]
                    for surface in find_mentions(
                        sentence, d["lang"], en_index, zh_aliases
                    )
                }
            )
            for e1, e2 in itertools.combinations(ents, 2):
                counts[(e1, e2)] += 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [{"e1": a, "e2": b, "n": n} for (a, b), n in ranked]


def _degree_hist(edge_rows: list[tuple[str, str, str]], k: int = 30) -> list[dict]:
    """Twin of _kg_degree_hist: total-degree histogram over the distinct
    (src, dst) pairs (self-loops count both endpoints, mirroring the
    Spark unionAll)."""
    e = sorted({(s, o) for s, _p, o in edge_rows})
    deg: Counter = Counter()
    for s, o in e:
        deg[s] += 1
        deg[o] += 1
    hist = Counter(deg.values())
    ranked = sorted(hist.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [{"degree": d, "n_nodes": n} for d, n in ranked]


def _pagerank_topk(
    edge_rows: list[tuple[str, str, str]],
    iterations: int = 8,
    damping: float = 0.85,
    k: int = 20,
) -> list[dict]:
    """Twin of graph.pagerank over the distinct (src, dst) edge set."""
    e = sorted({(s, o) for s, _p, o in edge_rows if s and o})
    nodes = sorted({x for pair in e for x in pair})
    n = len(nodes)
    if n == 0:
        return []
    out_deg = Counter(s for s, _ in e)
    ranks = {node: 1.0 / n for node in nodes}
    base = (1.0 - damping) / n
    in_edges: dict[str, list[str]] = defaultdict(list)
    for s, d in e:
        in_edges[d].append(s)
    for _ in range(iterations):
        dangling = sum(ranks[u] for u in nodes if out_deg.get(u, 0) == 0)
        new = {}
        for v in nodes:
            in_sum = sum(ranks[u] / out_deg[u] for u in in_edges.get(v, ()))
            new[v] = base + damping * (in_sum + dangling / n)
        ranks = new
    rounded = [(node, _round_spark(r, 8)) for node, r in ranks.items()]
    top = sorted(rounded, key=lambda kv: (-kv[1], kv[0]))[:k]
    return [{"node": node, "rank": r} for node, r in top]


def _media_meta(sf_dir: str) -> list[dict]:
    """Twin of _kg_media_meta over the shared documents table."""
    import pyarrow.parquet as pq

    from kgforge.functions.multimodal import _fake_decode

    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["text"])
    agg: dict[str, list] = defaultdict(lambda: [0, 0, 0])  # n, bytes, width_sum
    for text in tbl.column("text").to_pylist():
        payload = (text or "").encode("utf-8")
        fmt, w, _h = _fake_decode(payload)
        a = agg[fmt]
        a[0] += 1
        a[1] += len(payload)
        a[2] += w
    return [
        {
            "format": fmt,
            "n": n,
            "total_bytes": nbytes,
            "avg_width": _round_spark(wsum / n, 4),
        }
        for fmt, (n, nbytes, wsum) in sorted(agg.items())
    ]


def _token_tag_corpus(norm: list[dict]) -> list[dict]:
    """Twin of _kg_token_tag_corpus (en docs → clean → process_line →
    rechunk(8, 64) → chunk-length histogram)."""
    from kgforge.textnorm.cleaning import clean_text, kept_removed_puncs, lower, process_line
    from kgforge.textnorm.constants import DEFAULT_ENGLISH_NER_MAPPING
    from kgforge.textnorm.corpus import rechunk_doc

    kept, removed = kept_removed_puncs(DEFAULT_ENGLISH_NER_MAPPING)
    hist: Counter = Counter()
    for d in norm:
        if d["lang"] != "en":
            continue
        line = clean_text(d["text_norm"] or "", kept, removed, lower)
        tokens, tags = process_line(line or "", DEFAULT_ENGLISH_NER_MAPPING)
        for tok, _tag in rechunk_doc(tokens, tags, str(d["url"]), 8, 64):
            hist[len(tok)] += 1
    return [
        {"chunk_len": ln, "n_chunks": n} for ln, n in sorted(hist.items())
    ]


# ---------------------------------------------------------------------------
# parquet materialization
# ---------------------------------------------------------------------------


def _write(path: str, rows: list[dict], schema) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = {f.name: [r[f.name] for r in rows] for f in schema}
    pq.write_table(pa.table(cols, schema=schema), path)


def _fingerprint(tier: str, sf_dir: str) -> str:
    doc_pq = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(doc_pq) if os.path.exists(doc_pq) else None
    doc_sig = f"{st.st_size}:{int(st.st_mtime)}" if st else "absent"
    return f"{EXPECTED_VERSION}|{tier}|{TIER_DOCS.get(tier, 300)}|{doc_sig}"


def ensure_expected(tier: str = "sf0.01", sf_dir: str | None = None) -> dict[str, str]:
    """Idempotently materialize all kg_* expected tables for ``tier``;
    returns {query_name: parquet_path}. Regenerates when the version stamp
    or the shared documents.parquet changed."""
    import pyarrow as pa

    sf_dir = sf_dir or f"/root/testdata/{tier}"
    out_dir = expected_dir(tier)
    os.makedirs(out_dir, exist_ok=True)
    paths = {t: os.path.join(out_dir, f"{t}.parquet") for t in KG_TABLES}
    stamp_path = os.path.join(out_dir, "_VERSION")
    stamp = _fingerprint(tier, sf_dir)
    if (
        os.path.exists(stamp_path)
        and open(stamp_path).read() == stamp
        and all(os.path.exists(p) for p in paths.values())
    ):
        return paths

    from kgforge.fixtures.gen import gen_alias_rows

    n_docs = TIER_DOCS.get(tier, 300)
    norm = _normalized_docs(n_docs)
    trips = _triples(norm)
    alias_rows = list(gen_alias_rows(n_docs))
    amap = _alias_map(alias_rows)
    edge_rows = _edge_rows(trips, amap)

    s = pa.string()
    _write(
        paths["kg_normalize"],
        norm,
        pa.schema(
            [
                ("url", s),
                ("lang", s),
                ("text_norm", s),
                ("n_tokens", pa.int32()),
                ("n_chunks", pa.int32()),
            ]
        ),
    )
    _write(
        paths["kg_sentences"],
        _sentences(norm),
        pa.schema([("url", s), ("sent_id", pa.int32()), ("sentence", s)]),
    )
    _write(
        paths["kg_triples"],
        trips,
        pa.schema(
            [
                ("url", s),
                ("sent_id", pa.int32()),
                ("subj", s),
                ("pred", s),
                ("obj", s),
                ("conf", pa.float64()),
            ]
        ),
    )
    _write(
        paths["kg_entities"],
        _entities(trips, alias_rows),
        pa.schema(
            [("mention", s), ("entity_id", s), ("canon", s), ("score", pa.float64())]
        ),
    )
    _write(
        paths["kg_edges_topk"],
        _edges_topk(edge_rows),
        pa.schema(
            [("subj_id", s), ("pred", s), ("obj_id", s), ("n", pa.int64())]
        ),
    )
    _write(
        paths["kg_mentions"],
        _mentions_topk(norm, alias_rows, amap),
        pa.schema([("canon_id", s), ("n", pa.int64())]),
    )
    _write(
        paths["kg_linked_fuzzy"],
        _linked_fuzzy_topk(trips, alias_rows, amap),
        pa.schema(
            [("mention", s), ("alias", s), ("canon_id", s), ("score", pa.float64())]
        ),
    )
    _write(
        paths["kg_cooccur"],
        _cooccur_topk(norm, alias_rows, amap),
        pa.schema([("e1", s), ("e2", s), ("n", pa.int64())]),
    )
    _write(
        paths["kg_degree_hist"],
        _degree_hist(edge_rows),
        pa.schema([("degree", pa.int64()), ("n_nodes", pa.int64())]),
    )
    _write(
        paths["kg_media_meta"],
        _media_meta(sf_dir),
        pa.schema(
            [
                ("format", s),
                ("n", pa.int64()),
                ("total_bytes", pa.int64()),
                ("avg_width", pa.float64()),
            ]
        ),
    )
    _write(
        paths["kg_token_tag_corpus"],
        _token_tag_corpus(norm),
        pa.schema([("chunk_len", pa.int32()), ("n_chunks", pa.int64())]),
    )
    _write(
        paths["kg_pagerank_topk"],
        _pagerank_topk(edge_rows),
        pa.schema([("node", s), ("rank", pa.float64())]),
    )
    with open(stamp_path, "w") as f:
        f.write(stamp)
    return paths


def kg_oracle_sql(tier: str = "sf0.01", sf_dir: str | None = None) -> dict[str, str]:
    """DuckDB oracle statements for the kg_* queries (plain SELECTs over
    the materialized expected parquet — all aggregation happened in the
    pure-Python twin, so no DuckDB type coercion can drift)."""
    paths = ensure_expected(tier, sf_dir)
    return {
        name: f"SELECT * FROM read_parquet('{path}')"
        for name, path in paths.items()
    }
