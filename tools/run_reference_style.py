#!/usr/bin/env python
"""Reference-style single-node baseline: the reference executes its
pipeline as one eager Python process (pandas row loops + a single child
inference process — SURVEY.md §3.1/§4.1). This measures exactly that
execution shape — the shared oracle functions in a plain loop over the
same fixture docs the engine benchmarks on — giving the single-node
docs/sec the engine must match-or-beat.

    python tools/run_reference_style.py [--docs 20000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20000)
    args = ap.parse_args()

    from kgforge.extract.triples import doc_triples
    from kgforge.fixtures.gen import gen_webdocs_rows
    from kgforge.textnorm.constants import (
        DEFAULT_CHINESE_TAG_PUNCTUATOR_MAP,
        DEFAULT_ENGLISH_TAG_PUNCTUATOR_MAP,
    )
    from kgforge.textnorm.pipeline import punctuate_one
    from kgforge.textnorm.tagger import MockTagger

    docs = [
        (r["text"], r["lang"]) for r in gen_webdocs_rows(args.docs)
    ]
    taggers = {"en": MockTagger("en"), "zh": MockTagger("zh")}
    maps = {
        "en": DEFAULT_ENGLISH_TAG_PUNCTUATOR_MAP,
        "zh": DEFAULT_CHINESE_TAG_PUNCTUATOR_MAP,
    }
    # warm (unicode table scans)
    punctuate_one("warm up", taggers["en"], maps["en"])

    t0 = time.perf_counter()
    n_triples = 0
    for text, lang in docs:
        text_norm, _ = punctuate_one(text, taggers[lang], maps[lang])
        n_triples += len(doc_triples(text_norm, lang))
    elapsed = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "mode": "reference-style single process",
                "n_docs": args.docs,
                "n_triples": n_triples,
                "elapsed_sec": round(elapsed, 3),
                "docs_per_sec": round(args.docs / elapsed, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
