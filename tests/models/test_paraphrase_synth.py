"""Paraphrase fixture invariants (models/paraphrase_synth.py).

The dataset's whole value is the BY-CONSTRUCTION guarantee that queries
share zero word tokens with their gold documents — any overlap would let
BM25/hash channels cheat and the contextual-channel claim would be void.
"""

import re

from youtu_rag_tpu.models.paraphrase_synth import (
    TRAIN_PAIRS_DEFAULT,
    TRAIN_SEED,
    gen_paraphrase_fixture,
    gen_paraphrase_pairs,
    paraphrase_lexicon,
)


def _words(text: str) -> set[str]:
    return set(re.findall(r"[a-z]+", text.lower()))


def test_lexicon_forms_unique_and_disjoint():
    lex = paraphrase_lexicon()
    a_forms = [a for a, _ in lex]
    b_forms = [b for _, b in lex]
    assert len(set(a_forms)) == len(a_forms)
    assert len(set(b_forms)) == len(b_forms)
    assert not set(a_forms) & set(b_forms)


def test_fixture_queries_share_zero_words_with_all_docs():
    docs, qrels = gen_paraphrase_fixture(n_docs=40)
    doc_words = set()
    for d in docs:
        doc_words |= _words(d["content"])
    for q in qrels:
        assert not _words(q["query"]) & doc_words, q["query"]


def test_training_pairs_share_zero_words_within_pair():
    pairs, used = gen_paraphrase_pairs(100)
    assert len(used) > 0
    for p in pairs:
        assert not _words(p["query"]) & _words(p["positive"])


def test_eval_combos_held_out_from_training():
    _, used = gen_paraphrase_pairs(TRAIN_PAIRS_DEFAULT, seed=TRAIN_SEED)
    docs, _ = gen_paraphrase_fixture(n_docs=60, exclude=used)
    for d in docs:
        combo = tuple(int(x) for x in d["metadata"]["combo"].split("-"))
        assert combo not in used


def test_deterministic():
    d1, q1 = gen_paraphrase_fixture(n_docs=10, seed=3)
    d2, q2 = gen_paraphrase_fixture(n_docs=10, seed=3)
    assert d1 == d2 and q1 == q2
