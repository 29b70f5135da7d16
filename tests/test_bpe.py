"""BPE subword tokenizer (round 5): trainer determinism, a hand-worked
golden, the clean-room twin-encoder pin (the q54 dual-implementation
pattern), and the distributed vocab-join operator."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_read_enhanced_spark.functions.bpe import (
    EOW,
    BPETokenizer,
    bpe_word_counts_batch,
    subword_token_counts,
    train_bpe,
)
from osm_read_enhanced_spark.functions.bpe_merges import MERGES


def _encode_reference(word, ranks):
    """Clean-room twin: recursive, merges ONE occurrence per step of the
    lowest-rank pair present (vs the shipped encoder's simultaneous
    left-to-right merge of all occurrences). Same spec, different
    mechanics — results must agree."""
    sym = list(word) + [EOW]
    while True:
        best = None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, i)
        if best is None:
            return sym
        # merge only the LEFTMOST occurrence of the winning pair
        pair = None
        for i in range(len(sym) - 1):
            if ranks.get((sym[i], sym[i + 1])) == best[0]:
                pair = i
                break
        sym[pair : pair + 2] = [sym[pair] + sym[pair + 1]]


def test_trainer_hand_worked_golden():
    # "abab" x3 + "ab" x2: pair counts round 1: (a,b)=8, (b,a)=3,
    # (b,</w>)=5 → merge (a,b). round 2: (ab,ab)=3, (ab,</w>)=5 →
    # merge (ab,</w>). round 3: (ab,ab</w>)=3 → merge. then (a... none
    # left with count >= 2 except? "abab": [abab</w>] done; "ab": [ab</w>] done.
    merges = train_bpe({"abab": 3, "ab": 2}, 10)
    assert merges[:3] == [("a", "b"), ("ab", EOW), ("ab", "ab" + EOW)]
    tok = BPETokenizer(merges)
    assert tok.encode("abab") == ["abab" + EOW]
    assert tok.encode("ab") == ["ab" + EOW]
    assert tok.encode("ba") == ["b", "a", EOW]


def test_trainer_deterministic_under_dict_order():
    f1 = {"cat": 5, "car": 4, "bat": 3}
    f2 = dict(reversed(list(f1.items())))
    assert train_bpe(f1, 20) == train_bpe(f2, 20)


def test_encoder_matches_cleanroom_twin_on_corpus_and_random():
    ranks = {tuple(m): r for r, m in enumerate(MERGES)}
    tok = BPETokenizer(MERGES)
    rng = np.random.default_rng(13)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    words = ["table", "customer", "window", "spark", "a", "", "zzz"]
    words += [
        "".join(rng.choice(list(alphabet), rng.integers(1, 15)))
        for _ in range(300)
    ]
    for w in words:
        assert tok.encode(w) == _encode_reference(w, ranks), w


def test_reenabled_earlier_merge():
    """A later merge creating a symbol string-equal to an earlier
    operand must re-enable the earlier merge (the reason encode()
    re-scans from the lowest rank instead of one pass in rank order)."""
    # merges: ('a','b') rank0; ('x','y') rank1 creating 'xy'; ('ab','xy') rank2
    merges = [("a", "b"), ("x", "y"), (("ab"), ("xy"))]
    tok = BPETokenizer(merges)
    assert tok.encode("abxy") == ["abxy", EOW]


def test_batch_kernel_and_bounds():
    words = np.array(["table", "spark", "a", "unseen"], dtype=object)
    import pandas as pd

    counts = bpe_word_counts_batch(pd.Series(words), MERGES)
    tok = BPETokenizer(MERGES)
    assert list(counts) == [len(tok.encode(w)) for w in words]
    # 1 <= count <= len(word) + 1 always
    assert all(1 <= c <= len(w) + 1 for c, w in zip(counts, words))


def test_subword_token_counts_operator(spark):
    docs = spark.createDataFrame(
        [
            (1, "table table spark"),
            (2, ""),
            (3, "customer a"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_words, r.n_bpe_tokens) for r in subword_token_counts(docs).collect()}
    tok = BPETokenizer(MERGES)
    t = len(tok.encode("table"))
    s = len(tok.encode("spark"))
    c = len(tok.encode("customer"))
    a = len(tok.encode("a"))
    assert out[1] == (3, 2 * t + s)
    assert out[2] == (0, 0)
    assert out[3] == (2, c + a)
