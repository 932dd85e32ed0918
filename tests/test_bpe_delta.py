"""BPE delta-counting trainer (VERDICT r4 item 6): path identity vs the
naive recount-everything loop, auto local/distributed gating, and the
1k-merge throughput bound that makes real vocabularies tractable."""

from __future__ import annotations

import random
import time

from lucene_spark.pipeline.bpe import (
    EOW,
    _greedy_merge,
    _train_local_delta,
    bpe_train,
)


def _naive_train(tab, num_merges, min_pair_count):
    """The pre-round-4 recount-everything reference loop."""
    tab = [(list(s), c) for s, c in tab]
    merges = []
    for _ in range(num_merges):
        counts = {}
        for syms, cnt in tab:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + cnt
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_pair_count:
            break
        merges.append((l, r, c))
        tab = [(_greedy_merge(s, l, r), c2) for s, c2 in tab]
    return merges


def _random_tab(seed, n_words=200):
    rng = random.Random(seed)
    tab = []
    for _ in range(n_words):
        w = "".join(rng.choice("abcdef") for _ in range(rng.randint(1, 8)))
        tab.append((list(w) + [EOW], rng.randint(1, 50)))
    return tab


def test_delta_equals_naive():
    for seed in range(5):
        tab = _random_tab(seed)
        want = _naive_train(tab, 60, 2)
        got = _train_local_delta([(list(s), c) for s, c in tab], 60, 2)
        assert got == want


def test_delta_exhausts_cleanly():
    tab = [(list("aa") + [EOW], 5), (list("a") + [EOW], 3)]
    merges = _train_local_delta(tab, 100, 1)
    # merges run until no pair clears min count; no infinite loop, no
    # negative counts
    assert len(merges) >= 1
    assert all(c >= 1 for _, _, c in merges)


def test_thousand_merges_fast():
    rng = random.Random(99)
    tab = []
    for _ in range(20_000):
        w = "".join(rng.choice("abcdefghijklmnop")
                    for _ in range(rng.randint(2, 12)))
        tab.append((list(w) + [EOW], rng.randint(1, 100)))
    t0 = time.time()
    merges = _train_local_delta(tab, 1000, 1)
    dt = time.time() - t0
    assert len(merges) == 1000
    # the done-criterion: real merge counts in minutes at sf0.1; the
    # 20k-word table clears 1k merges in seconds on one core
    assert dt < 120, f"1k merges took {dt:.1f}s"


def test_auto_mode_collects_and_matches_forced_paths(spark):
    df = spark.createDataFrame(
        [("the cat sat on the mat",), ("the cat ate the rat",),
         ("a mat a rat a cat",)], "text string")
    auto = bpe_train(df, "text", 8, min_pair_count=1)            # auto→local
    forced_local = bpe_train(df, "text", 8, min_pair_count=1, local=True)
    dist = bpe_train(df, "text", 8, min_pair_count=1, local=False)
    assert auto == forced_local == dist
