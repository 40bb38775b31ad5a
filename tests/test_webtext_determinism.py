"""The r6 synthesis optimization reuses ONE worker-resident RandomState,
re-seeded per doc, instead of constructing a fresh RandomState per doc.
These tests pin the property that makes that safe: rs.seed(n) restores the
exact MT19937 state RandomState(n) constructs, for every draw kind
make_doc performs, so the generated corpus is bit-identical to the r1-r5
constructor-per-doc form."""

import numpy as np

from clucene_spark.data.webtext import SEED, make_doc


def test_reseed_equals_fresh_constructor():
    rs = np.random.RandomState(0)
    for seed in (0, 1, 12345, 2**31 - 2):
        fresh = np.random.RandomState(seed)
        rs.seed(seed)
        assert fresh.lognormal(4.6, 0.6) == rs.lognormal(4.6, 0.6)
        assert fresh.zipf(1.3, 7).tolist() == rs.zipf(1.3, 7).tolist()
        assert fresh.rand(5).tolist() == rs.rand(5).tolist()
        assert fresh.randint(0, 100) == rs.randint(0, 100)


def _make_doc_reference(doc_id: int, messy: bool = False):
    """The r1-r5 make_doc draw sequence, fresh constructor per doc."""
    from clucene_spark.data.webtext import PLANTED, vocab

    v = vocab()
    rng = np.random.RandomState((SEED * 1_000_003 + doc_id) % (2**31 - 1))
    n_words = max(5, int(rng.lognormal(mean=4.6, sigma=0.6)))
    idx = np.minimum(rng.zipf(1.3, size=n_words) - 1, len(v) - 1)
    words = [v[i] for i in idx]
    if messy:
        r = rng.rand(len(words))
        for i, w in enumerate(words):
            if r[i] < 0.08:
                words[i] = w.capitalize()
            elif r[i] < 0.12:
                words[i] = w.upper()
            if r[i] > 0.92:
                words[i] += "." if r[i] > 0.96 else ","
    if doc_id % 4 == 0:
        planted = PLANTED[(doc_id // 4) % 16]
        words.insert(int(rng.randint(0, len(words))), planted)
    return " ".join(words)


def test_make_doc_matches_r5_reference():
    for doc_id in list(range(64)) + [997, 12345]:
        for messy in (False, True):
            assert make_doc(doc_id, messy=messy)[4] == _make_doc_reference(
                doc_id, messy
            ), (doc_id, messy)
