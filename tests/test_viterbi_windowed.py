"""Adversarial equivalence fuzzing for the windowed Viterbi decode.

The corpus-level byte-stability check covers the real logit
distribution; this fuzzer attacks the safe-O-mask proof directly with
random emission matrices shaped like the serving paths produce
(O-dominant floors with non-O islands of varying margin), comparing the
windowed decode against an independent full-sequence reference DP
(the pre-r3 algorithm) for exact path equality."""

import numpy as np
import pytest

from pii_spark.config import LABEL2ID, NUM_LABELS
from pii_spark.detect.serving import _TRANS, _safe_o_mask, _viterbi


def _full_viterbi_reference(logp: np.ndarray) -> np.ndarray:
    """The pre-windowing full decode, kept here as the oracle."""
    n = logp.shape[0]
    back = np.zeros((n, NUM_LABELS), dtype=np.int32)
    score = logp[0].copy()
    for t in range(1, n):
        cand = score[:, None] + _TRANS
        back[t] = cand.argmax(axis=0)
        score = cand.max(axis=0) + logp[t]
    path = np.zeros(n, dtype=np.int32)
    path[-1] = int(score.argmax())
    for t in range(n - 1, 0, -1):
        path[t - 1] = back[t, path[t]]
    return path


def _random_logp(rng: np.random.Generator, n: int) -> np.ndarray:
    """Emission matrices shaped like serving produces: a strong-O floor
    with non-O evidence islands, plus margin-weakened tokens near the
    island edges to stress the cumulative-margin bound."""
    logits = np.zeros((n, NUM_LABELS), dtype=np.float32)
    logits[:, 0] = 7.77  # the untouched-token O floor
    n_islands = int(rng.integers(0, 4))
    for _ in range(n_islands):
        a = int(rng.integers(0, n))
        w = int(rng.integers(1, 6))
        lab = int(rng.integers(1, NUM_LABELS))
        for t in range(a, min(n, a + w)):
            logits[t, 0] = float(rng.uniform(-2, 8))
            logits[t, lab] = float(rng.uniform(0, 12))
            # sprinkle a second competing label sometimes
            if rng.random() < 0.3:
                lab2 = int(rng.integers(1, NUM_LABELS))
                logits[t, lab2] = float(rng.uniform(0, 12))
    # weak-margin tokens: O barely wins, margins near the 8.0 bound
    for _ in range(int(rng.integers(0, 5))):
        t = int(rng.integers(0, n))
        lab = int(rng.integers(1, NUM_LABELS))
        logits[t, lab] = logits[t, 0] - float(rng.uniform(0.0, 2.0))
    z = logits - logits.max(axis=1, keepdims=True)
    p = np.exp(z)
    p /= p.sum(axis=1, keepdims=True)
    return np.log(p + 1e-9)


@pytest.mark.parametrize("seed", range(8))
def test_windowed_equals_full_decode_random(seed):
    rng = np.random.default_rng(seed)
    for _ in range(60):
        n = int(rng.integers(1, 120))
        logp = _random_logp(rng, n)
        got = _viterbi(logp)
        want = _full_viterbi_reference(logp)
        assert (got == want).all(), (n, np.flatnonzero(got != want))


def test_safe_mask_tokens_are_o_in_reference_decode():
    """Every token the mask marks safe must be O in the reference
    decode — the theorem the windowing rests on."""
    rng = np.random.default_rng(424242)
    for _ in range(200):
        n = int(rng.integers(2, 80))
        logp = _random_logp(rng, n)
        safe = _safe_o_mask(logp)
        ref = _full_viterbi_reference(logp)
        assert (ref[safe] == 0).all()


def test_all_o_and_empty_edges():
    assert _viterbi(np.zeros((0, NUM_LABELS))).shape == (0,)
    floor = np.full((10, NUM_LABELS), -7.78, dtype=np.float32)
    floor[:, 0] = -0.015
    assert (_viterbi(floor) == 0).all()
    assert LABEL2ID["O"] == 0  # the tie-break assumption everywhere
