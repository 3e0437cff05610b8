"""Trained head artifact: version sync, deterministic serving, and the
rule-fallback path."""

import numpy as np
import pytest

from pii_spark.detect import serving
from pii_spark.detect.features import DIM, FEATURE_VERSION, featurize_doc
from pii_spark.detect.serving import serve_doc
from pii_spark.tokenizer import tokenize_with_offsets


def test_artifact_version_matches_features():
    if serving._HEAD_PATH.exists():
        z = np.load(serving._HEAD_PATH)
        assert int(z["feature_version"]) == FEATURE_VERSION
        assert z["W"].shape == (DIM, 37)


def test_head_loaded_and_deterministic():
    if not serving._HEAD_PATH.exists():
        pytest.skip("no artifact")
    text = "Contact john.smith@gmail.com or 555-123-4567."
    a = serve_doc(text)
    b = serve_doc(text)
    assert a.entities == b.entities
    assert {e[0] for e in a.entities} == {"EMAIL", "PHONE"}


def test_featurize_shapes():
    text = "ssn 123-45-6789 end"
    tokens, offsets, _ = tokenize_with_offsets(text)
    feats = featurize_doc(
        text, tokens, offsets, ["O"] * len(tokens), [0.0] * len(tokens)
    )
    assert len(feats) == len(tokens)
    assert len(feats[0]) == 0  # BOS carries no features
    assert all(
        (f >= 0).all() and (f < DIM).all() for f in feats if len(f)
    )


def test_rule_fallback_without_artifact(monkeypatch):
    monkeypatch.setattr(serving, "_HEAD_W", None)
    monkeypatch.setattr(serving, "_HEAD_TRIED", True)
    text = "Contact john.smith@gmail.com or 555-123-4567."
    res = serve_doc(text)
    assert {e[0] for e in res.entities} == {"EMAIL", "PHONE"}


def test_ctx_blocks_match_per_block_builders():
    """r9: the fused per-token block builder (_ctx_blocks, one hash pass
    for all five feature blocks) must agree element-for-element with the
    original per-block builders it replaced, over a generated-token
    sample including novel noise-mutated words."""
    import numpy as np

    import pii_spark.detect.features as Fe
    from pii_spark.textgrammar.generator import build_example

    seen = set()
    for i in range(300):
        text = build_example(11, 700_000 + i)["text"]
        for tok in text.split():
            if tok in seen:
                continue
            seen.add(tok)
            got = Fe._ctx_blocks(tok)
            ref = (
                Fe._ctx_feats("pp", tok, False),
                Fe._ctx_feats("p", tok, True),
                Fe._ctx_feats("n", tok, True),
                Fe._ctx_feats("nn", tok, False),
                Fe._self_feats(tok),
            )
            for g, r in zip(got, ref):
                assert np.array_equal(g, r), tok
    assert len(seen) > 1500
