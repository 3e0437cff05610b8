"""Serving-level F1 harness: measures serve_doc (trained head when the
artifact exists, rule fallback otherwise) against generator truth —
token-space entity F1, per-label, on an arbitrary doc range."""

from __future__ import annotations

import collections
import sys

sys.path.insert(0, ".")

from pii_spark.detect.serving import serve_doc  # noqa: E402
from pii_spark.labeling import decode_bilou, spans_to_token_labels  # noqa: E402
from pii_spark.textgrammar.generator import build_example  # noqa: E402
from pii_spark.tokenizer import tokenize_with_offsets  # noqa: E402


def main(lo: int, hi: int, seed: int = 42) -> None:
    tp = collections.Counter()
    fp = collections.Counter()
    fn = collections.Counter()
    for doc_id in range(lo, hi):
        ex = build_example(seed, doc_id)
        if ex["lang"] != "en":
            continue
        text = ex["text"]
        _, offs, _ = tokenize_with_offsets(text)
        tags, _ = spans_to_token_labels(offs, ex["spans"])
        te = set(decode_bilou(tags))
        res = serve_doc(text)
        pe = {(lab, a, b) for lab, a, b, _s, _e in res.entities if lab != "IP"}
        for e in te & pe:
            tp[e[0]] += 1
        for e in pe - te:
            fp[e[0]] += 1
        for e in te - pe:
            fn[e[0]] += 1
    print(f"{'label':13s} {'TP':>6s} {'FP':>5s} {'FN':>5s} {'P':>7s} {'R':>7s} {'F1':>7s}")
    T = P_ = F_ = 0
    for lab in sorted(set(tp) | set(fp) | set(fn)):
        t, p_, f = tp[lab], fp[lab], fn[lab]
        T += t; P_ += p_; F_ += f
        pr = t / (t + p_) if t + p_ else 0.0
        rc = t / (t + f) if t + f else 0.0
        f1 = 2 * pr * rc / (pr + rc) if pr + rc else 0.0
        print(f"{lab:13s} {t:6d} {p_:5d} {f:5d} {pr:7.4f} {rc:7.4f} {f1:7.4f}")
    pr = T / (T + P_) if T + P_ else 0.0
    rc = T / (T + F_) if T + F_ else 0.0
    print(f"{'MICRO':13s} {T:6d} {P_:5d} {F_:5d} {pr:7.4f} {rc:7.4f} "
          f"{2*pr*rc/(pr+rc):7.4f}")


if __name__ == "__main__":
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    main(lo, hi)
