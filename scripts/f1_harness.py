"""Offline detector-quality harness (dev tool, no Spark).

Token-space entity F1 of detect_spans() vs generator ground truth —
the same seqeval-equivalent protocol the pipeline test gate uses
(truth and pred both aligned through the shared tokenizer + overlap
rule, mirroring model.ipynb cell 22).
"""

from __future__ import annotations

import collections
import sys

sys.path.insert(0, ".")

from pii_spark.detect.candidates import detect_spans  # noqa: E402
from pii_spark.labeling import decode_bilou, spans_to_token_labels  # noqa: E402
from pii_spark.textgrammar.generator import build_example  # noqa: E402
from pii_spark.tokenizer import tokenize_with_offsets  # noqa: E402


def entities_for(text: str, spans: list[dict]) -> set:
    _, offsets, _ = tokenize_with_offsets(text)
    tags, _ = spans_to_token_labels(offsets, spans)
    return set(decode_bilou(tags))


def main(n: int = 2000, seed: int = 42, show: int = 12) -> None:
    tp = collections.Counter()
    fp = collections.Counter()
    fn = collections.Counter()
    confusion = collections.Counter()  # (true_label, pred_label or None)
    shown = 0
    for doc_id in range(n):
        ex = build_example(seed, doc_id)
        if ex["lang"] != "en":
            continue  # pipeline drops non-English before the PII stage
                      # (reference filters English, model_evaluation.py:27)
        text = ex["text"]
        true_ents = entities_for(text, ex["spans"])
        pred_spans = [
            {"start": c.start, "end": c.end, "label": c.label}
            for c in detect_spans(text)
            if c.label != "IP" and c.conf >= 0.3
        ]
        pred_ents = entities_for(text, pred_spans)
        for e in true_ents & pred_ents:
            tp[e[0]] += 1
        fps = pred_ents - true_ents
        fns = true_ents - pred_ents
        for e in fps:
            fp[e[0]] += 1
        for e in fns:
            fn[e[0]] += 1
            overl = [
                p for p in fps if p[1] <= e[2] and p[2] >= e[1]
            ]
            confusion[(e[0], overl[0][0] if overl else "-miss-")] += 1
        matched_fn_tokens = {
            (a, b) for t, a, b in fns
        }
        for p in fps:
            if not any(p[1] <= b and p[2] >= a for a, b in matched_fn_tokens):
                confusion[("-none-", p[0])] += 1
        if (pred_ents != true_ents) and shown < show:
            shown += 1
            print(f"--- doc {doc_id} ({ex['kind']}) {text[:140]!r}")
            toks, offs, _ = tokenize_with_offsets(text)
            for e in sorted((true_ents - pred_ents)):
                print("   FN", e, repr(text[offs[e[1]][0] : offs[e[2]][1]]))
            for e in sorted((pred_ents - true_ents)):
                print("   FP", e, repr(text[offs[e[1]][0] : offs[e[2]][1]]))
    labels = sorted(set(tp) | set(fp) | set(fn))
    print(f"\n{'label':13s} {'TP':>6s} {'FP':>6s} {'FN':>6s} {'P':>7s} {'R':>7s} {'F1':>7s}")
    T = P_ = F_ = 0
    for lab in labels:
        t, p, f = tp[lab], fp[lab], fn[lab]
        T += t; P_ += p; F_ += f
        prec = t / (t + p) if t + p else 0.0
        rec = t / (t + f) if t + f else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        print(f"{lab:13s} {t:6d} {p:6d} {f:6d} {prec:7.4f} {rec:7.4f} {f1:7.4f}")
    prec = T / (T + P_) if T + P_ else 0.0
    rec = T / (T + F_) if T + F_ else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    print(f"{'MICRO':13s} {T:6d} {P_:6d} {F_:6d} {prec:7.4f} {rec:7.4f} {f1:7.4f}")
    print("\nconfusion (true -> pred):")
    for (t, p), c in confusion.most_common(25):
        print(f"  {t:13s} -> {p:13s} {c}")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    main(n)
