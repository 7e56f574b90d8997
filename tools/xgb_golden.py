#!/usr/bin/env python3
"""Independent ground-truth scorer for the reference's xgboost JSON models.

Walks the serialized trees directly from the JSON schema (no xgboost
dependency) with xgboost's comparison semantics: features and thresholds
are float32, routing is `float32(v) < float32(split_condition)` (missing ->
default_left), leaf values are float32, margin = sum(leaves) +
logit(base_score), probability = sigmoid(margin)  [binary:logistic].

Emits a golden CSV (model, 14 features, probability) over probe vectors
chosen for maximum routing coverage: random in-range vectors, vectors
pinned EXACTLY on split thresholds (the < vs >= boundary), per-feature-NaN
patterns, all-NaN, and extremes. MlSpec asserts graft.ml.XgbModel matches
every row to 1e-6.

Usage: python3 tools/xgb_golden.py  (writes src/test/resources/fixtures/xgb_golden.csv)
"""
import json
import math
import random

import numpy as np

MODELS = {
    "cvd": "/root/reference/xgb_cvd_model.json",
    "ckd": "/root/reference/xgb_ckd_model.json",
    "anemia": "/root/reference/xgb_anemia_model.json",
}
NUM_FEATURES = 14
OUT = "src/test/resources/fixtures/xgb_golden.csv"


def load(path):
    learner = json.load(open(path))["learner"]
    trees = learner["gradient_booster"]["model"]["trees"]
    base = float(learner["learner_model_param"]["base_score"].strip("[]").split(",")[0])
    return trees, base


def score(trees, base, x):
    """x: list of float64 (nan = missing)."""
    margin = math.log(base / (1.0 - base))
    for t in trees:
        left, right = t["left_children"], t["right_children"]
        cond = t["split_conditions"]
        idx, dleft = t["split_indices"], t["default_left"]
        i = 0
        while left[i] != -1:
            v = x[idx[i]]
            if math.isnan(v):
                i = left[i] if dleft[i] else right[i]
            elif np.float32(v) < np.float32(cond[i]):
                i = left[i]
            else:
                i = right[i]
        margin += float(np.float32(cond[i]))
    return 1.0 / (1.0 + math.exp(-margin))


def thresholds_by_feature(trees):
    th = [set() for _ in range(NUM_FEATURES)]
    for t in trees:
        for i, l in enumerate(t["left_children"]):
            if l != -1:
                th[t["split_indices"][i]].add(t["split_conditions"][i])
    return [sorted(s) if s else [0.0] for s in th]


def probes(trees, rng):
    th = thresholds_by_feature(trees)
    lo = [min(t) - 1.0 for t in th]
    hi = [max(t) + 1.0 for t in th]
    out = []
    for _ in range(30):  # random in-range
        out.append([rng.uniform(lo[f], hi[f]) for f in range(NUM_FEATURES)])
    for _ in range(20):  # every feature pinned exactly on some threshold
        out.append([rng.choice(th[f]) for f in range(NUM_FEATURES)])
    base = [rng.uniform(lo[f], hi[f]) for f in range(NUM_FEATURES)]
    for f in range(NUM_FEATURES):  # single-feature missing
        v = list(base)
        v[f] = float("nan")
        out.append(v)
    out.append([float("nan")] * NUM_FEATURES)
    out.append([0.0] * NUM_FEATURES)
    out.append([1e9] * NUM_FEATURES)
    out.append([-1e9] * NUM_FEATURES)
    return out


def main():
    rng = random.Random(20260812)
    rows = []
    for name, path in MODELS.items():
        trees, base = load(path)
        for x in probes(trees, rng):
            p = score(trees, base, x)
            rows.append([name] + [repr(v) for v in x] + [repr(p)])
    with open(OUT, "w") as f:
        f.write("model," + ",".join(f"f{i}" for i in range(NUM_FEATURES)) + ",prob\n")
        for r in rows:
            f.write(",".join(r) + "\n")
    print(f"wrote {len(rows)} golden rows to {OUT}")


if __name__ == "__main__":
    main()
