"""Deterministic numpy isolation forest (no sklearn in this container).

Reference: src/transformers/analyzers/anomaly_detector.py:265-324 pins
sklearn IsolationForest(contamination=0.1, n_estimators=100,
random_state=42) with column-mean imputation of NULLs (:298-302).
sklearn is not installed here, so this module re-implements the
algorithm from the published paper (Liu, Ting, Zhou, "Isolation
Forest", ICDM 2008): random axis-parallel splits on subsamples of
≤256 rows, anomaly score 2^(-E[h(x)]/c(ψ)), flag the top
`contamination` fraction. Seeded RandomState → fully deterministic,
but NOT bit-identical to sklearn (different RNG consumption order) —
documented divergence; the sklearn path in `anomaly.py` is used when
available.

Execution shape (two modes):
- `fit_predict_global`: ONE applyInPandas group = the reference's
  global-model semantics. Correct at test scale; the whole table
  passes through a single task.
- scale mode (100 TB): `fit` the forest on a driver-side sample
  (`df.sample(...).toPandas()`, bounded), broadcast the fitted trees
  (plain nested lists — cheaply picklable), then `predict` inside
  `mapInPandas` — embarrassingly parallel, no shuffle at all.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np

EULER = 0.5772156649015329


def _c(n: float) -> float:
    """Average path length of an unsuccessful BST search (paper eq. 1)."""
    if n <= 1:
        return 0.0
    return 2.0 * (math.log(n - 1) + EULER) - 2.0 * (n - 1) / n


def _build_tree(x: np.ndarray, rng: np.random.RandomState, depth: int, limit: int):
    """Nested-tuple iTree: (feature, split, left, right) | leaf size."""
    n = x.shape[0]
    if depth >= limit or n <= 1:
        return n
    f = int(rng.randint(x.shape[1]))
    lo, hi = x[:, f].min(), x[:, f].max()
    if lo == hi:
        return n
    s = float(rng.uniform(lo, hi))
    mask = x[:, f] < s
    return (f, s, _build_tree(x[mask], rng, depth + 1, limit),
            _build_tree(x[~mask], rng, depth + 1, limit))


def _path_length(row: np.ndarray, node, depth: int = 0) -> float:
    while not isinstance(node, int):
        f, s, left, right = node
        node = left if row[f] < s else right
        depth += 1
    return depth + _c(node)


class IsolationForestNp:
    def __init__(
        self,
        n_estimators: int = 100,
        max_samples: int = 256,
        contamination: float = 0.1,
        random_state: int = 42,
    ) -> None:
        self.n_estimators = n_estimators
        self.max_samples = max_samples
        self.contamination = contamination
        self.random_state = random_state
        self.trees: list = []
        self.psi: int = 0

    def fit(self, x: np.ndarray) -> "IsolationForestNp":
        rng = np.random.RandomState(self.random_state)
        n = x.shape[0]
        self.psi = min(self.max_samples, n)
        limit = math.ceil(math.log2(max(self.psi, 2)))
        self.trees = []
        for _ in range(self.n_estimators):
            idx = rng.choice(n, self.psi, replace=False) if n > self.psi else np.arange(n)
            self.trees.append(_build_tree(x[idx], rng, 0, limit))
        return self

    def score(self, x: np.ndarray) -> np.ndarray:
        cn = _c(self.psi)
        if cn == 0:
            return np.zeros(x.shape[0])
        depths = np.array(
            [[_path_length(row, t) for t in self.trees] for row in x]
        ).mean(axis=1)
        return np.power(2.0, -depths / cn)

    def fit_predict(self, x: np.ndarray) -> np.ndarray:
        """True = anomaly (top `contamination` fraction by score)."""
        self.fit(x)
        return flags_from_scores(self.score(x), self.contamination)


def flags_from_scores(scores: np.ndarray, contamination: float) -> np.ndarray:
    """The contamination→flag rule in ONE place (r12 review finding):
    flag the top ``max(1, round(contamination·n))`` scores, threshold
    at the k-th largest (ties at the threshold all flag). Shared by
    ``IsolationForestNp.fit_predict`` and ``fit_predict_global`` so a
    future change to tie handling or the k rounding cannot silently
    diverge between the local and Spark paths — exactly the drift the
    x04 fixture oracle would surface but not localize."""
    k = max(1, int(round(contamination * scores.shape[0])))
    threshold = np.partition(scores, -k)[-k]
    return scores >= threshold


def impute_mean(x: np.ndarray) -> np.ndarray:
    """Column-mean imputation of NaNs (ref :298-302)."""
    means = np.nanmean(x, axis=0)
    means = np.where(np.isnan(means), 0.0, means)
    idx = np.where(np.isnan(x))
    x = x.copy()
    x[idx] = np.take(means, idx[1])
    return x


def _fit_order(x: np.ndarray) -> np.ndarray:
    """Row permutation that lexsorts x (first column = primary key).

    r12 (VERDICT r11 item 3): the fit paths feed rows to the seeded
    RNG in ARRIVAL order, so which rows land at the sampled indices —
    and hence the fitted trees — depended on shuffle-fetch /
    partition-concat order. Sorting before fit makes the model a pure
    function of the row MULTISET: deterministic per corpus regardless
    of task scheduling, which is what lets x04 carry a committed
    fixture oracle. lexsort is stable and duplicate rows are
    interchangeable for both fit and (row-local) scoring, so this
    changes nothing semantically — only removes order sensitivity.
    NaNs sort last per numpy's total order; still deterministic.
    """
    return np.lexsort(tuple(x.T[::-1]))


def fit_predict_global(
    df,
    fields: Sequence[str],
    contamination: float = 0.1,
    n_estimators: int = 100,
    random_state: int = 42,
):
    """Global-model fit+predict as a single applyInPandas group —
    the reference's semantics (one model over the whole batch)."""
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        df.schema.fields + [T.StructField("_meta_is_anomaly", T.BooleanType())]
    )
    cols = list(fields)

    def run(pdf):
        x = pdf[cols].astype(float).to_numpy()
        order = _fit_order(x)
        # means over the SORTED matrix: nanmean's pairwise summation
        # is order-sensitive at the last ulp, and an ulp in the
        # imputed value can flip a >= threshold comparison — compute
        # everything fed to the model in multiset-deterministic order.
        means = np.nanmean(x[order], axis=0)
        means = np.where(np.isnan(means), 0.0, means)
        xi = x.copy()
        idx = np.where(np.isnan(xi))
        xi[idx] = np.take(means, idx[1])
        model = IsolationForestNp(
            n_estimators=n_estimators,
            contamination=contamination,
            random_state=random_state,
        ).fit(xi[order])
        pdf = pdf.drop(columns=["__g"])
        pdf["_meta_is_anomaly"] = flags_from_scores(
            model.score(xi), contamination
        )
        return pdf

    return (
        df.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(run, schema=schema)
        .drop("__g")
    )


def fit_sample_predict_distributed(
    df,
    fields: Sequence[str],
    sample_rows: int = 100_000,
    contamination: float = 0.1,
    n_estimators: int = 100,
    random_state: int = 42,
    threshold: Optional[float] = None,
):
    """The 100 TB path: fit on a bounded driver-side sample, broadcast
    the forest, score per-partition with mapInPandas (no shuffle).
    The flag threshold comes from the sample's score quantile (or an
    explicit ``threshold``), since a global top-k needs a sort."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    cols = list(fields)
    n = df.count()
    frac = min(1.0, sample_rows / max(n, 1))
    sample = df.select(*cols).sample(fraction=frac, seed=random_state).toPandas()
    # lexsort before fit (see _fit_order): the fitted forest becomes a
    # function of the sample MULTISET, not of partition-concat order.
    # The multiset itself still rides the seeded per-partition sample
    # over the file layout — one-box determinism, same scope as x01.
    x_raw = sample.astype(float).to_numpy()
    order = _fit_order(x_raw)
    means = np.nanmean(x_raw[order], axis=0)
    means = np.where(np.isnan(means), 0.0, means)
    x = x_raw.copy()
    nan_idx = np.where(np.isnan(x))
    x[nan_idx] = np.take(means, nan_idx[1])
    model = IsolationForestNp(
        n_estimators=n_estimators, contamination=contamination, random_state=random_state
    ).fit(x[order])
    if threshold is None:
        scores = model.score(x)
        threshold = float(np.quantile(scores, 1.0 - contamination))

    schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("_meta_anomaly_score", T.DoubleType()),
            T.StructField("_meta_is_anomaly", T.BooleanType()),
        ]
    )

    def score_partition(batches):
        for pdf in batches:
            xb = pdf[cols].astype(float).to_numpy()
            idx = np.where(np.isnan(xb))
            xb[idx] = np.take(means, idx[1])
            s = model.score(xb)
            out = pdf.copy()
            out["_meta_anomaly_score"] = s
            out["_meta_is_anomaly"] = s >= threshold
            yield out

    return df.mapInPandas(score_partition, schema=schema)
