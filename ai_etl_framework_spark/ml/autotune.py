"""Run-metrics recorder + knob recommender.

Reference: src/ml/auto_tuner.py:44-426 — records per-run throughput /
memory / batch-size, scores each run (:323-343), recommends the best
batch size by average score with a confidence from sample size,
consistency and margin (:244-321), and suggests untried candidates
for exploration (:168-206).

In Spark the reference's batch_size knob is subsumed by AQE and file
split sizing, so the recommender is generic over ANY knob —
`spark.sql.shuffle.partitions`, `spark.sql.files.maxPartitionBytes`,
a salting factor — while keeping the same recommendation math shape:

- score: throughput normalized against the best observed run,
  penalized by relative memory use (the reference's weighted score).
- recommendation: knob value with the best mean score; confidence =
  mean(sample_confidence, consistency, margin); expected improvement
  = best mean score vs the overall mean.
- exploration: first untried candidate from the candidate ladder
  (reference ladder {100,250,500,1000,2500,5000,10000}).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from statistics import mean, pstdev
from typing import Any, Optional

DEFAULT_CANDIDATES = [100, 250, 500, 1000, 2500, 5000, 10000]  # ref :168-206


@dataclass
class RunMetrics:
    knob_value: Any
    records: int
    duration_sec: float
    memory_mb: float = 0.0

    @property
    def throughput(self) -> float:
        return self.records / self.duration_sec if self.duration_sec > 0 else 0.0


@dataclass
class Recommendation:
    knob_value: Any
    confidence: float
    expected_improvement: float
    reason: str


@dataclass
class AutoTuner:
    knob: str = "spark.sql.shuffle.partitions"
    candidates: list = field(default_factory=lambda: list(DEFAULT_CANDIDATES))
    history: list[RunMetrics] = field(default_factory=list)

    # -- recording -----------------------------------------------------

    def record(self, knob_value: Any, records: int, duration_sec: float,
               memory_mb: float = 0.0) -> None:
        self.history.append(RunMetrics(knob_value, records, duration_sec, memory_mb))

    def time_run(self, knob_value: Any, fn, records_getter=len):
        """Convenience: run ``fn``, record wall time + record count."""
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        n = records_getter(out) if callable(records_getter) else int(records_getter)
        self.record(knob_value, n, dt)
        return out

    # -- scoring (ref :323-343) ---------------------------------------

    def _scores(self) -> dict[Any, list[float]]:
        if not self.history:
            return {}
        best_tp = max(r.throughput for r in self.history) or 1.0
        max_mem = max((r.memory_mb for r in self.history), default=0.0)
        by_knob: dict[Any, list[float]] = {}
        for r in self.history:
            s = r.throughput / best_tp
            if max_mem > 0:
                s -= 0.2 * (r.memory_mb / max_mem)  # memory penalty weight
            by_knob.setdefault(r.knob_value, []).append(s)
        return by_knob

    # -- recommendation (ref :244-321) --------------------------------

    def recommend(self) -> Optional[Recommendation]:
        by_knob = self._scores()
        if len(by_knob) < 2:
            return None
        means = {k: mean(v) for k, v in by_knob.items()}
        best = max(means, key=lambda k: means[k])
        runs = by_knob[best]
        overall = mean(s for v in by_knob.values() for s in v)

        sample_conf = min(1.0, len(runs) / 5.0)  # ≥5 runs → full confidence
        consistency = max(0.0, 1.0 - (pstdev(runs) if len(runs) > 1 else 0.0))
        others = [m for k, m in means.items() if k != best]
        margin = min(1.0, (means[best] - max(others)) * 5.0) if others else 0.0
        confidence = mean([sample_conf, consistency, max(0.0, margin)])
        improvement = (means[best] - overall) / overall if overall > 0 else 0.0
        return Recommendation(
            knob_value=best,
            confidence=round(confidence, 3),
            expected_improvement=round(improvement, 3),
            reason=f"best mean score {means[best]:.3f} over {len(runs)} run(s)",
        )

    # -- exploration (ref :168-206) -----------------------------------

    def suggest_exploration(self) -> Optional[Any]:
        tried = {r.knob_value for r in self.history}
        for c in self.candidates:
            if c not in tried:
                return c
        return None
