"""Property-based differential testing of merge_upsert against a
10-line dict-model reference: ANY random (target, source, mode)
triple must produce exactly the rows the dict semantics dictate.
Complements test_merge.py's hand-picked scenarios with generated
edge shapes (empty sides, all-matched, none-matched, NULL payloads)."""

from __future__ import annotations

import pytest

# r14 driver-tier split (VERDICT r13 item 1): this suite is
# hypothesis/differential/e2e-heavy and runs in the SLOW tier
# (`pytest -m slow`); the driver's default `pytest tests/` keeps
# the contract/pin/parity suites inside its verify window.
pytestmark = pytest.mark.slow
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ai_etl_framework_spark.operators.merge import merge_upsert


ROW = st.tuples(
    st.integers(min_value=0, max_value=9),               # key
    st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),  # payload
)


def _unique_by_key(rows):
    seen, out = set(), []
    for k, v in rows:
        if k not in seen:
            seen.add(k)
            out.append((k, v))
    return out


def _model(target, source, mode, insert_unmatched):
    t = {k: v for k, v in target}
    s = {k: v for k, v in source}
    out = {}
    for k, v in t.items():
        if k in s:
            if mode == "update":
                out[k] = s[k]
            elif mode == "ignore":
                out[k] = v
            # delete: drop
        else:
            out[k] = v
    if insert_unmatched:
        for k, v in s.items():
            if k not in t:
                out[k] = v
    return sorted(out.items())


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    target=st.lists(ROW, max_size=12).map(_unique_by_key),
    source=st.lists(ROW, max_size=12).map(_unique_by_key),
    mode=st.sampled_from(["update", "ignore", "delete"]),
    insert_unmatched=st.booleans(),
)
def test_merge_upsert_matches_dict_model(spark, target, source, mode,
                                         insert_unmatched):
    schema = "k int, v string"
    t = spark.createDataFrame(target, schema) if target else \
        spark.createDataFrame([], schema)
    s = spark.createDataFrame(source, schema) if source else \
        spark.createDataFrame([], schema)
    got = sorted(
        (r.k, r.v)
        for r in merge_upsert(t, s, ["k"], when_matched=mode,
                              insert_unmatched=insert_unmatched).collect()
    )
    assert got == _model(target, source, mode, insert_unmatched)
