"""Compile-time warning sweep over every package source file.

r12 review finding: the pytest.ini module-scoped warning filter does
NOT catch compile-time invalid-escape warnings — Python attributes
them to the importing frame, not the module being compiled, so the
'ai_etl_framework_spark.*' pattern never matches and the r11
novelty.py incident (a stray '\\|' docstring warning riding through
every import sweep for a round) would recur silently. This test is
the guard that actually works: compile() re-parses each source fresh
(no .pyc cache shortcut) under an always-record filter and fails on
ANY SyntaxWarning/DeprecationWarning the parse emits."""

from __future__ import annotations

import pathlib
import warnings

REPO = pathlib.Path(__file__).resolve().parent.parent
SWEEP = (
    sorted((REPO / "ai_etl_framework_spark").rglob("*.py"))
    + [REPO / "__spark_entry__.py", REPO / "bench.py"]
    + sorted((REPO / "scripts").glob("*.py"))
    + sorted((REPO / "examples").glob("*.py"))
    + sorted((REPO / "tests").glob("*.py"))
)


def test_no_compile_time_warnings_anywhere():
    assert len(SWEEP) > 50  # the sweep actually found the tree
    offenders = []
    for path in SWEEP:
        src = path.read_text()
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            try:
                compile(src, str(path), "exec")
            except SyntaxError as ex:  # pragma: no cover - parse gate
                offenders.append(f"{path}: SyntaxError {ex}")
                continue
        for w in caught:
            offenders.append(
                f"{path}:{getattr(w, 'lineno', '?')}: "
                f"{w.category.__name__}: {w.message}"
            )
    assert not offenders, "\n".join(offenders)
