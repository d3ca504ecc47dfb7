"""Execution-floor pin: EVERY VRL program in the reference's managed
log-source ymls (103 at r7) compiles AND executes end-to-end on a
synthesized representative event, with `ts` landing non-null wherever
the program assigns it — the engine's drop-in-your-matano-yml promise
at execution level, not just compile level (round-7 verdict item 1).

Detail / per-program iteration: `python tools/vrl_exec_survey.py`.
"""

from __future__ import annotations

import os

import pytest

REF_MANAGED = "/root/reference/data/managed/log_sources"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_MANAGED), reason="reference tree not present"
)


# slow tier (~15 min: compiles+executes all ~103 reference programs in
# one test): the default tier keeps execution coverage for every pack
# FAMILY via the per-pack table suites and test_sources_ported; the
# full per-program sweep runs with `pytest -m slow`.
@pytest.mark.slow
def test_every_reference_managed_program_executes(spark):
    from tools.vrl_exec_survey import _load_overrides, run_one
    from tools.vrl_parse_survey import iter_programs

    _load_overrides()
    n = 0
    failures: list[str] = []
    for path, kind, prog in sorted(iter_programs(REF_MANAGED)):
        rel = os.path.relpath(path, REF_MANAGED)
        n += 1
        try:
            status, detail = run_one(spark, rel, kind, prog)
        except Exception as e:  # noqa: BLE001 — collected for the report
            failures.append(f"CRASH {rel} [{kind}]: {type(e).__name__}: {str(e)[:160]}")
            continue
        if status == "ts-null":
            failures.append(f"TSNULL {rel} [{kind}]: {detail}")
    assert n >= 90  # the managed set only grows
    assert not failures, "\n".join(failures)
