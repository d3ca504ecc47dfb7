"""Property-based differential testing for the program slicer
(transform/slice.py): generated programs × generated read sets, the
sliced pipeline must agree with the full pipeline on every needed path
AND on the surviving row set.

Programs are built from a small grammar of the shapes that matter to
liveness analysis — assigns with cross-references, locals, guarded
blocks, aborts, dels — over a fixed 3-row input. Spark execution is
the oracle: full vs sliced collected rows compared on the needed
columns.
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import given, settings, strategies as st

    HAS_HYP = True
except Exception:  # pragma: no cover
    HAS_HYP = False

pytestmark = pytest.mark.skipif(not HAS_HYP, reason="hypothesis missing")


FIELDS = ["a", "b", "c", "d"]
INPUTS = ["s1", "s2", "flag"]


@st.composite
def programs(draw):
    lines: list[str] = []
    written: list[str] = []
    locals_: list[str] = []
    n = draw(st.integers(min_value=2, max_value=8))
    for _ in range(n):
        choices = ["assign", "local", "abort_if", "guard_assign"]
        if written:
            choices += ["assign_ref", "del"]
        if locals_:
            choices.append("local_use")
        kind = draw(st.sampled_from(choices))
        tgt = draw(st.sampled_from(FIELDS))
        src = draw(st.sampled_from(INPUTS))
        if kind == "assign":
            lines.append(f".{tgt} = upcase!(.{src})")
            written.append(tgt)
        elif kind == "assign_ref":
            other = draw(st.sampled_from(written))
            lines.append(f".{tgt} = .{other} || .{src}")
            written.append(tgt)
        elif kind == "local":
            lines.append(f"v_{tgt} = downcase!(.{src})")
            locals_.append(f"v_{tgt}")
        elif kind == "local_use":
            lv = draw(st.sampled_from(locals_))
            lines.append(f".{tgt} = {lv} ?? .{src}")
            written.append(tgt)
        elif kind == "del":
            dead = draw(st.sampled_from(written))
            lines.append(f"del(.{dead})")
        elif kind == "guard_assign":
            lines.append(f'if .flag == "y" {{ .{tgt} = upcase!(.{src}) }}')
            written.append(tgt)
        elif kind == "abort_if":
            lines.append(f'if .{src} == "zzz" {{ abort }}')
    needed = draw(
        st.lists(st.sampled_from(FIELDS), min_size=1, max_size=3, unique=True)
    )
    return "\n".join(lines), tuple(needed)


@pytest.fixture(scope="module")
def holder(spark):
    # hypothesis forbids function-scoped fixtures; hold the session in
    # a module-scoped dict
    return {"spark": spark}


@settings(max_examples=60, deadline=None, derandomize=True)
@given(case=programs())
def test_sliced_program_matches_full(holder, case):
    from matano_spark.transform.parser import parse_program
    from matano_spark.transform.compiler import compile_pipeline
    from matano_spark.transform.slice import slice_program

    spark = holder["spark"]
    prog_text, needed = case
    steps = parse_program(prog_text)
    sliced = slice_program(steps, needed)

    df = spark.createDataFrame(
        [("Foo", "Bar", "y"), ("baz", "Qux", "n"), ("zzz", "mm", "y")],
        "s1 string, s2 string, flag string",
    )

    full_out = compile_pipeline(steps)(df)
    cut_out = compile_pipeline(sliced)(df)
    assert full_out.count() == cut_out.count(), prog_text  # row membership

    full_cols = set(full_out.columns)
    cut_cols = set(cut_out.columns)
    for c in needed:
        assert (c in full_cols) == (c in cut_cols), (
            f"{prog_text!r}: column {c} presence differs"
        )

    cols = [c for c in needed if c in full_cols]
    if cols:
        key = lambda t: tuple((x is None, str(x)) for x in t)  # noqa: E731
        f_rows = sorted((tuple(r) for r in full_out.select(*cols).collect()), key=key)
        c_rows = sorted((tuple(r) for r in cut_out.select(*cols).collect()), key=key)
        assert f_rows == c_rows, prog_text
