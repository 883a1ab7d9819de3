"""Property-based round-trips for the SQL DML/DDL shim's parsers
(round 18 — sources/snapshot_sql.py): generated statements with
nested CASE expressions, string literals containing keywords, typed
column lists with inner commas, and call-bearing assignments must
parse back to exactly the pieces they were built from. Pure Python —
no Spark session — so the example budget can be generous."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from bfs_mapreduce_spark.sources.snapshot_sql import (
    _parse_assignments,
    _parse_partition_spec,
    _split_clause,
    _split_columns_spec,
)

_psettings = settings(max_examples=120, deadline=None)

idents = st.from_regex(r"[a-z][a-z_0-9]{0,8}", fullmatch=True)

# scalar expressions: literals (including keyword-bearing strings),
# column refs, comparisons, calls with commas — the raw material the
# splitters must carry through untouched
_string_lits = st.sampled_from(
    [
        "'x'",
        "'a then b'",
        "'when matched'",
        "'case when'",
        "'it''s, ok'",
        "'end'",
    ]
)
_atoms = st.one_of(
    idents,
    st.integers(0, 99).map(str),
    _string_lits,
    st.tuples(idents, idents).map(lambda t: f"{t[0]}.{t[1]}"),
)


def _cmp(t):
    return f"{t[0]} {t[1]} {t[2]}"


_compares = st.tuples(_atoms, st.sampled_from(["=", "<", ">=", "<>"]), _atoms).map(
    _cmp
)


@st.composite
def case_exprs(draw, depth=2):
    inner = _compares if depth <= 0 else st.one_of(_compares, case_exprs(depth - 1))
    cond = draw(_compares)
    a = draw(inner)
    b = draw(inner)
    return f"CASE WHEN {cond} THEN {a} ELSE {b} END"


_exprs = st.one_of(_compares, _atoms, case_exprs())


@st.composite
def clause_parts(draw):
    kind = draw(
        st.sampled_from(
            ["MATCHED", "NOT MATCHED", "NOT MATCHED BY TARGET", "NOT MATCHED BY SOURCE"]
        )
    )
    cond = draw(st.none() | _exprs)
    action = draw(
        st.one_of(
            st.just("DELETE"),
            st.tuples(idents, _exprs).map(lambda t: f"UPDATE SET {t[0]} = {t[1]}"),
            st.tuples(idents, _exprs).map(
                lambda t: f"INSERT ({t[0]}) VALUES ({t[1]})"
            ),
        )
    )
    return kind, cond, action


@_psettings
@given(parts=clause_parts())
def test_split_clause_roundtrip(parts):
    kind, cond, action = parts
    raw = f"{kind} AND {cond} THEN {action}" if cond else f"{kind} THEN {action}"
    got = _split_clause(raw)
    assert got is not None, raw
    gkind, gcond, gaction = got
    assert re.sub(r"\s+", " ", gkind.upper()) == kind
    assert (gcond or None) == (cond or None)
    assert gaction == action


_type_strs = st.sampled_from(
    [
        "bigint",
        "string",
        "double",
        "decimal(18,2)",
        "decimal(9, 4)",
        "array<double>",
        "map<string,int>",
        "array<decimal(10,2)>",
    ]
)


@_psettings
@given(cols=st.lists(st.tuples(idents, _type_strs), min_size=1, max_size=5))
def test_split_columns_spec_roundtrip(cols):
    # unique names (the parser itself doesn't dedupe; callers do)
    text = "(" + ", ".join(f"{n} {t}" for n, t in cols) + ")"
    assert _split_columns_spec(text) == list(cols)


@_psettings
@given(
    assigns=st.dictionaries(
        idents,
        st.one_of(
            _exprs,
            st.tuples(idents, _atoms, _string_lits).map(
                lambda t: f"{t[0]}({t[1]}, {t[2]})"
            ),
        ),
        min_size=1,
        max_size=5,
    )
)
def test_parse_assignments_roundtrip(assigns):
    text = ", ".join(f"{c} = {e}" for c, e in assigns.items())
    assert _parse_assignments(text) == assigns


@_psettings
@given(
    spec=st.lists(
        st.one_of(
            idents.map(lambda c: ("identity", c)),
            st.tuples(
                st.sampled_from(["truncate", "bucket", "ibucket"]),
                idents,
                st.integers(1, 64),
            ),
        ),
        min_size=1,
        max_size=4,
    )
)
def test_parse_partition_spec_roundtrip(spec):
    text = ", ".join(
        t[1] if t[0] == "identity" else f"{t[0]}({t[2]}, {t[1]})" for t in spec
    )
    assert _parse_partition_spec(text) == spec
