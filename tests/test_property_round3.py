"""Property tests for round-3 primitives: logfmt serializer/parser
roundtrip and Morton-code invertibility. Pure-Python properties run many
examples; Spark-backed ones reuse the repo's small-example convention."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from data_ingestion_spark.sources.logfmt_source import (
    format_logfmt_row,
    parse_logfmt_line,
)

_key = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,9}", fullmatch=True)
_val = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cc", "Cs"), exclude_characters="\n\r"
    ),
    max_size=30,
)


@settings(max_examples=200)
@given(d=st.dictionaries(_key, _val, max_size=6))
def test_logfmt_roundtrip(d):
    """parse(format(d)) == d for any \\w+-keyed string mapping — the
    serializer and parser are exact inverses (quoting, escapes, flags)."""
    line = format_logfmt_row(d)
    assert parse_logfmt_line(line) == d


@settings(max_examples=300)
@given(x=st.integers(0, 65535), y=st.integers(0, 65535))
def test_morton_interleave_is_invertible(x, y):
    """The Morton key's even/odd bits recover (x, y) exactly — the
    pure-Python replica of layout.morton_key's bit algebra."""
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    rx = sum(((z >> (2 * i)) & 1) << i for i in range(16))
    ry = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
    assert (rx, ry) == (x, y)
    assert 0 <= z < 1 << 32
