"""Hypothesis property tests for round-4 pure-Python operator cores
(no SparkSession needed — these run in milliseconds and sweep input
space the planted tests can't)."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from data_ingestion_spark.operators.sketch import _mg_merge_shrink
from data_ingestion_spark.sources.html_source import html_extract_blocks


@settings(max_examples=200, deadline=None)
@given(
    stream=st.lists(st.integers(min_value=0, max_value=30), max_size=400),
    k=st.integers(min_value=2, max_value=16),
    batch=st.integers(min_value=1, max_value=50),
)
def test_mg_bound_holds_for_any_stream_and_batching(stream, k, batch):
    """The Misra-Gries invariant under ANY batching: per-token undercount
    ≤ N/k, no overcount, and every token with count > N/k survives."""
    true = Counter(stream)
    n = len(stream)
    counters: dict = {}
    for i in range(0, n, batch):
        counters = _mg_merge_shrink(
            counters, Counter(stream[i : i + batch]), k
        )
    assert len(counters) <= k
    for t, c in counters.items():
        assert c <= true[t]
        assert true[t] - c <= n / k
    for t, c in true.items():
        if c > n / k:
            assert t in counters


@settings(max_examples=150, deadline=None)
@given(data=st.binary(max_size=600))
def test_html_extractor_total_on_arbitrary_bytes(data):
    """The HTML extractor must be TOTAL: any byte soup yields a row list
    (possibly empty) with sane invariants — 1-based contiguous block
    numbers, link density in [0, 10000] bp, kept ⇒ non-trivial text."""
    rows = html_extract_blocks(data)
    for i, (bn, tag, text, n, bp, kept) in enumerate(rows, start=1):
        assert bn == i
        assert isinstance(tag, str) and isinstance(text, str)
        assert n == len(text) >= 1  # empty blocks are dropped
        assert 0 <= bp <= 10000
        if kept:
            assert bp <= 5000 and n >= 10


@settings(max_examples=100, deadline=None)
@given(
    paras=st.lists(
        st.text(
            alphabet=st.characters(blacklist_characters="<>&", min_codepoint=32, max_codepoint=126),
            min_size=10,
            max_size=40,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_html_extractor_roundtrips_plain_paragraphs(paras):
    """Plain <p> wrapping round-trips: every whitespace-normalized,
    non-empty paragraph comes back in order with zero link density."""
    html = "".join(f"<p>{p}</p>" for p in paras).encode()
    expected = [" ".join(p.split()) for p in paras]
    expected = [p for p in expected if p]
    got = [r[2] for r in html_extract_blocks(html, min_chars=1)]
    assert got == expected
    assert all(r[4] == 0 for r in html_extract_blocks(html, min_chars=1))


@settings(max_examples=200, deadline=None)
@given(
    counts=st.dictionaries(
        st.text(alphabet="abcdef", min_size=1, max_size=3),
        st.integers(min_value=1, max_value=10**7),
        min_size=1,
        max_size=8,
    ),
    frac=st.integers(min_value=1, max_value=100),
)
def test_temperature_rates_invariants(counts, frac):
    """For ANY group profile: rates in [0, 10000]; the expected sampled
    total never exceeds the target by more than rounding; and between two
    groups the SMALLER group always keeps the ≥ rate (α<1 upweighting)."""
    from data_ingestion_spark.operators.sampling import temperature_sample_rates

    total = sum(counts.values())
    target = max(1, (total * frac) // 100)
    rates = temperature_sample_rates(counts, target)
    assert set(rates) == set(counts)
    for bp in rates.values():
        assert 0 <= bp <= 10000
    expected = sum(n * rates[g] for g, n in counts.items()) / 10000
    # floor-division keeps each uncapped group's take ≤ its proportional
    # share of target; caps only reduce it further
    assert expected <= target + len(counts)
    for g1, n1 in counts.items():
        for g2, n2 in counts.items():
            if n1 < n2:
                assert rates[g1] >= rates[g2], (counts, rates)
