"""Property-based checks (hypothesis) for the pure-Python kernels the
Spark operators broadcast: the Aho-Corasick matcher vs a naive
str.find restatement, and the SimHash banding arithmetic. No Spark
session — these run in milliseconds and explore corners the fixture
corpora cannot.
"""

from __future__ import annotations

import re

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from bio_re_with_entity_embeddings_spark.golden import _WORD  # noqa: E402
from bio_re_with_entity_embeddings_spark.operators.mentions import (  # noqa: E402
    AhoCorasick,
)

SURFACES = ["ab", "abc", "bc", "b", "cab", "abcab", "x_1"]


def naive_find(text: str, surfaces: list[str]):
    """Independent restatement: lowered str.find scan + word-boundary
    check (golden.py:59-71 semantics, no span predicate)."""
    low = text.lower()
    out = set()
    for surface in surfaces:
        start = 0
        while True:
            i = low.find(surface, start)
            if i < 0:
                break
            start = i + 1
            end = i + len(surface)
            if i > 0 and low[i - 1] in _WORD:
                continue
            if end < len(low) and low[end] in _WORD:
                continue
            out.add((i, end, surface))
    return out


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcx_1 .AB", max_size=60))
def test_ahocorasick_equals_naive_find(text):
    auto = AhoCorasick({s: [] for s in SURFACES})
    got = set(auto.find(text))
    assert got == naive_find(text, SURFACES)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=40))
def test_ahocorasick_arbitrary_unicode_no_crash_and_subset(text):
    """On arbitrary unicode (incl. length-changing lower()), every trie
    hit must satisfy the span predicate AFTER filtering — i.e. the
    (begin, end, surface) triples the detectors keep always slice the
    ORIGINAL text to the surface, which is exactly the reference's
    span-validation contract."""
    auto = AhoCorasick({s: [] for s in SURFACES})
    low = text.lower()
    for b, e, surface in auto.find(text, low):
        kept = text[b:e].lower() == surface
        if len(low) == len(text):
            assert kept  # length-preserving lower(): always valid
        # and the lowered-coordinate slice is the surface by definition
        assert low[b:e] == surface


def _chunks(h: int, width: int = 8):
    return [(h >> (c * width)) & ((1 << width) - 1) for c in range(8)]


@settings(max_examples=500, deadline=None)
@given(
    st.integers(min_value=0, max_value=(1 << 64) - 1),
    st.sets(st.integers(min_value=0, max_value=63), max_size=7),
)
def test_simhash_single_chunk_banding_lossless_for_hamming7(h, flips):
    """Pigeonhole: flipping <= 7 of 64 bits leaves >= 1 of the 8 8-bit
    chunks untouched — the single-chunk banding invariant."""
    h2 = h
    for b in flips:
        h2 ^= 1 << b
    assert any(a == b for a, b in zip(_chunks(h), _chunks(h2)))


@settings(max_examples=500, deadline=None)
@given(
    st.integers(min_value=0, max_value=(1 << 64) - 1),
    st.sets(st.integers(min_value=0, max_value=63), max_size=3),
)
def test_simhash_composite_banding_lossless_for_hamming3(h, flips):
    """Flipping <= 3 bits touches <= 3 chunks, leaving >= 5 equal —
    so at least one PAIR of chunks is equal on both sides: the
    composite two-chunk banding invariant (dedup.py radius-3 mode)."""
    h2 = h
    for b in flips:
        h2 ^= 1 << b
    c1, c2 = _chunks(h), _chunks(h2)
    eq = [i for i in range(8) if c1[i] == c2[i]]
    assert any(
        c1[i] == c2[i] and c1[j] == c2[j]
        for i in range(8)
        for j in range(i + 1, 8)
    ), eq


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcx_1 .ABİK", max_size=50))
def test_token_fast_path_predicate_matches_golden(text):
    """The token fast path's kept mentions == golden's for single-token
    surfaces, including length-changing lower() chars (U+0130) and
    length-preserving non-ASCII case folds (U+212A KELVIN -> 'k')."""
    surfaces = {"ab", "abc", "x_1", "kab"}
    token_re = re.compile(r"[a-z0-9_]+")
    low = text.lower()
    safe = len(low) == len(text)
    got = set()
    for m in token_re.finditer(low):
        if m.group() not in surfaces:
            continue
        b, e = m.start(), m.end()
        if not safe and text[b:e].lower() != m.group():
            continue
        got.add((b, e, m.group()))
    want = {
        (b, e, s)
        for (b, e, s) in naive_find(text, sorted(surfaces))
        if text[b:e].lower() == s
    }
    assert got == want


@given(
    st.lists(st.integers(0, 10**9), min_size=1, max_size=300, unique=True),
    st.integers(1, 12),
    st.integers(1, 9),
)
@settings(max_examples=200, deadline=None)
def test_salted_topk_equals_global_topk(keys, quota, n_salts):
    """The exactness core of quota_sample's skew salting
    (operators/curation.py): for ANY salt assignment and ANY total
    order, the global top-``quota`` is contained in the union of
    per-salt top-``quota``s, so stage-2 over the union equals the
    one-stage result exactly. (The Spark fixture test pins the
    plumbing; this explores the combinatorics.)"""
    import hashlib

    def okey(v):  # the operator's (md5(order), order) composite
        return (hashlib.md5(str(v).encode()).hexdigest(), v)

    def salt(v):  # any deterministic assignment works; mirror xxhash-ish
        return hash(("s", v)) % n_salts

    one_stage = sorted(keys, key=okey)[:quota]
    buckets: dict[int, list] = {}
    for v in keys:
        buckets.setdefault(salt(v), []).append(v)
    survivors = [
        v for b in buckets.values() for v in sorted(b, key=okey)[:quota]
    ]
    two_stage = sorted(survivors, key=okey)[:quota]
    assert two_stage == one_stage


@given(
    st.text(alphabet="abcdefgh xyz", min_size=0, max_size=40),
    st.text(alphabet="nopqrstu vw", min_size=0, max_size=40),
    st.text(alphabet="ABCDEFGHJKMNPQ", min_size=8, max_size=30),
)
@settings(max_examples=200, deadline=None)
def test_winnow_text_shared_substring_guarantee(prefix, suffix, shared):
    """Winnowing invariant on the PURE Arrow-kernel core (no Spark):
    two texts sharing a normalized byte run >= k + w - 1 share at
    least one fingerprint; fingerprints are a subset of what a doc
    could keep (count <= gram count); short input yields None."""
    from bio_re_with_entity_embeddings_spark.functions.text import winnow_text

    k, w = 5, 4  # guarantee length k + w - 1 = 8; shared has min_size 8
    a = winnow_text(prefix + " " + shared + " " + suffix, k, w)
    b = winnow_text(suffix + "Z " + shared + " Y" + prefix, k, w)
    assert a is not None and b is not None
    assert set(a.tolist()) & set(b.tolist()), "shared run must share a fp"
    # density: strictly fewer fps than gram positions
    norm = " ".join((prefix + " " + shared + " " + suffix).lower().split())
    assert len(a) <= len(norm.encode()) - k + 1
    assert winnow_text("hi", k, w) is None
    assert winnow_text(None, k, w) is None


@given(
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=500),
    st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_flac_roundtrip_property(pcm, stereo):
    """FLAC encode/decode is the identity on ANY int16 PCM (lossless
    for arbitrary content, not just the sine fixtures): extreme values,
    constant runs, single samples, short final blocks, mid/side."""
    import numpy as np

    from bio_re_with_entity_embeddings_spark.operators import flac as FL

    vals = np.array(pcm, dtype=np.int64)
    if stereo:
        vals = np.stack([vals, vals[::-1]], axis=1)
    rate, ch, dec = FL.decode_flac(FL.encode_flac(vals, rate=8000))
    assert ch == (2 if stereo else 1)
    got = np.rint(dec * 32768).astype(np.int64)
    if stereo:
        got = got.reshape(-1, 2)
    np.testing.assert_array_equal(got, vals)


@given(
    st.integers(2, 40),   # width
    st.integers(2, 40),   # height
    st.integers(2, 200),  # palette size
    st.integers(0, 2**31 - 1),
    st.booleans(),
    st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_gif_roundtrip_property(w, h, npal, seed, interlace, local):
    """GIF encode/decode is the identity on ANY <=256-color image:
    arbitrary dims (interlace pass boundaries), palette sizes crossing
    every LZW width, both color-table placements."""
    import numpy as np

    from bio_re_with_entity_embeddings_spark.operators import multimodal as MM

    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, size=(npal, 3), dtype=np.uint8)
    img = pal[rng.randint(0, npal, size=(h, w))]
    fmt, dec = MM.decode_image(
        MM.encode_gif(img, interlace=interlace, local_palette=local)
    )
    assert fmt == "gif"
    np.testing.assert_array_equal(dec, img)
