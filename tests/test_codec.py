"""Codec unit tests: round-trip, boundary values, seeded fuzz +
hypothesis property tests when available (SURVEY.md §5.2 item 3)."""

import numpy as np

from local_search_engine_spark.functions.codec import (
    decode_block,
    decode_vb,
    encode_block,
    encode_vb,
    pack_i32,
    unpack_i32,
)


def rt(vals):
    got = decode_vb(encode_vb(np.array(vals, dtype=np.uint64)))
    assert got.tolist() == [int(v) for v in vals]


def test_empty():
    assert encode_vb(np.array([], dtype=np.uint64)) == b""
    assert decode_vb(b"").size == 0


def test_boundaries():
    rt([0])
    rt([127, 128, 129])
    rt([(1 << 7) - 1, 1 << 7, (1 << 14) - 1, 1 << 14, (1 << 21) - 1, 1 << 21])
    rt([(1 << 63) - 1, 2**64 - 1, 0, 1])


def test_seeded_fuzz():
    rng = np.random.default_rng(42)
    for scale in (1, 100, 10**6, 10**12, 2**62):
        vals = rng.integers(0, scale, size=1000, dtype=np.uint64)
        rt(vals)


def test_block_roundtrip():
    doc_ids = np.array([4096, 4100, 4101, 5000, 6143], dtype=np.int64)
    tfs = np.array([1, 50, 2, 7, 1], dtype=np.int64)
    dvb, tvb = encode_block(doc_ids, tfs, block_base=4096)
    d2, t2 = decode_block(dvb, tvb, block_base=4096)
    assert d2.tolist() == doc_ids.tolist()
    assert t2.tolist() == tfs.tolist()


def test_pack_i32():
    a = np.array([0, 1, 2**31 - 1, 7], dtype=np.int32)
    assert unpack_i32(pack_i32(a)).tolist() == a.tolist()


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
    def test_property_roundtrip(vals):
        rt(vals)

    @settings(max_examples=100, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=2047),
                st.integers(min_value=1, max_value=1000),
            ),
            min_size=1,
            max_size=200,
            unique_by=lambda x: x[0],
        ),
        st.integers(min_value=0, max_value=2**40),
    )
    def test_property_block(postings, base_mult):
        base = base_mult
        postings = sorted(postings)
        doc_ids = np.array([base + off for off, _ in postings], dtype=np.int64)
        tfs = np.array([tf for _, tf in postings], dtype=np.int64)
        dvb, tvb = encode_block(doc_ids, tfs, block_base=base)
        d2, t2 = decode_block(dvb, tvb, block_base=base)
        assert d2.tolist() == doc_ids.tolist()
        assert t2.tolist() == tfs.tolist()

except ImportError:  # pragma: no cover
    pass


def test_vb_sliced_matches_per_run():
    import numpy as np

    from local_search_engine_spark.functions.codec import encode_vb, encode_vb_sliced

    rng = np.random.default_rng(7)
    for trial in range(20):
        n_runs = int(rng.integers(1, 12))
        runs = [
            rng.integers(0, 2**int(rng.integers(1, 63)), size=int(rng.integers(0, 9)))
            for _ in range(n_runs)
        ]
        values = np.concatenate([r.astype(np.uint64) for r in runs]) if any(
            r.size for r in runs
        ) else np.empty(0, np.uint64)
        starts, pos = [], 0
        for r in runs:
            starts.append(pos)
            pos += r.size
        got = encode_vb_sliced(values, np.asarray(starts))
        want = [encode_vb(r.astype(np.uint64)) for r in runs]
        # trailing empty runs collapse identically to b""
        assert got == want
