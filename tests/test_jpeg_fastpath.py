"""r15 codec fast-path internals (optimization guide §4.5: heavyweight
init once, not per row): the memoized Huffman/segment tables, the
hand-rolled edge padding and the vectorized (de)zigzag permutation must
be bit-identical to the constructs they replaced — these tests pin each
replacement against an inline reference implementation of the old form.
"""

from __future__ import annotations

import numpy as np

from apache_cassandra_spark.analytics import jpeg


def test_pad_plane_matches_np_pad_edge():
    rng = np.random.RandomState(7)
    for _ in range(60):
        h, w = int(rng.randint(1, 20)), int(rng.randint(1, 20))
        bh, bw = h + int(rng.randint(0, 17)), w + int(rng.randint(0, 17))
        plane = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        got = jpeg._pad_plane(plane, bw, bh)
        want = np.pad(plane, ((0, bh - h), (0, bw - w)), mode="edge")
        assert got.dtype == want.dtype
        assert np.array_equal(got, want)


def test_zigzag_permutations_match_the_rowcol_table():
    flat = jpeg._ZZ_FLAT
    assert sorted(flat.tolist()) == list(range(64))
    x = np.arange(1, 65, dtype=np.float64)
    # reference scatter: the old 64-iteration (row, col) loop
    grid = np.zeros((8, 8))
    for i, (r, c) in enumerate(jpeg.ZIGZAG):
        grid[r, c] = x[i]
    assert np.array_equal(x[jpeg._ZZ_INV].reshape(8, 8), grid)
    # reference gather: the old [q[r, c] for r, c in ZIGZAG] loop
    assert np.array_equal(grid.ravel()[flat], x)


def _reference_build_codes(bits, vals):
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def test_huffman_memo_tables_equal_reference_and_hit_on_content():
    jpeg._CODES_MEMO.clear()
    jpeg._DECODE_MEMO.clear()
    for bits, vals in [
        (jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS),
        (jpeg.AC_LUMA_BITS, jpeg.AC_LUMA_VALS),
        (jpeg.DC_CHROMA_BITS, jpeg.DC_CHROMA_VALS),
        (jpeg.AC_CHROMA_BITS, jpeg.AC_CHROMA_VALS),
    ]:
        got = jpeg._build_codes(bits, vals)
        assert got == _reference_build_codes(bits, vals)
        # memo hits on CONTENT equality, not object identity
        assert jpeg._build_codes(list(bits), list(vals)) is got
        dec = jpeg._build_decode_table(bits, vals)
        assert dec == {(ln, c): s for s, (c, ln) in got.items()}
        assert jpeg._build_decode_table(list(bits), list(vals)) is dec


def test_huffman_memo_is_bounded():
    jpeg._CODES_MEMO.clear()
    for i in range(jpeg._MEMO_CAP + 10):
        bits = [0] * 16
        bits[7] = 1
        jpeg._build_codes(bits, [i])  # distinct content per call
    assert len(jpeg._CODES_MEMO) <= jpeg._MEMO_CAP


def test_segment_memos_key_on_content():
    jpeg._DHT_MEMO.clear()
    jpeg._DQT_MEMO.clear()
    a = jpeg._dht_segment(0, 0, jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS)
    b = jpeg._dht_segment(0, 1, jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS)
    assert a != b  # table id is part of the key
    assert jpeg._dht_segment(0, 0, list(jpeg.DC_LUMA_BITS), list(jpeg.DC_LUMA_VALS)) is a
    ones = np.ones((8, 8))
    twos = np.full((8, 8), 2.0)
    qa = jpeg._dqt_segment(0, ones)
    qb = jpeg._dqt_segment(0, twos)
    assert qa != qb
    assert jpeg._dqt_segment(0, np.ones((8, 8))) is qa
    # 16-bit tables only at 12-bit precision; the error path stays uncached
    big = np.full((8, 8), 300.0)
    try:
        jpeg._dqt_segment(0, big, precision=8)
        raise AssertionError("expected ValueError for 16-bit DQT at 8-bit")
    except ValueError:
        pass
    seg12 = jpeg._dqt_segment(0, big, precision=12)
    assert seg12[4] == 0x10  # Pq=1 element precision flag


def test_roundtrip_unchanged_across_memo_reuse():
    """Two encodes of the same image — the second hitting every memo —
    must produce byte-identical payloads, and decode to the same raster."""
    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, size=(13, 17, 3)).astype(np.uint8)
    jpeg._CODES_MEMO.clear()
    jpeg._DECODE_MEMO.clear()
    jpeg._DHT_MEMO.clear()
    jpeg._DQT_MEMO.clear()
    p1 = jpeg.encode_jpeg_baseline(px, subsampling="420", restart_interval=2)
    p2 = jpeg.encode_jpeg_baseline(px, subsampling="420", restart_interval=2)
    assert p1 == p2
    d1 = jpeg.decode_jpeg_pixels(p1)
    d2 = jpeg.decode_jpeg_pixels(p2)
    assert np.array_equal(d1, d2)
