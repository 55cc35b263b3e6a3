"""Property tests for the block-prefix Arrow kernels in
engine/multimodal.py: the vectorized implementations must equal a
direct per-row reference on arbitrary payload batches and parameter
combinations (overlapping frames, stride > frame, ragged/empty rows).
Pure numpy/pandas — no SparkSession needed, so the whole parameter
sweep runs in milliseconds.
"""
from __future__ import annotations

import math

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from engine.multimodal import _block_prefix, _concat_payloads, _prefix_at


def _batch(payloads):
    return pd.DataFrame({
        "doc_id": np.arange(len(payloads), dtype=np.int64),
        "payload": payloads,
        "n_bytes": np.array([len(p) for p in payloads], dtype=np.int32),
    })


payload_lists = st.lists(
    st.binary(min_size=0, max_size=300), min_size=1, max_size=12)


@given(payload_lists, st.integers(1, 16), st.integers(0, 64))
@settings(max_examples=60, deadline=None)
def test_concat_padding_invariants(payloads, g, tail):
    pdf = _batch(payloads)
    big, starts, lens, plens = _concat_payloads(pdf, g=g, tail=tail)
    assert (plens % g == 0).all()
    assert (plens >= lens + tail).all()
    assert (starts % g == 0).all()
    assert len(big) == int(plens.sum()) + g      # g trailing zeros
    # payload bytes land at their padded offsets, pad bytes are zero
    for p, s, n, pl in zip(payloads, starts, lens, plens):
        assert bytes(big[s:s + n]) == p
        assert not big[s + n:s + pl].any()


@given(payload_lists, st.integers(1, 16))
@settings(max_examples=60, deadline=None)
def test_prefix_at_equals_cumsum(payloads, g):
    pdf = _batch(payloads)
    big, starts, lens, plens = _concat_payloads(pdf, g=g)
    csB = _block_prefix(big, g)
    ref = np.concatenate(([0], np.cumsum(big.astype(np.int64))))
    total = int(plens.sum())
    idx = np.arange(0, total + 1)
    got = _prefix_at(big, csB, g, idx)
    assert (got == ref[idx]).all()


@given(payload_lists,
       st.integers(1, 8).map(lambda k: 8 * k),    # frame_bytes
       st.integers(1, 10).map(lambda k: 4 * k))   # stride
@settings(max_examples=60, deadline=None)
def test_sample_frames_kernel_matches_reference(payloads, frame_bytes,
                                                stride):
    """The g-aligned block kernel (same math as sample_frames' inner
    fn) equals the obvious per-row slice loop for any (frame, stride)
    combination — overlapping, tiling, or gapped."""
    pdf = _batch(payloads)
    g = math.gcd(stride, frame_bytes)

    big, starts, lens, _ = _concat_payloads(pdf, g=g, tail=frame_bytes)
    nframes = np.where(lens == 0, 0, (lens - 1) // stride + 1)
    total = int(nframes.sum())
    got = []
    if total:
        csB = _block_prefix(big, g)
        first = np.concatenate(([0], np.cumsum(nframes)[:-1]))
        fid = np.arange(total) - np.repeat(first, nframes)
        off = fid * stride
        row_len = np.repeat(lens, nframes)
        end = np.minimum(off + frame_bytes, row_len)
        b0 = (np.repeat(starts, nframes) + off) // g
        checksum = csB[b0 + frame_bytes // g] - csB[b0]
        got = list(zip(np.repeat(pdf["doc_id"].to_numpy(), nframes),
                       fid, off, end - off, checksum))

    want = []
    for doc_id, p in zip(pdf["doc_id"], payloads):
        buf = np.frombuffer(p, dtype=np.uint8)
        n = len(buf)
        for k in range(0 if n == 0 else (n - 1) // stride + 1):
            fr = buf[k * stride:k * stride + frame_bytes]
            want.append((doc_id, k, k * stride, len(fr),
                         int(fr.astype(np.int64).sum())))
    assert [tuple(map(int, r)) for r in got] == \
        [tuple(map(int, r)) for r in want]


@given(payload_lists, st.integers(2, 32))
@settings(max_examples=60, deadline=None)
def test_resize_kernel_matches_reference(payloads, buckets):
    pdf = _batch(payloads)
    big, starts, lens, _ = _concat_payloads(pdf, g=16)
    keep = lens >= buckets
    got = {}
    if keep.any():
        csB = _block_prefix(big, 16)
        n, s = lens[keep], starts[keep]
        bounds = (np.arange(buckets + 1)[None, :] * n[:, None]) // buckets
        pref = _prefix_at(big, csB, 16, s[:, None] + bounds)
        pooled = pref[:, 1:] - pref[:, :-1]
        for d, row in zip(pdf["doc_id"].to_numpy()[keep], pooled):
            got[int(d)] = [int(x) for x in row]

    want = {}
    for doc_id, p in zip(pdf["doc_id"], payloads):
        buf = np.frombuffer(p, dtype=np.uint8)
        n = len(buf)
        if n < buckets:
            continue
        want[int(doc_id)] = [
            int(buf[i * n // buckets:(i + 1) * n // buckets]
                .astype(np.int64).sum())
            for i in range(buckets)]
    assert got == want


@given(payload_lists, st.integers(1, 16))
@settings(max_examples=60, deadline=None)
def test_features_kernel_matches_reference(payloads, dim):
    pdf = _batch(payloads)
    big, starts, lens, plens = _concat_payloads(pdf, g=dim)
    nrows = len(pdf)
    X = big[:len(big) // dim * dim].reshape(-1, dim)
    bs = np.concatenate((starts // dim, [int(plens.sum()) // dim]))
    K = 64
    padrows = (-len(X)) % K
    Xp = (np.vstack([X, np.zeros((padrows, dim), np.uint8)])
          if padrows else X)
    X64 = Xp.reshape(-1, K, dim).sum(axis=1, dtype=np.int64)
    cs64 = np.concatenate(
        [np.zeros((1, dim), np.int64), np.cumsum(X64, axis=0)])
    base, remn = bs // K, bs % K
    gat = Xp[(base * K)[:, None] + np.arange(K)]
    rem = (gat * (np.arange(K)[None, :, None]
                  < remn[:, None, None])).sum(axis=1, dtype=np.int64)
    P = cs64[base] + rem
    sums = P[1:] - P[:-1]
    checksum = sums.sum(axis=1)
    feat = (sums % 997).astype(np.float64)

    for r, p in enumerate(payloads):
        buf = np.frombuffer(p, dtype=np.uint8)
        assert checksum[r] == int(buf.astype(np.int64).sum())
        want = ([float(buf[k::dim].sum() % 997) for k in range(dim)]
                if len(buf) else [0.0] * dim)
        assert list(feat[r]) == want
