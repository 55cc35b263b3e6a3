"""q_dedup_semantic quantizes two decision lanes before they cross
engines: the centroid distance d2 (1e-6 grid, feeds the argmin
cluster assignment) and the pair cosine (1e-4 grid, feeds the
tau-threshold and the max_cos output). The raw values are float64
sums whose last-ulp bits differ between Spark's aggregation order,
the kernel's strict fold, and DuckDB — so a grid value sitting
exactly on a floor boundary could flip cross-engine (round-8
ADVICE.md: the docstring claimed measured margins that no committed
test pinned).

This test MEASURES the accepted boundary risk per fixture scale,
mirroring tests/test_dsir_ulp_margin.py: it recomputes every d2 and
every within-cluster pair cosine with the same arithmetic shape the
engine uses, and pins the distance of each pre-floor grid value from
its nearest integer boundary.

Error budget: a 64-term float64 dot/ssq sum carries ≲2e-14 relative
perturbation across summation orders; scaled to grid units that is
≲1e-7 quanta for d2 (values ≤ ~1e2) and ≲1e-9 quanta for cosine
(values ≤ 1). The pinned margins (5e-5 grid quanta for d2 — measured
minimum 9.92e-5 at sf0.01 — and 3e-6 for cosine) are ≥500× those, so
the floors cannot flip between engines on these fixtures. The
argmin's winner-vs-runner-up gap is pinned at ≥2 quanta
POST-quantization for the same reason (docstring: measured 4 quanta).
"""
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

SFS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                   "/root/testdata/sf0.1")
       if os.path.exists(os.path.join(d, "embeddings.parquet"))]

TAU = 0.35  # engine.queries.llm.q_dedup_semantic


def _load(sf):
    t = pq.read_table(os.path.join(sf, "embeddings.parquet"),
                      columns=["vec_id", "label", "embedding"])
    vec_id = np.asarray(t.column("vec_id"))
    label = np.asarray(t.column("label"))
    M = np.stack([np.asarray(e, dtype=np.float64)
                  for e in t.column("embedding").to_pylist()])
    order = np.argsort(vec_id)
    return vec_id[order], label[order], M[order]


def _grid_margin(raw, scale):
    """Distance of floor(raw*scale + 0.5)'s pre-floor value from its
    nearest integer boundary, in grid quanta."""
    v = raw * scale + 0.5
    return np.abs(v - np.rint(v))


@pytest.mark.parametrize("sf", SFS)
def test_d2_grid_values_clear_floor_boundaries(sf):
    vec_id, label, M = _load(sf)
    labs = np.unique(label)
    C = np.stack([M[label == l].mean(0) for l in labs])  # label means
    # d2 per (vec, centroid): ||x||^2 - 2 x·c + ||c||^2 expanded the
    # same way any float64 summation lands within ~2e-14 relative
    diff = M[:, None, :] - C[None, :, :]
    d2 = (diff * diff).sum(2)
    margins = _grid_margin(d2, 1e6)
    assert margins.min() > 5e-5, (
        f"{sf}: a d2 grid value sits {margins.min():.3e} quanta from a "
        f"floor boundary — within reach of cross-engine summation-order "
        f"divergence; re-derive the quantization for this fixture")


@pytest.mark.parametrize("sf", SFS)
def test_argmin_winner_gap_after_quantization(sf):
    vec_id, label, M = _load(sf)
    labs = np.unique(label)
    C = np.stack([M[label == l].mean(0) for l in labs])
    diff = M[:, None, :] - C[None, :, :]
    d2q = np.floor((diff * diff).sum(2) * 1e6 + 0.5)  # quantized grid
    d2q.sort(1)
    gap = (d2q[:, 1] - d2q[:, 0]).min()
    assert gap >= 2, (
        f"{sf}: quantized argmin winner and runner-up are {gap} quanta "
        f"apart — a 1-quantum flip would reassign a vector's cluster")


@pytest.mark.parametrize("sf", SFS)
def test_cosine_grid_values_clear_floor_boundaries(sf):
    vec_id, label, M = _load(sf)
    labs = np.unique(label)
    C = np.stack([M[label == l].mean(0) for l in labs])
    diff = M[:, None, :] - C[None, :, :]
    d2q = np.floor((diff * diff).sum(2) * 1e6 + 0.5)
    # argmin with tie-break by cluster id == first index of the min
    assign = d2q.argmin(1)
    nrm = np.sqrt((M * M).sum(1))
    worst = np.inf
    for cl in range(len(labs)):
        idx = np.where(assign == cl)[0]
        if len(idx) < 2:
            continue
        ii, jj = np.triu_indices(len(idx), 1)
        gi, gj = idx[ii], idx[jj]
        # strict left-to-right float64 fold over dims — the exact
        # arithmetic the kernel's requantize pass uses (llm.py)
        prod = M[gi] * M[gj]
        dots = np.zeros(len(prod))
        for t in range(prod.shape[1]):
            dots += prod[:, t]
        cos = dots / (nrm[gi] * nrm[gj])
        worst = min(worst, _grid_margin(cos, 1e4).min())
    assert worst > 3e-6, (
        f"{sf}: a pair cosine sits {worst:.3e} quanta from a floor "
        f"boundary — within reach of cross-engine fold divergence; "
        f"re-derive the quantization for this fixture")


@pytest.mark.parametrize("sf", SFS)
def test_contamination_semantic_margins(sf):
    """Same pin for q_contamination_semantic's train-vs-holdout
    cosines (strict ascending-dim fold, 1e-4 grid): measured minimum
    3.7e-6 quanta over ALL pairs across the three scales — ~2e4x the
    fold-order budget."""
    vec_id, label, M = _load(sf)
    hold = vec_id % 97 == 0
    H, T = M[hold], M[~hold]
    nh = np.sqrt((H * H).sum(1))
    nt = np.sqrt((T * T).sum(1))
    prod = (T[:, None, :] * H[None, :, :]).reshape(-1, M.shape[1])
    dots = np.zeros(len(prod))
    for t in range(prod.shape[1]):
        dots += prod[:, t]
    cos = dots / np.outer(nt, nh).ravel()
    margins = _grid_margin(cos, 1e4)
    assert margins.min() > 3e-6, (
        f"{sf}: a train-holdout cosine sits {margins.min():.3e} quanta "
        f"from a floor boundary — re-derive the quantization for this "
        f"fixture")
