"""Float-boundary margins for the sim_topk_lsh / sim_topk_ivf oracle
gates (advisor r4): those two oracles require BIT-EXACT agreement through
an exact value-hash, but Spark and DuckDB compute the underlying floats
through different summation orders (numpy matmul vs list_inner_product;
decimal(28,14) centroid means vs double avg). Cross-engine drift is
bounded by ~1e-12 relative; it can flip the gate only at three
discrete boundaries:

  1. an LSH sign bit when a plane projection sits within drift of 0;
  2. an IVF argmax when the best/second-best centroid dots sit within
     drift of each other (assignment OR the n_probe cell cut);
  3. a ROUND(cos, 6) output when a cosine sits within drift of a .5e-6
     rounding boundary.

The sf0.01 corpus is deterministic, so these margins are FIXED numbers —
this test measures all three and asserts floors 6+ orders of magnitude
above the drift bound, converting the oracles' "never observed" comment
into "cannot occur on this corpus". If a future corpus or config change
trips a floor, the failing margin names exactly which boundary to widen
(more planes / different seed salt / a tolerance compare for that query).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.01"
# cross-engine float drift bound (relative ~1e-12 on 64-dim double dots);
# floors sit >= 1e6x above it
DRIFT = 1e-12
N_TABLES, N_PLANES, DIM = 12, 3, 64     # q_sim_topk_lsh config
N_CELLS, N_PROBE = 16, 8                # q_sim_topk_ivf config


@pytest.fixture(scope="module")
def emb():
    path = f"{SF_DIR}/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip(f"{path} not present")
    import pyarrow.parquet as pq

    tb = pq.read_table(path, columns=["vec_id", "embedding"])
    ids = np.asarray(tb["vec_id"].to_pylist(), dtype=np.int64)
    V = np.asarray(tb["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], V[order]


def test_lsh_sign_bit_margin(emb):
    """Min |projection| across every (vector, table, plane): a sign bit
    disagrees between engines only within DRIFT of 0."""
    from prose_spark.operators.similarity import _plane_weights

    _, V = emb
    flat = np.array(
        [w for t in range(N_TABLES)
         for w in _plane_weights(DIM, N_PLANES, salt=f"t{t}p")],
        dtype=np.float64,
    )
    margin = float(np.abs(V @ flat.T).min())
    print(f"lsh min |projection| = {margin:.3e}")
    assert margin > 1e-6, (
        f"LSH sign-bit margin {margin:.3e} within 1e6x of drift bound "
        f"{DRIFT}: the sim_topk_lsh exact-hash oracle could flake"
    )


def _md5_ivf_fit(ids: np.ndarray, V: np.ndarray):
    """Numpy twin of ivf_fit(hash_fn='md5', lloyd_iters=1) — seed order
    by conv(md5-hex[0:15],16,10) then id, L2-normalize, one Lloyd step
    (argmax-dot assign, per-cell double means — the decimal-vs-double
    difference is below DRIFT and irrelevant at the asserted floors),
    re-normalize. Returns (seed_centroids, final_centroids)."""
    h = np.array(
        [int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
         for i in ids],
        dtype=np.int64,
    )
    order = np.lexsort((ids, h))[:N_CELLS]

    def normalize(M):
        n = np.linalg.norm(M, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return M / n

    seeds = normalize(V[order])
    cell = np.argmax(V @ seeds.T, axis=1)
    final = seeds.copy()
    for c in range(N_CELLS):
        members = V[cell == c]
        if len(members):
            final[c] = members.mean(axis=0)
    return seeds, normalize(final)


def test_ivf_argmax_and_probe_margins(emb):
    """Min (best - second best) centroid-dot gap for the Lloyd
    assignment and the final corpus assignment, plus the min gap at the
    n_probe=8 cell cut for the 20 query vectors."""
    ids, V = emb
    seeds, final = _md5_ivf_fit(ids, V)
    for tag, C in (("lloyd_assign", seeds), ("corpus_assign", final)):
        dots = np.sort(V @ C.T, axis=1)
        margin = float((dots[:, -1] - dots[:, -2]).min())
        print(f"ivf {tag} min argmax gap = {margin:.3e}")
        assert margin > 1e-6, (
            f"IVF {tag} margin {margin:.3e} too close to drift "
            f"{DRIFT}: the sim_topk_ivf exact-hash oracle could flake"
        )
    Q = V[ids < 20]
    qd = np.sort(Q @ final.T, axis=1)
    probe_margin = float((qd[:, -N_PROBE] - qd[:, -N_PROBE - 1]).min())
    print(f"ivf n_probe cut min gap = {probe_margin:.3e}")
    assert probe_margin > 1e-6


def _topk(ids, cos_row, cand_mask, k=5):
    """Top-k neighbor ids by (cosine desc, id asc) within a mask."""
    c = np.where(cand_mask, cos_row, -np.inf)
    # lexsort: primary -cos, secondary id
    order = np.lexsort((ids, -c))[:k]
    return [o for o in order if cand_mask[o]]


def test_round6_boundary_margin_on_emitted_rows(emb):
    """Min distance to a .5e-6 ROUND boundary over the rows the three
    topk queries ACTUALLY emit (brute-force, LSH-bucketed, IVF-probed
    top-5 per query — replicated in numpy), in units of 1e-6. ~300
    emitted values give an expected min around 1e-3; the floor of 1e-4
    is still 1e9x the cross-engine drift (~1e-13 in cosine units, i.e.
    1e-7 here)."""
    from prose_spark.operators.similarity import _plane_weights

    ids, V = emb
    n = np.linalg.norm(V, axis=1, keepdims=True)
    n[n == 0] = 1.0
    U = V / n
    qmask = ids < 20
    Q = U[qmask]
    qids = ids[qmask]
    cos = Q @ U.T  # (20, N)

    emitted: list[float] = []
    # brute force: all non-self candidates
    for qi, qid in enumerate(qids):
        cand = ids != qid
        for o in _topk(ids, cos[qi], cand):
            emitted.append(cos[qi, o])
    # LSH: candidates share >= 1 table signature
    flat = np.array(
        [w for t in range(N_TABLES)
         for w in _plane_weights(DIM, N_PLANES, salt=f"t{t}p")],
        dtype=np.float64,
    )
    bits = (V @ flat.T) >= 0
    powers = 1 << np.arange(N_PLANES)
    sigs = (bits.reshape(len(V), N_TABLES, N_PLANES) * powers).sum(axis=2)
    for qi, qid in enumerate(qids):
        qsig = sigs[ids == qid][0]
        cand = (sigs == qsig).any(axis=1) & (ids != qid)
        for o in _topk(ids, cos[qi], cand):
            emitted.append(cos[qi, o])
    # IVF: candidates in the query's n_probe nearest cells
    _, final = _md5_ivf_fit(ids, V)
    cell = np.argmax(V @ final.T, axis=1)
    for qi, qid in enumerate(qids):
        qd = V[ids == qid][0] @ final.T
        probe = set(np.argsort(-qd)[:N_PROBE])
        cand = np.isin(cell, list(probe)) & (ids != qid)
        for o in _topk(ids, cos[qi], cand):
            emitted.append(cos[qi, o])

    vals = np.array(emitted)
    frac = np.abs(np.mod(vals * 1e6, 1.0) - 0.5)
    margin = float(frac.min())
    print(f"round6 emitted rows = {len(vals)}, "
          f"min distance to half-boundary = {margin:.3e} (x1e-6)")
    assert margin > 1e-4, (
        f"ROUND(cos,6) margin {margin:.3e}: a half-boundary cosine "
        "could round differently across engines"
    )
