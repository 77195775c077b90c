"""Block-grid scan scaffolding shared by the quantized strategies
(backends/pq.py, sq.py, ivfpq.py) and the exact `grid` algorithm in
operators/knn.py.

The shape: fold the corpus scan payload into block rows
(collect_list), fold the query table into ~512-query block rows, join
the two block relations (crossJoin for full scans, an equi-join on
cluster for pruned scans), and run the scoring kernel per grid cell
with chunked partial top-k so the distance matrix never exceeds
nq_block × _CCHUNK doubles. Everything the kernel needs beyond the
cell row (codebooks, centroids) is closure-small; query vectors arrive
through the join — NO driver collect anywhere, so the plan holds at
any query-batch size (the broadcast/driver-matrix alternative bounds
the batch at driver memory).

Reference analog: none (vicinity scores one in-memory matrix,
basic.py:195-204); this is the distributed decomposition of the same
scan.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_QBLOCK = 512  # queries per grid block
_CCHUNK = 8_192  # corpus rows scored per in-kernel slice
_CTARGET = 65_536  # corpus rows per hash block (density default)


def nearest_centroids(Q: np.ndarray, C: np.ndarray, n: int = 1, Csq=None):
    """(idx nq×n, dist nq×n) — each row's n nearest centroids,
    BLAS-computed, with exact-arithmetic SELECTION: the returned SET
    always equals the exact (squared-l2, index) top-n (the SQL
    oracles' ranking); for n == 1 the single index and its distance
    are fully exact, while for n > 1 the ORDER of two ulp-near
    entries WITHIN the set may follow the BLAS values — every
    consumer treats the probe set as a set (explode / unique /
    membership mask), so selection, not order, is the contract
    (property-pinned in test_nearest_centroids_matches_exact_brute_
    force).

    The distance matrix comes from the expansion
    ‖q‖² + ‖c‖² − 2·q·cᵀ — ONE matmul producing nq×k doubles. The
    broadcasting form ((Q[:,None,:]−C[None,:,:])²).sum(2) every
    centroid-argmin kernel in this engine used before r13
    materializes nq×k×dim doubles instead: ~670 MB per 4096-row Arrow
    batch at k=320/dim=64 (measured: a 1M-row SemDeDup assignment ran
    29× its constant-density scaling target), and at the SemDeDup
    paper's k in the tens of thousands it is simply impossible.

    Exactness contract (the oracles replay selection as
    `ORDER BY exact_sqdist, cid`): the expansion can wobble distances
    by an ulp, so rows whose selection BOUNDARY has candidates within
    a relative tolerance band are re-resolved by exact per-candidate
    recomputation (tiny sets — only real ties and ulp-near ties pay).
    For n == 1 the returned distance is additionally recomputed
    exactly for every row (one k-free vectorized pass — SemDeDup's
    'farthest' keep rule ranks on it); for n > 1 distances beyond the
    boundary repair stay BLAS-valued and callers use only the index
    MEMBERSHIP (probe sets)."""
    if Csq is None:
        Csq = (C * C).sum(axis=1)
    n = min(n, C.shape[0])
    Qsq = (Q * Q).sum(axis=1)
    D = Qsq[:, None] + Csq[None, :] - 2.0 * (Q @ C.T)
    np.maximum(D, 0.0, out=D)
    # O(k) selection (argpartition, never a full sort) + O(1)-column
    # boundary probe: "count(D <= kth+tol) > n" is equivalent to
    # "(n+1)th smallest <= kth+tol", and argpartition pins exactly
    # those two order statistics — so tie DETECTION costs one column
    # compare instead of an nq×k boolean matrix and a full argsort
    # (the constant the r13 kernel swap had added to the ivfsq probe
    # path, ~1.25× on ann_ivfsq_batch)
    if n == 1:
        sel = np.argmin(D, axis=1)[:, None]
        kth = np.take_along_axis(D, sel, axis=1)[:, 0]
        nxt = (
            np.partition(D, 1, axis=1)[:, 1]
            if C.shape[0] > 1
            else np.full_like(kth, np.inf)
        )
    elif n < C.shape[0]:
        part = np.argpartition(D, (n - 1, n), axis=1)
        sel = part[:, :n]
        kth = np.take_along_axis(D, part[:, n - 1 : n], axis=1)[:, 0]
        nxt = np.take_along_axis(D, part[:, n : n + 1], axis=1)[:, 0]
    else:  # n == k: the set is every centroid — nothing to repair
        sel = np.broadcast_to(np.arange(n), (Q.shape[0], n)).copy()
        kth = D.max(axis=1)
        nxt = np.full_like(kth, np.inf)
    dist = np.take_along_axis(D, sel, axis=1)
    # the expansion's cancellation error scales with eps*(|q|²+|c|²),
    # not with the (possibly tiny) distance itself — a band sized only
    # by kth misses genuine near-ties on large-norm vectors whose
    # nearest distances are small relative to their norms, so the band
    # is sized by the computation's magnitude per row
    tol = 1e-9 * (1.0 + Qsq + (float(Csq.max()) if Csq.size else 0.0))
    multi = nxt <= kth + tol
    for r in np.nonzero(multi)[0]:
        cand = np.nonzero(D[r] <= kth[r] + tol[r])[0]  # ascending cid
        d_exact = ((Q[r][None, :] - C[cand]) ** 2).sum(axis=1)
        order = np.argsort(d_exact, kind="stable")[:n]
        sel[r] = cand[order]
        dist[r] = d_exact[order]
    if n == 1:
        clean = ~multi
        if clean.any():
            diff = Q[clean] - C[sel[clean, 0]]
            dist[clean, 0] = (diff * diff).sum(axis=1)
    return sel, dist


def _has_python_stage(df: DataFrame) -> bool:
    """True when df's optimized plan contains a Python-worker stage
    (MapInPandas / ArrowEvalPython / BatchEvalPython / FlatMap*Pandas)
    — the lineages for which an extra count() pass is expensive. Plan
    INSPECTION only (no job runs); unreadable plans report True, the
    conservative side (one bounded checkpoint beats a silent double
    kernel pass)."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:
        return True
    return ("Python" in plan) or ("Pandas" in plan)


def query_blocks(queries: DataFrame, qblock: int = _QBLOCK) -> DataFrame:
    """(__qb, __qids, __qvecs) — the query table folded into
    ceil(nq/qblock) block rows by hashing query_id. Built with one
    distributed count + one groupBy; nothing touches the driver."""
    nq = queries.count()
    nqb = max(1, math.ceil(nq / qblock))
    return (
        queries.select(
            F.pmod(F.xxhash64("query_id"), F.lit(nqb)).cast("int").alias("__qb"),
            "query_id",
            "qvec",
        )
        .groupBy("__qb")
        .agg(
            F.collect_list("query_id").alias("__qids"),
            F.collect_list("qvec").alias("__qvecs"),
        )
    )


def corpus_blocks(
    corpus: DataFrame,
    payload_col: str,
    n_blocks: int = None,
    target_rows: int = _CTARGET,
) -> DataFrame:
    """(__cb, __cids, __ccodes) — the corpus scan payload folded into
    hash blocks (one narrow shuffle of the compact payload).

    Block count is a DIRECT cost multiplier on every consumer: the
    crossJoin against query_blocks ships each query block once per
    corpus block, PQ recomputes its ADC tables per cell, and the
    per-query merge handles kk × n_blocks candidates. So the default
    sizes blocks by payload DENSITY — ceil(count/target_rows), one
    distributed count (the twin of query_blocks' own count) — which
    folds a small corpus into few blocks (the r12 fixed-32 default
    regressed pq/sq ~2× on a 2k-row corpus) while a huge corpus still
    gets memory-bounded cells whose block count grows with the data,
    not with a static conf. Callers that already know their count or
    payload width pass n_blocks directly, or tune target_rows (pq's
    payload is m-byte codes, so it affords denser blocks than the
    dim×8-byte dense decode paths).

    The count is taken so it never doubles the corpus work: a cached
    or file-scan corpus counts directly (column-pruned, ~free), but a
    lineage with Python-worker stages (mapInPandas codecs, Arrow
    UDFs) would re-run the whole kernel chain for the count — there
    the compact (id, payload) projection is materialized once
    (eager localCheckpoint, the payload the fold is about to shuffle
    anyway) and both the count and the fold read the checkpoint
    (caught live: a 200k BMP decode→feature→grid-knn chain ran its
    decode twice, 3.3s → 7.4s, when the count hit the raw lineage).
    At 100 TB the split matters in both directions: checkpointing a
    raw parquet corpus would copy the full payload into executor
    storage for no reason, while re-running a decode lineage for a
    count burns a full Python-worker pass."""
    compact = corpus.select("id", payload_col)
    if n_blocks is None:
        cached = corpus.storageLevel.useMemory or corpus.storageLevel.useDisk
        if not cached and _has_python_stage(compact):
            compact = compact.localCheckpoint(eager=True)
        n_blocks = math.ceil(compact.count() / max(1, target_rows))
    ncb = max(1, n_blocks)
    return (
        compact
        .withColumn("__cb", F.pmod(F.xxhash64("id"), F.lit(ncb)).cast("int"))
        .groupBy("__cb")
        .agg(
            F.collect_list("id").alias("__cids"),
            F.collect_list(payload_col).alias("__ccodes"),
        )
    )


def cell_arrays(pdf: pd.DataFrame, i: int):
    """Decode one grid-cell row back to numpy (ids, payload, qids, Q).

    Corpus entries come back SORTED BY id: collect_list order is
    nondeterministic, and the top-k kernels below break exact-distance
    ties by array position — sorting here makes position order ≡ id
    order, so every cut is a deterministic (distance, id) cut that
    matches the SQL oracles' ORDER BY d, id regardless of partition
    layout (ties are real: duplicate vectors, duplicate quantization
    codes)."""
    ids = np.asarray(pdf["__cids"].iloc[i], dtype=np.int64)
    payload = np.vstack([np.asarray(c) for c in pdf["__ccodes"].iloc[i]])
    order = np.argsort(ids, kind="stable")
    ids, payload = ids[order], payload[order]
    qids = np.asarray(pdf["__qids"].iloc[i], dtype=np.int64)
    Q = np.vstack([np.asarray(v) for v in pdf["__qvecs"].iloc[i]]).astype(np.float64)
    return ids, payload, qids, Q


def det_topk_idx(D: np.ndarray, cap: int) -> np.ndarray:
    """Per-row index SETS of the top-`cap` entries by (value, index) —
    DETERMINISTIC at equal values, where argpartition's tie order is
    arbitrary (and real: duplicate vectors / quantization codes tie
    bit-exactly, so an argpartition boundary is partition-layout-
    dependent). The selected SET is deterministic; order within a row
    is unspecified (every caller re-cuts by (distance, id) downstream).
    Rows whose boundary is tie-free keep the pure O(n) argpartition
    result; only tie-straddling (or NaN-poisoned) rows pay an exact
    per-row resolution. Column index order must equal id order
    (cell_arrays sorts by id)."""
    n, w = D.shape
    cap = min(cap, w)
    if cap == w:
        return np.broadcast_to(np.arange(w, dtype=np.int64), (n, w))
    part = np.argpartition(D, cap - 1, axis=1)[:, :cap]
    kth = np.take_along_axis(D, part, axis=1).max(axis=1)
    counts = (D <= kth[:, None]).sum(axis=1)
    out = part.astype(np.int64)
    for r in np.nonzero(counts != cap)[0]:
        if counts[r] > cap:  # boundary ties — resolve by (value, index)
            cand = np.nonzero(D[r] <= kth[r])[0]  # ascending index order
            out[r] = cand[np.argsort(D[r, cand], kind="stable")[:cap]]
        else:  # NaNs poisoned the kth compare
            out[r] = np.argsort(D[r], kind="stable")[:cap]
    return out


def rescore_pairs(metric, Q: np.ndarray, X: np.ndarray, ii: np.ndarray,
                  budget_bytes: int = 32 << 20) -> np.ndarray:
    """Exact per-pair distances for a candidate matrix: row r of the
    result scores (Q[r], X[ii[r, j]]) with the per-pair kernel
    (`_np_pairwise` — per-row reductions, so the value depends only on
    the pair, never on batch shape). Processed in query-row blocks so
    the repeated-Q and gathered-X temporaries stay ≤ budget_bytes each
    (r14 ADVICE: the unchunked form materialized two nq·cap × dim
    float64 matrices — ~800 MB each at 1k queries × cap 100 × dim
    1024 — a peak-memory term outside the _CCHUNK discipline, and the
    prime suspect for the r14 32-worker crashes)."""
    from vicinity_spark.operators.knn import _np_pairwise

    Q = np.asarray(Q, dtype=np.float64)
    nq, w = ii.shape
    if nq == 0 or w == 0:
        return np.empty((nq, w), dtype=np.float64)
    dim = X.shape[1] if X.ndim == 2 else 1
    out = np.empty((nq, w), dtype=np.float64)
    rows = max(1, budget_bytes // max(1, w * dim * 8))
    for s in range(0, nq, rows):
        blk = ii[s : s + rows]
        A = np.repeat(Q[s : s + rows], w, axis=0)
        out[s : s + rows] = _np_pairwise(metric, A, X[blk.ravel()]).reshape(
            blk.shape
        )
    return out


def _merge_parts(qids, ids, parts_d, parts_i, kk: int, rescore=None) -> pd.DataFrame:
    Dall = np.concatenate(parts_d, axis=1)
    Iall = np.concatenate(parts_i, axis=1)
    cap = min(kk, Dall.shape[1])
    # deterministic (distance, index) cut: pre-order columns by index
    # (index ≡ id rank — cell_arrays sorts by id), then det_topk_idx
    # breaks exact-distance ties by id. The merge matrix is small
    # (cap × n_chunks wide), so the full column re-order is cheap.
    ordI = np.argsort(Iall, axis=1, kind="stable")
    D2 = np.take_along_axis(Dall, ordI, axis=1)
    I2 = np.take_along_axis(Iall, ordI, axis=1)
    if rescore is not None:
        # layout-independent distances (r14, re-sited r15): BLAS matrix
        # kernels are free to pick different micro-kernels for
        # different batch SHAPES, so the same (query, vector) pair can
        # score an ulp apart in different partitions/cells/chunks
        # (observed live on the r14 host: exact duplicates at 0.0 in
        # one partition and 1.11e-16 in another — the downstream
        # (distance, id) cut then kept the WRONG duplicate ids).
        # Re-scoring every surviving per-chunk candidate (≤ kk ×
        # n_chunks wide) with the per-pair kernel — whose reduction
        # runs over each row alone, hence shape-independent — makes
        # the values a function of the pair only. r15 (ADVICE): the
        # rescore moved BEFORE the merge cut — the r14 form rescored
        # only the post-cut winners, so duplicates split across
        # DIFFERENT-SHAPED chunks of one cell could still tie-break on
        # ulp-different per-chunk values at the cap boundary; cutting
        # on the rescored matrix closes that hole. Selection inside a
        # chunk is untouched (one BLAS call scores identical vectors
        # identically); cost is nq × kk·n_chunks pair scores beside
        # the nq × n matrix already computed (<1%).
        Q, X, metric = rescore
        D2 = rescore_pairs(metric, Q, X, I2)
    sel = det_topk_idx(D2, cap)
    dd = np.take_along_axis(D2, sel, axis=1)
    ii = np.take_along_axis(I2, sel, axis=1)
    return pd.DataFrame(
        {
            "query_id": np.repeat(np.asarray(qids, dtype=np.int64), cap),
            "id": np.asarray(ids, dtype=np.int64)[ii.ravel()],
            "distance": dd.ravel(),
        }
    )


def cell_topk(qids, ids, codes, tables, m: int, kk: int) -> pd.DataFrame:
    """Per-query top-kk of one grid cell via PQ ADC lookups —
    D[q, n] = Σ_j tables[q, j, codes[n, j]] — chunked so the distance
    matrix stays bounded. Emits pre-ranked candidate rows; downstream
    only merges bounded per-cell winners."""
    parts_d, parts_i = [], []
    for s in range(0, len(ids), _CCHUNK):
        D = tables[:, np.arange(m), codes[s : s + _CCHUNK]].sum(axis=2)
        cap = min(kk, D.shape[1])
        # chunk columns are in ascending-id order (cell arrays are
        # id-sorted), so det_topk_idx's index tiebreak is an id tiebreak
        idx = det_topk_idx(D, cap)
        parts_d.append(np.take_along_axis(D, idx, axis=1))
        parts_i.append(idx + s)
    return _merge_parts(qids, ids, parts_d, parts_i, kk)


def dense_cell_topk(qids, ids, X: np.ndarray, Q: np.ndarray, metric, kk: int) -> pd.DataFrame:
    """Per-query top-kk of one grid cell over DENSE vectors (the SQ /
    exact-grid sibling of cell_topk). Emitted distances are re-scored
    per-pair so they are independent of cell/chunk shape — see the
    rescore note in _merge_parts (cell_topk's ADC sums are already
    shape-independent: fixed-m reductions per row)."""
    from vicinity_spark.operators.knn import _np_distances

    parts_d, parts_i = [], []
    for s in range(0, len(ids), _CCHUNK):
        D = _np_distances(metric, Q, X[s : s + _CCHUNK])
        cap = min(kk, D.shape[1])
        idx = det_topk_idx(D, cap)  # ties cut by id (see cell_topk)
        parts_d.append(np.take_along_axis(D, idx, axis=1))
        parts_i.append(idx + s)
    return _merge_parts(qids, ids, parts_d, parts_i, kk, rescore=(Q, X, metric))
