"""Block-max WAND top-k (Ding & Suel style) — pure numpy/heapq kernel.

Operates on per-term decoded posting runs with per-block upper-bound
metadata (SURVEY.md §2C). Used by the driver-side query path
(operators/search.py) after the query's term postings are fetched; the
distributed DataFrame path scores exhaustively and must produce
identical top-k (tested: WAND-on == WAND-off, FIXTURES.md §6).

Pruning is tie-break-aware: docs are visited in increasing doc_id order
and the rank contract breaks ties by ascending doc_id, so a future doc
whose best possible score merely equals the current k-th score loses
anyway. A 1e-10 epsilon keeps pruning robust to float monotonicity
edge cases (prune only when the bound is clearly below threshold).
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass

import numpy as np

from meilibridge_spark.config import DEFAULT_B, DEFAULT_K1
from meilibridge_spark.functions.bm25 import impact_upper_bound, tf_norm

_EPS = 1e-10


@dataclass
class TermPostings:
    """A query term's full decoded posting run + block metadata."""

    term: str
    idf: float
    doc_ids: np.ndarray  # int64, strictly increasing
    tfs: np.ndarray  # int64
    dls: np.ndarray  # int64
    block_starts: np.ndarray  # int64 index of each block's first entry
    block_last_doc: np.ndarray  # int64 last docID per block
    block_ub: np.ndarray  # float64 idf * impact upper bound per block
    suffix_ub: np.ndarray = None  # type: ignore[assignment]

    def __post_init__(self) -> None:
        if self.suffix_ub is None:
            # suffix max of block_ub: UB of everything at/after block i
            self.suffix_ub = (
                np.maximum.accumulate(self.block_ub[::-1])[::-1]
                if self.block_ub.size
                else np.zeros(0)
            )

    @staticmethod
    def from_arrays(
        term: str,
        idf: float,
        doc_ids: np.ndarray,
        tfs: np.ndarray,
        dls: np.ndarray,
        block_size: int,
        avgdl: float,
        k1: float = DEFAULT_K1,
        b: float = DEFAULT_B,
    ) -> "TermPostings":
        n = doc_ids.size
        starts = np.arange(0, n, block_size, dtype=np.int64)
        last = np.minimum(starts + block_size, n) - 1
        block_last_doc = doc_ids[last]
        max_tf = np.maximum.reduceat(tfs, starts) if n else np.zeros(0, np.int64)
        min_dl = np.minimum.reduceat(dls, starts) if n else np.zeros(0, np.int64)
        ub = idf * impact_upper_bound(max_tf, min_dl, avgdl, k1, b)
        return TermPostings(
            term, idf, doc_ids, tfs, dls, starts, block_last_doc, np.asarray(ub)
        )


def _block_of(t: TermPostings, idx: int) -> int:
    return int(np.searchsorted(t.block_starts, idx, side="right") - 1)


def wand_topk(
    terms: "list[TermPostings]",
    k: int,
    avgdl: float,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> "list[tuple[int, float]]":
    """Exact top-k (score desc, doc_id asc) over the union of the terms'
    postings, with block-max pruning. Returns [(doc_id, score)]."""
    return wand_topk_budgeted(terms, k, avgdl, k1, b)[0]


def wand_topk_budgeted(
    terms: "list[TermPostings]",
    k: int,
    avgdl: float,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    deadline: "float | None" = None,
) -> "tuple[list[tuple[int, float]], bool]":
    """``wand_topk`` with an optional wall-clock ``deadline``
    (``time.monotonic()`` timebase) — the anytime form backing the
    serving path's Meilisearch ``searchCutoffMs`` analog
    (operators/search.DriverSearcher.search_cutoff).

    WAND traverses doc-at-a-time in increasing doc_id order and every
    visited doc is FULLY scored before the heap sees it, so stopping at
    the deadline yields a well-defined partial result: the exact top-k
    of the doc-id prefix visited so far (never a doc with a
    partially-accumulated score). Returns (hits, degraded) — degraded
    is True iff the deadline fired before the traversal finished. The
    deadline is polled every 64 pivot iterations (~µs granularity vs
    ms budgets; keeps the check off the hot path)."""
    import time

    terms = [t for t in terms if t.doc_ids.size]
    if not terms or k <= 0:
        return [], False
    ptr = {id(t): 0 for t in terms}
    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap, size<=k

    def theta() -> float:
        return heap[0][0] if len(heap) >= k else -np.inf

    degraded = False
    it = 0
    active = list(terms)
    while active:
        if (
            deadline is not None
            and (it & 63) == 0
            and time.monotonic() >= deadline
        ):
            degraded = True
            break
        it += 1
        active.sort(key=lambda t: int(t.doc_ids[ptr[id(t)]]))
        th = theta()
        # --- find pivot via per-term suffix (remaining-blocks) upper bounds
        acc = 0.0
        pivot_i = -1
        for i, t in enumerate(active):
            acc += float(t.suffix_ub[_block_of(t, ptr[id(t)])])
            if acc > th - _EPS:
                pivot_i = i
                break
        if pivot_i < 0:
            break  # no doc can beat the threshold
        pivot_doc = int(active[pivot_i].doc_ids[ptr[id(active[pivot_i])]])
        # extend the pivot set over terms tied at pivot_doc — they
        # contribute to it and must participate in bound checks
        while (
            pivot_i + 1 < len(active)
            and int(active[pivot_i + 1].doc_ids[ptr[id(active[pivot_i + 1])]])
            == pivot_doc
        ):
            pivot_i += 1

        # --- block-max refinement at the pivot doc
        if len(heap) >= k:
            block_sum = 0.0
            boundary = np.inf
            for t in active[: pivot_i + 1]:
                idx = int(np.searchsorted(t.doc_ids, pivot_doc))
                if idx >= t.doc_ids.size:
                    continue
                blk = _block_of(t, idx)
                block_sum += float(t.block_ub[blk])
                boundary = min(boundary, float(t.block_last_doc[blk]))
            if block_sum <= th - _EPS:
                # safe skip range is [pivot_doc, boundary] w.r.t. the
                # pivot set ONLY — cap at the next term's current doc,
                # which may own docs inside the range (Ding & Suel
                # NextShallow candidate selection)
                d_next = int(boundary) + 1 if np.isfinite(boundary) else pivot_doc + 1
                if pivot_i + 1 < len(active):
                    nxt = int(
                        active[pivot_i + 1].doc_ids[ptr[id(active[pivot_i + 1])]]
                    )
                    d_next = min(d_next, nxt)
                d_next = max(d_next, pivot_doc + 1)
                _advance_all(active, ptr, active[: pivot_i + 1], d_next)
                active = [t for t in active if ptr[id(t)] < t.doc_ids.size]
                continue

        first_doc = int(active[0].doc_ids[ptr[id(active[0])]])
        if first_doc == pivot_doc:
            # --- fully score pivot_doc (exact, all terms sitting on it)
            score = 0.0
            for t in active:
                p = ptr[id(t)]
                if int(t.doc_ids[p]) == pivot_doc:
                    score += t.idf * float(
                        tf_norm(
                            np.float64(t.tfs[p]), np.float64(t.dls[p]), avgdl, k1, b
                        )
                    )
            entry = (score, -pivot_doc)
            if len(heap) < k:
                heapq.heappush(heap, entry)
            elif entry > heap[0]:
                heapq.heapreplace(heap, entry)
            for t in active:
                if int(t.doc_ids[ptr[id(t)]]) == pivot_doc:
                    ptr[id(t)] += 1
            active = [t for t in active if ptr[id(t)] < t.doc_ids.size]
        else:
            # --- advance the leading term with the largest UB to >= pivot.
            # Only terms strictly before the pivot doc are candidates:
            # ties in the sort can place a term already AT pivot_doc ahead
            # of the pivot, and "advancing" it would not move its pointer.
            lead = max(
                (
                    t
                    for t in active[:pivot_i]
                    if int(t.doc_ids[ptr[id(t)]]) < pivot_doc
                ),
                key=lambda t: float(t.suffix_ub[_block_of(t, ptr[id(t)])]),
            )
            ptr[id(lead)] = int(np.searchsorted(lead.doc_ids, pivot_doc))
            if ptr[id(lead)] >= lead.doc_ids.size:
                active.remove(lead)

    out = sorted(heap, key=lambda e: (-e[0], -e[1]))
    return [(-nd, s) for s, nd in out], degraded


def _advance_all(active, ptr, subset, d_next: int) -> None:
    for t in subset:
        p = ptr[id(t)]
        if p < t.doc_ids.size and int(t.doc_ids[p]) < d_next:
            ptr[id(t)] = int(np.searchsorted(t.doc_ids, d_next))


def exhaustive_topk(
    terms: "list[TermPostings]",
    k: int,
    avgdl: float,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> "list[tuple[int, float]]":
    """Reference scorer: full union scan, no pruning (for WAND equality
    tests and small queries)."""
    acc: dict[int, float] = {}
    for t in terms:
        contrib = t.idf * tf_norm(t.tfs, t.dls, avgdl, k1, b)
        for d, c in zip(t.doc_ids.tolist(), contrib.tolist()):
            acc[d] = acc.get(d, 0.0) + c
    ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]


def dense_topk(
    terms: "list[TermPostings]",
    k: int,
    n_docs: int,
    avgdl: float,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> "list[tuple[int, float]]":
    """Exact top-k via dense scatter-add over the docID space — fully
    vectorized (no per-posting Python), so it beats the pointer-walking
    WAND loop whenever the union of postings is large relative to k.
    Memory is 8 bytes/doc (array extent <= ~5e7 is fine driver-side);
    beyond that, serve with wand_topk or the distributed scatter-gather
    path. Same ordering contract: (score desc, doc_id asc).

    ``n_docs`` sizes the array for the dense-id common case; indexes
    built with an external ``doc_id_col`` may have ids >= n_docs, so the
    array is sized by max(n_docs, max doc_id + 1). Negative ids would
    silently wrap to wrong docs and are rejected."""
    live = [t for t in terms if t.doc_ids.size]
    if not live or k <= 0:
        return []
    if any(int(t.doc_ids[0]) < 0 for t in live):
        raise ValueError("dense_topk requires non-negative doc_ids")
    extent = max(n_docs, max(int(t.doc_ids[-1]) for t in live) + 1)
    scores = np.zeros(extent, dtype=np.float64)
    for t in live:
        scores[t.doc_ids] += t.idf * tf_norm(t.tfs, t.dls, avgdl, k1, b)
    pos = np.flatnonzero(scores)
    vals = scores[pos]
    if pos.size > k:
        kth = np.partition(vals, pos.size - k)[pos.size - k]
        keep = vals >= kth
        pos, vals = pos[keep], vals[keep]
    order = np.lexsort((pos, -vals))[:k]
    return [(int(d), float(s)) for d, s in zip(pos[order], vals[order])]
