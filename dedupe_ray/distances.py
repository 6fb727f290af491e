"""Field distance kernels — vectorized, batch-oriented.

Re-implements the reference library's per-variable comparators ([lib:
dedupe/variables/* in dedupe==3.0.3], exercised via scoreDuplicates at the
``partition`` call, backend/dedupe_script.py:360):

- String → normalized affine-gap alignment distance (the ``affinegap`` C
  extension's semantics: match=1, mismatch=11, gap open=10, space=7,
  abbreviation_scale=0.125, normalized by len(a)+len(b); identical strings
  score 0.5·len·2/(2·len) = 0.5). Implemented here as a **batched numpy
  Gotoh DP**: vectorized over the whole pair batch and over the shorter
  string's positions; the insertion recurrence's left-to-right dependency is
  resolved with a prefix-min (np.minimum.accumulate), so the only Python loop
  is over the longer string's length.
- Price → |log10 p1 − log10 p2| ([lib: dedupe/variables/price.py]).
- Exact → 1.0 if equal else 0.0.
- DateTime → parsed-delta days distance with affine-gap fallback for
  unparseable values (the reference uses the ``datetimetype`` package's fuzzy
  comparator; the numeric scale differs but the learner fits to whatever
  scale the feature has).
- Text → TF-IDF cosine *similarity* against corpus document frequencies
  ([lib: CosineTextSimilarity]); the idf table is computed by a Ray groupby
  and broadcast to scorer actors.

Missing values ("N/A") are handled by the feature assembler (features.py):
distance 0 + missing-indicator 1, mirroring has_missing=True semantics
[lib: dedupe/datamodel.py].
"""

from __future__ import annotations

import math
import re

import numpy as np

MATCH = 1.0
MISMATCH = 11.0
GAP_OPEN = 10.0
SPACE = 7.0
ABBREV_SCALE = 0.125

_INF = np.float32(np.inf)
_MAX_LEN = 256  # strings truncated here; KNA-style fields are ≪ this


def _encode(
    strings: list[str], max_len: int, lens: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """list[str] → (codes uint32 [n, max_len] padded with 0, lengths [n]).

    Vectorized: numpy U-dtype fixed-width array viewed as uint32 — no
    per-string python encode (numpy truncates to max_len on construction).
    python len() is O(1) per string — np.char.str_len re-scans the
    fixed-width buffer per row and was 9% of scorer stage CPU (round 5);
    callers that already hold the raw lengths pass them via ``lens``."""
    n = len(strings)
    arr = np.array(strings, dtype=f"U{max_len}")
    codes = arr.view(np.uint32).reshape(n, max_len)
    if lens is None:
        lens = np.fromiter((len(s) for s in strings), np.int32, n)
    else:
        lens = lens.astype(np.int32, copy=True)
    np.minimum(lens, np.int32(max_len), out=lens)
    return codes, lens


def _factorize_pairs(
    a: list[str], b: list[str]
) -> tuple[list[str], list[str], np.ndarray]:
    """Canonical unique-pair dedup: (a, b) pair lists → (ua, ub, inv) where
    kernel(a, b) == kernel(ua, ub)[inv] for any SYMMETRIC elementwise kernel.

    Candidate-pair batches repeat the same field-value pair heavily for
    low-cardinality fields (measured on the 800k flagship: City 9.5×,
    Region 86×, Country 156× duplication per 4096-pair batch) — computing
    each distinct (value, value) pair once and scattering is exact and
    collapses that work. None is normalized to "" (the kernels' own
    convention) BEFORE factorizing, since pd.factorize would code None as -1.
    """
    import pandas as pd

    n = len(a)
    both = np.array([(s or "") for s in a] + [(s or "") for s in b], object)
    codes, uniques = pd.factorize(both)
    ca, cb = codes[:n], codes[n:]
    lo = np.minimum(ca, cb).astype(np.int64)
    hi = np.maximum(ca, cb).astype(np.int64)
    key = lo * len(uniques) + hi
    ukey, inv = np.unique(key, return_inverse=True)
    ulo = ukey // len(uniques)
    uhi = ukey % len(uniques)
    return list(uniques[ulo]), list(uniques[uhi]), inv


def affine_gap_batch(a_strings: list[str], b_strings: list[str]) -> np.ndarray:
    """Normalized affine-gap distance for each pair; float32 [n].

    Memoized over distinct canonical pairs (the kernel is symmetric — the
    core orders each pair longer-first itself, and equal-length pairs are
    symmetric because the abbreviation discount needs a strictly longer
    side); the DP runs once per distinct (a, b) value pair. (A round-5
    experiment with a cross-batch pair cache measured the python probe
    loop costing as much as the saved DP — per-batch dedup is the right
    granularity.)"""
    n = len(a_strings)
    if n <= 8:
        return _affine_gap_core(a_strings, b_strings)
    ua, ub, inv = _factorize_pairs(a_strings, b_strings)
    if len(ua) == n:  # no duplication — skip the scatter copy
        return _affine_gap_core(
            [s or "" for s in a_strings], [s or "" for s in b_strings]
        )
    return _affine_gap_core(ua, ub)[inv]


def _affine_gap_core(a_strings: list[str], b_strings: list[str]) -> np.ndarray:
    n = len(a_strings)
    out = np.empty(n, np.float32)
    if n == 0:
        return out

    # order so A is the longer string of each pair; equal-string fast path
    A: list[str] = [""] * n
    B: list[str] = [""] * n
    eq = np.zeros(n, bool)
    for i in range(n):
        a, b = a_strings[i] or "", b_strings[i] or ""
        if a == b:
            eq[i] = True
            A[i] = a
            B[i] = b
        elif len(a) >= len(b):
            A[i], B[i] = a, b
        else:
            A[i], B[i] = b, a

    # resolve equal-string and empty-side pairs without the DP:
    # empty vs s → plain gap (GAP_OPEN + SPACE·len) / len, no abbreviation
    trivial = eq.copy()
    for i in range(n):
        if eq[i]:
            out[i] = 0.5 if A[i] else 0.0  # match·la / (2·la); empty==empty → 0
        elif not B[i]:
            la = len(A[i])
            out[i] = (GAP_OPEN + SPACE * la) / max(la, 1)
            trivial[i] = True
    idx = np.nonzero(~trivial)[0]
    if len(idx) == 0:
        return out

    sa = [A[i] for i in idx]
    sb = [B[i] for i in idx]
    lens_a = np.fromiter((len(s) for s in sa), np.int32, len(idx))
    lens_b = np.fromiter((len(s) for s in sb), np.int32, len(idx))
    la_max = min(int(lens_a.max()), _MAX_LEN)
    lb_max = min(int(lens_b.max()) if len(idx) else 0, _MAX_LEN)
    ac, la = _encode(sa, la_max, lens_a)
    bc, lb = _encode(sb, max(lb_max, 1), lens_b)
    m = len(idx)

    if lb_max == 0:
        # one side empty: pure gap
        dist = GAP_OPEN + SPACE * la.astype(np.float32)
        norm = np.maximum(la.astype(np.float32), 1.0)
        out[idx] = (dist / norm).astype(np.float32)
        return out

    # Sort by the longer side's length so finished pairs fall off the FRONT
    # of the DP state: row i only needs pairs with la >= i, which after the
    # sort is a suffix. Cost drops from la_max·m row-updates to sum(la) —
    # ~2× on skewed name fields. Row ops are independent across pairs, so
    # reordering + slicing is exact.
    order = np.argsort(la, kind="stable")
    la_all = la[order]
    lb_all = lb[order]
    ac_all = ac[order]
    bc_all = bc[order]
    out_idx = idx[order]

    # Process pairs in cache-sized cohorts: at m ≈ 50k the [m × width]
    # DP state arrays total ~50 MB and every row-iteration streams them
    # from DRAM; a ~2k cohort keeps the whole state L2-resident across
    # ALL row iterations (measured 2× on the flagship's long name field).
    # Pairs are independent — chunking changes nothing per pair. Bonus:
    # cohorts are length-sorted, so early cohorts run at their own
    # (smaller) la_max/width.
    for c0 in range(0, m, _DP_CHUNK):
        c1 = min(c0 + _DP_CHUNK, m)
        _affine_gap_dp_chunk(
            ac_all[c0:c1], la_all[c0:c1], bc_all[c0:c1], lb_all[c0:c1],
            out, out_idx[c0:c1],
        )
    return out


_DP_CHUNK = 2048


def _affine_gap_dp_chunk(
    ac_s: np.ndarray,
    la_s: np.ndarray,
    bc_s: np.ndarray,
    lb_s: np.ndarray,
    out: np.ndarray,
    out_idx: np.ndarray,
) -> None:
    m = len(la_s)
    la_max = int(la_s[-1])  # sorted ascending
    lb_max = int(lb_s.max())
    bmat = bc_s[:, :lb_max]  # [m, lb_max]
    width = lb_max
    # DP state over j = 0..width (cost of aligning a[:i] with b[:j])
    Mm = np.full((m, width + 1), _INF, np.float32)  # ends in (mis)match
    Ii = np.full((m, width + 1), _INF, np.float32)  # ends in gap in A (consume b)
    Dd = np.full((m, width + 1), _INF, np.float32)  # ends in gap in B (consume a)
    Mm[:, 0] = 0.0
    j_arr = np.arange(1, width + 1, dtype=np.float32)
    Ii[:, 1:] = GAP_OPEN + SPACE * j_arr

    jspace = SPACE * np.arange(width + 1, dtype=np.float32)
    final = np.full(m, _INF, np.float32)
    abbrev_best = np.full(m, _INF, np.float32)

    # abbreviation discount exists only when the strings differ in length:
    # the original affinegap activates it in rows i > len(shorter) only,
    # which for equal-length pairs is never — and that is what keeps the
    # distance symmetric for equal-length inputs (either string may be "A")
    strictly_longer = (la_s > lb_s)
    start = 0
    for i in range(1, la_max + 1):
        ns = int(np.searchsorted(la_s, i))  # first pair with la >= i
        if ns > start:
            d = ns - start
            Mm, Ii, Dd, bmat = Mm[d:], Ii[d:], Dd[d:], bmat[d:]
            start = ns
            if start >= m:
                break
            w2 = int(lb_s[start:].max())
            if w2 < width:  # live maximum b-length dropped: shed columns
                width = w2
                Mm, Ii, Dd = Mm[:, : width + 1], Ii[:, : width + 1], Dd[:, : width + 1]
                bmat = bmat[:, :width]
                jspace = jspace[: width + 1]
        la_a = la_s[start:]
        lb_a = lb_s[start:]
        rows_a = np.arange(m - start)
        best_prev = np.minimum(np.minimum(Mm, Ii), Dd)
        # snapshot abbreviation candidates at row i-1: trailing gap deleting
        # a[i-1:la] at discounted extension cost (the affinegap abbreviation
        # semantics: gaps running to the end of the longer string are cheap)
        b_end = best_prev[rows_a, lb_a]
        cand = b_end + GAP_OPEN + SPACE * ABBREV_SCALE * (la_a - (i - 1)).astype(np.float32)
        seg = abbrev_best[start:]
        np.minimum(seg, np.where(strictly_longer[start:], cand, _INF), out=seg)

        # D: gap in B consuming a[i-1] (vector over j)
        Dd = np.minimum(Mm + (GAP_OPEN + SPACE), Dd + SPACE)
        # M: substitution of a[i-1] vs b[j-1]
        achar = ac_s[start:, i - 1: i]  # [act,1]
        sub = np.where(bmat == achar, np.float32(MATCH), np.float32(MISMATCH))
        newM = np.full((m - start, width + 1), _INF, np.float32)
        newM[:, 1:] = best_prev[:, :-1] + sub
        Mm = newM
        # I: gap in A, prefix-min over k<j of M[i,k] + open + space*(j-k)
        g = Mm + GAP_OPEN - jspace
        pm = np.minimum.accumulate(g, axis=1)
        Ii = np.full((m - start, width + 1), _INF, np.float32)
        Ii[:, 1:] = jspace[1:] + pm[:, :-1]

        done = la_a == i
        if done.any():
            best_cur = np.minimum(np.minimum(Mm, Ii), Dd)
            fseg = final[start:]
            vals = best_cur[rows_a, lb_a]
            fseg[done] = vals[done]

    dist = np.minimum(final, abbrev_best)
    norm = (la_s + lb_s).astype(np.float32)
    out[out_idx] = dist / np.maximum(norm, 1.0)


def affine_gap(a: str, b: str) -> float:
    """Scalar convenience wrapper (tests / driver-side)."""
    return float(affine_gap_batch([a], [b])[0])


def levenshtein_batch(a_strings: list[str], b_strings: list[str]) -> np.ndarray:
    """Plain (unit-cost) edit distance per pair, vectorized; int32 [n].

    Row-sweep DP over the longer string's positions; the within-row
    insertion chain ``cur[j] <= cur[j-1] + 1`` is resolved with the same
    prefix-min trick as the affine-gap kernel, so the only Python loop is
    over the longer string's length."""
    n = len(a_strings)
    out = np.zeros(n, np.int32)
    if n == 0:
        return out
    A: list[str] = [""] * n
    B: list[str] = [""] * n
    trivial = np.zeros(n, bool)
    for i in range(n):
        a, b = a_strings[i] or "", b_strings[i] or ""
        if a == b:
            trivial[i] = True
        elif not a or not b:
            out[i] = len(a) or len(b)
            trivial[i] = True
        elif len(a) >= len(b):
            A[i], B[i] = a, b
        else:
            A[i], B[i] = b, a
    idx = np.nonzero(~trivial)[0]
    if len(idx) == 0:
        return out
    sa = [A[i] for i in idx]
    sb = [B[i] for i in idx]
    lens_a = np.fromiter((len(s) for s in sa), np.int32, len(idx))
    lens_b = np.fromiter((len(s) for s in sb), np.int32, len(idx))
    la_max = min(int(lens_a.max()), _MAX_LEN)
    lb_max = min(int(lens_b.max()), _MAX_LEN)
    ac, la = _encode(sa, la_max, lens_a)
    bc, lb = _encode(sb, max(lb_max, 1), lens_b)
    m = len(idx)

    # same suffix-slicing as the affine-gap DP: sort by la so row i only
    # touches the still-active suffix (pairs with la >= i); same
    # cache-sized cohort chunking (pairs are independent)
    order = np.argsort(la, kind="stable")
    la_all = la[order]
    lb_all = lb[order]
    ac_all = ac[order]
    bc_all = bc[order]
    out_idx = idx[order]
    for c0 in range(0, m, _DP_CHUNK):
        c1 = min(c0 + _DP_CHUNK, m)
        _lev_dp_chunk(
            ac_all[c0:c1], la_all[c0:c1], bc_all[c0:c1], lb_all[c0:c1],
            out, out_idx[c0:c1],
        )
    return out


def _lev_dp_chunk(
    ac_s: np.ndarray,
    la_s: np.ndarray,
    bc_s: np.ndarray,
    lb_s: np.ndarray,
    out: np.ndarray,
    out_idx: np.ndarray,
) -> None:
    m = len(la_s)
    la_max = int(la_s[-1])
    lb_max = int(lb_s.max())
    bmat = bc_s[:, :lb_max]
    width = lb_max
    jidx = np.arange(width + 1, dtype=np.float32)
    prev = np.tile(jidx, (m, 1))
    final = np.zeros(m, np.float32)
    start = 0
    for i in range(1, la_max + 1):
        ns = int(np.searchsorted(la_s, i))
        if ns > start:
            d = ns - start
            prev, bmat = prev[d:], bmat[d:]
            start = ns
            if start >= m:
                break
            w2 = int(lb_s[start:].max())
            if w2 < width:
                width = w2
                prev = prev[:, : width + 1]
                bmat = bmat[:, :width]
                jidx = jidx[: width + 1]
        cost = (bmat != ac_s[start:, i - 1 : i]).astype(np.float32)
        tmp = np.empty((m - start, width + 1), np.float32)
        tmp[:, 0] = i
        np.minimum(prev[:, 1:] + 1.0, prev[:, :-1] + cost, out=tmp[:, 1:])
        cur = np.minimum.accumulate(tmp - jidx, axis=1) + jidx
        done = la_s[start:] == i
        if done.any():
            fseg = final[start:]
            vals = cur[np.arange(m - start), lb_s[start:]]
            fseg[done] = vals[done]
        prev = cur
    out[out_idx] = final.astype(np.int32)


def levenshtein(a: str, b: str) -> int:
    """Scalar convenience wrapper (tests / driver-side)."""
    return int(levenshtein_batch([a], [b])[0])


_ALIGN_MIN_TOK = 3  # tokens shorter than this carry little identity signal
_ALIGN_MAX_TOKS = 10
_ALIGN_TOK_LEN = 24


_TOK_CACHE: dict[str, list[str]] = {}
_TOK_CACHE_MAX = 262_144  # ≈25 MB worst case per worker; cleared when full


def _align_tokens(s: str) -> list[str]:
    """Tokenize for alignment; memoized per worker process (pure function of
    the string — candidate pairs repeat each record's value many times)."""
    got = _TOK_CACHE.get(s)
    if got is not None:
        return got
    toks = _TOKEN.findall(s or "")
    kept = [t[:_ALIGN_TOK_LEN] for t in toks if len(t) >= _ALIGN_MIN_TOK]
    if not kept:
        kept = [t[:_ALIGN_TOK_LEN] for t in toks]
    kept = kept[:_ALIGN_MAX_TOKS]
    if len(_TOK_CACHE) >= _TOK_CACHE_MAX:
        _TOK_CACHE.clear()
    if isinstance(s, str):
        _TOK_CACHE[s] = kept
    return kept


def token_align_batch(a: list[str], b: list[str]) -> np.ndarray:
    """Worst-token alignment distance (symmetric token Hausdorff); [n] in [0,1].

    Per pair: tokenize both sides (``[\\w']+``; tokens < 3 chars dropped
    unless nothing longer exists; capped at 10 tokens × 24 chars);
    d(u,v) = lev(u,v) / max(|u|,|v|); the feature is the max over EVERY
    token of its min distance to the other side's tokens, taken over both
    directions. ≈0 when every token has a close counterpart (typo/corruption
    duplicates), →1 when some token was wholly REPLACED (a coined/brand word
    swap between distinct entities) — the signal a whole-string alignment
    distance dilutes across long multi-token names.

    No counterpart in the reference (dedupe==3.0.3 ships no token-level
    comparator); motivated by the Monge-Elkan token-similarity family,
    sharpened from avg-of-max to max-of-min so one replaced token dominates.
    All token-vs-token DPs across the batch run as ONE vectorized
    levenshtein_batch call over the deduplicated cross-product.

    Memoized over distinct canonical pairs (symmetric by construction —
    max over BOTH directions), same rationale as affine_gap_batch.
    """
    n = len(a)
    if n > 8:
        ua, ub, inv = _factorize_pairs(a, b)
        if len(ua) < n:
            return _token_align_core(ua, ub)[inv]
    return _token_align_core(a, b)


def _token_align_core(a: list[str], b: list[str]) -> np.ndarray:
    n = len(a)
    out = np.zeros(n, np.float32)
    if n == 0:
        return out
    # equal-string fast path: alignment distance is 0 by definition, and
    # equal fields dominate candidate pairs blocked on whole|<field> —
    # skip tokenization + combo build entirely for them
    neq = [i for i in range(n) if (a[i] or "") != (b[i] or "")]
    if not neq:
        return out
    if len(neq) < n:
        out[np.asarray(neq)] = _token_align_core(
            [a[i] for i in neq], [b[i] for i in neq]
        )
        return out
    import pandas as pd

    # tokenize each DISTINCT string once (strings repeat across pairs even
    # after pair-level dedup — each record joins many candidate pairs)
    codes_s, uniq_strs = pd.factorize(
        np.array([(s or "") for s in a] + [(s or "") for s in b], object)
    )
    utoks = [_align_tokens(s) for s in uniq_strs]
    toks_a = [utoks[c] for c in codes_s[:n]]
    toks_b = [utoks[c] for c in codes_s[n:]]

    # Vectorized combo construction. Tokens are factorized to int ids; the
    # per-pair cross-product (combo) index arrays are pure cumsum/repeat
    # arithmetic; within a pair the combos are laid out a-token-major, so
    # per-a-slot minima and per-pair maxima reduce over CONTIGUOUS runs
    # (np.minimum.reduceat) — only the b-side min needs a scatter (ufunc.at).
    na = np.fromiter((len(t) for t in toks_a), np.int64, n)
    nb = np.fromiter((len(t) for t in toks_b), np.int64, n)
    valid = (na > 0) & (nb > 0)
    if not valid.any():
        return out
    vidx = np.nonzero(valid)[0]
    na_v = na[vidx]
    nb_v = nb[vidx]
    flat_a = [t for p in vidx for t in toks_a[p]]
    flat_b = [t for p in vidx for t in toks_b[p]]
    codes, uniq_tokens = pd.factorize(np.array(flat_a + flat_b, object))
    ta_ids = codes[: len(flat_a)]
    tb_ids = codes[len(flat_a):]

    a_end = np.cumsum(na_v)
    b_end = np.cumsum(nb_v)
    a_off = a_end - na_v
    b_off = b_end - nb_v
    c_per = na_v * nb_v
    seg_end = np.cumsum(c_per)
    seg_start = seg_end - c_per
    C = int(seg_end[-1])
    pair_of_combo = np.repeat(np.arange(len(vidx)), c_per)
    local = np.arange(C, dtype=np.int64) - seg_start[pair_of_combo]
    nb_c = nb_v[pair_of_combo]
    ai = a_off[pair_of_combo] + local // nb_c  # flat a-token slot per combo
    bi = b_off[pair_of_combo] + local % nb_c
    u = ta_ids[ai]
    v = tb_ids[bi]

    neq_c = u != v
    d_combo = np.zeros(C, np.float32)
    if neq_c.any():
        V = np.int64(len(uniq_tokens))
        key = np.minimum(u, v).astype(np.int64) * V + np.maximum(u, v)
        ukey, uinv = np.unique(key[neq_c], return_inverse=True)
        uu = uniq_tokens[ukey // V]
        vv = uniq_tokens[ukey % V]
        lev = levenshtein_batch(list(uu), list(vv)).astype(np.float32)
        # token lengths come from the (small) vocabulary, indexed per
        # unique pair — tokens are pre-truncated to _ALIGN_TOK_LEN, so
        # python len() is the exact length
        tok_lens = np.fromiter(
            (len(t) for t in uniq_tokens), np.float32, len(uniq_tokens)
        )
        denom = np.maximum(tok_lens[ukey // V], tok_lens[ukey % V])
        d_combo[neq_c] = (lev / np.maximum(denom, np.float32(1.0)))[uinv]

    # per-a-slot min over its nb contiguous combos, then per-pair max over
    # its contiguous a-slots; b side: scatter-min, then contiguous max
    slot_in_pair = np.arange(len(flat_a), dtype=np.int64) - a_off[
        np.repeat(np.arange(len(vidx)), na_v)
    ]
    a_runstarts = seg_start[np.repeat(np.arange(len(vidx)), na_v)] + slot_in_pair * nb_v[
        np.repeat(np.arange(len(vidx)), na_v)
    ]
    min_a = np.minimum.reduceat(d_combo, a_runstarts)
    min_b = np.full(len(flat_b), np.float32(2.0))
    np.minimum.at(min_b, bi, d_combo)
    worst_a = np.maximum.reduceat(min_a, a_off)
    worst_b = np.maximum.reduceat(min_b, b_off)
    out[vidx] = np.maximum(worst_a, worst_b).astype(np.float32)
    return out


_NUM = re.compile(r"[-+]?\d*\.?\d+")


def price_distance_batch(a: list[str], b: list[str]) -> np.ndarray:
    out = np.zeros(len(a), np.float32)
    for i in range(len(a)):
        ma, mb = _NUM.search(a[i] or ""), _NUM.search(b[i] or "")
        if not ma or not mb:
            out[i] = np.nan
            continue
        try:
            pa_, pb_ = float(ma.group()), float(mb.group())
            if pa_ <= 0 or pb_ <= 0:
                out[i] = np.nan
            else:
                out[i] = abs(math.log10(pa_) - math.log10(pb_))
        except ValueError:
            out[i] = np.nan
    return out


def exact_distance_batch(a: list[str], b: list[str]) -> np.ndarray:
    return np.fromiter((1.0 if x == y else 0.0 for x, y in zip(a, b)), np.float32, len(a))


_DATE_FORMATS = ("%Y-%m-%d", "%d.%m.%Y", "%m/%d/%Y", "%Y/%m/%d", "%d-%m-%Y", "%Y%m%d")


def _parse_date(s: str):
    from datetime import datetime

    s = (s or "").strip()
    for fmt in _DATE_FORMATS:
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            continue
    return None


def datetime_distance_batch(a: list[str], b: list[str]) -> np.ndarray:
    out = np.empty(len(a), np.float32)
    fallback_idx = []
    for i in range(len(a)):
        da, db = _parse_date(a[i]), _parse_date(b[i])
        if da is None or db is None:
            fallback_idx.append(i)
            out[i] = 0.0
        else:
            out[i] = math.log1p(abs((da - db).days))
    if fallback_idx:
        fa = [a[i] for i in fallback_idx]
        fb = [b[i] for i in fallback_idx]
        ag = affine_gap_batch(fa, fb)
        for k, i in enumerate(fallback_idx):
            out[i] = ag[k]
    return out


_TOKEN = re.compile(r"[\w']+")


def tfidf_cosine_batch(a: list[str], b: list[str], idf: dict[str, float], default_idf: float) -> np.ndarray:
    """TF-IDF cosine similarity per pair; idf is a broadcast {token: idf}."""
    out = np.zeros(len(a), np.float32)
    for i in range(len(a)):
        ta = _TOKEN.findall(a[i] or "")
        tb = _TOKEN.findall(b[i] or "")
        if not ta or not tb:
            continue
        wa: dict[str, float] = {}
        for t in ta:
            wa[t] = wa.get(t, 0.0) + 1.0
        wb: dict[str, float] = {}
        for t in tb:
            wb[t] = wb.get(t, 0.0) + 1.0
        num = 0.0
        na = 0.0
        for t, c in wa.items():
            w = c * idf.get(t, default_idf)
            na += w * w
            cb = wb.get(t)
            if cb:
                num += w * cb * idf.get(t, default_idf)
        nb = 0.0
        for t, c in wb.items():
            w = c * idf.get(t, default_idf)
            nb += w * w
        if na > 0 and nb > 0:
            out[i] = num / math.sqrt(na * nb)
    return out


def haversine_batch(a: list[str], b: list[str]) -> np.ndarray:
    """LatLong distance ([lib: dedupe/variables/latlong.py], which uses the
    haversine formula): values are "lat,lon" strings (this engine's cells
    are strings by the preprocess contract); output is great-circle
    distance in units of earth radii (same monotone shape as the
    reference's km — the classifier rescales via its weight). Unparseable
    values yield NaN (masked to 0 + missing indicator upstream)."""

    def parse(vals: list[str]) -> np.ndarray:
        out = np.full((len(vals), 2), np.nan)
        for i, v in enumerate(vals):
            try:
                lat, lon = (v or "").split(",", 1)
                out[i, 0] = float(lat)
                out[i, 1] = float(lon)
            except (ValueError, AttributeError):
                pass
        return np.radians(out)

    pa_ = parse(a)
    pb_ = parse(b)
    dlat = pb_[:, 0] - pa_[:, 0]
    dlon = pb_[:, 1] - pa_[:, 1]
    h = np.sin(dlat / 2) ** 2 + np.cos(pa_[:, 0]) * np.cos(pb_[:, 0]) * np.sin(dlon / 2) ** 2
    return 2 * np.arcsin(np.sqrt(np.clip(h, 0, 1)))


def jaccard_set_batch(a: list[str], b: list[str]) -> np.ndarray:
    """Set similarity ([lib: dedupe/variables/set.py] — the reference uses a
    TF-IDF-weighted set cosine; plain Jaccard over whitespace/comma-split
    elements is the documented unweighted stand-in): |A∩B| / |A∪B| in
    [0, 1], a SIMILARITY (positive classifier weight)."""
    out = np.zeros(len(a), np.float64)
    split = re.compile(r"[,\s]+")
    for i, (x, y) in enumerate(zip(a, b)):
        sx = {t for t in split.split((x or "").strip()) if t}
        sy = {t for t in split.split((y or "").strip()) if t}
        if sx and sy:
            out[i] = len(sx & sy) / len(sx | sy)
    return out


def jaro_winkler_batch(a_strings: list, b_strings: list) -> np.ndarray:
    """Jaro–Winkler similarity per pair, float64 [n] — the DuckDB-variant
    semantics bit-for-bit (verified on 4.5k random probes): boost applied
    only when jaro > 0.7, prefix bonus capped at 4 chars with p = 0.1,
    ANY empty side → 0.0 (including both empty), and the exact IEEE
    chain ``(m/la + m/lb + (m−t)/m) / 3.0`` then ``j + l·0.1·(1−j)``.
    A short-field verification kernel (pairs come from a blocking stage
    — SNM / deletion-neighborhood / prefix-filter); per-pair scan is
    O(len·window) on codepoints."""
    n = len(a_strings)
    out = np.zeros(n, np.float64)
    for i in range(n):
        a, b = a_strings[i] or "", b_strings[i] or ""
        la, lb = len(a), len(b)
        if la == 0 or lb == 0:
            continue
        if a == b:
            out[i] = 1.0
            continue
        window = max(la, lb) // 2 - 1
        if window < 0:
            window = 0
        ma = [False] * la
        mb = [False] * lb
        m = 0
        for x in range(la):
            lo, hi = max(0, x - window), min(lb, x + window + 1)
            ax = a[x]
            for y in range(lo, hi):
                if not mb[y] and ax == b[y]:
                    ma[x] = mb[y] = True
                    m += 1
                    break
        if m == 0:
            continue
        t = 0
        k = 0
        for x in range(la):
            if ma[x]:
                while not mb[k]:
                    k += 1
                if a[x] != b[k]:
                    t += 1
                k += 1
        t //= 2
        j = (m / la + m / lb + (m - t) / m) / 3.0
        if j > 0.7:
            l = 0
            for x, y in zip(a[:4], b[:4]):
                if x != y:
                    break
                l += 1
            j = j + l * 0.1 * (1 - j)
        out[i] = j
    return out


def jaro_batch(a: "list[str]", b: "list[str]") -> "np.ndarray":
    """Jaro similarity per pair (Jaro 1989) — the record-linkage
    matching-window metric: m matching chars within a
    ``max(l1,l2)//2−1`` window, t = half the out-of-order matches,

        jaro = (m/l1 + m/l2 + (m−t)/m) / 3       (0.0 when m == 0 or
                                                  either string is empty)

    Written as EXACTLY that IEEE expression, in that association — the
    values are bit-identical to DuckDB's ``jaro_similarity`` (verified
    on 3k fuzzed pairs incl. empty/degenerate cases), so a SQL oracle
    can compare raw doubles. Scalar per pair by design: the greedy
    bounded-window matching is data-dependent (not numpy-friendly) and
    linkage strings are short — this is a feature kernel, not a corpus
    scan."""
    out = np.empty(len(a), np.float64)
    for i, (s1, s2) in enumerate(zip(a, b)):
        out[i] = _jaro_scalar(s1 or "", s2 or "")
    return out


def _jaro_scalar(s1: str, s2: str) -> float:
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    bound = max(l1, l2) // 2 - 1
    if bound < 0:
        bound = 0
    m2 = [False] * l2
    m1 = [False] * l1
    m = 0
    for i in range(l1):
        lo = i - bound if i > bound else 0
        hi = i + bound + 1
        if hi > l2:
            hi = l2
        c = s1[i]
        for j in range(lo, hi):
            if not m2[j] and c == s2[j]:
                m1[i] = True
                m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (m / l1 + m / l2 + (m - t) / m) / 3


def jaro_winkler_batch(
    a: "list[str]",
    b: "list[str]",
    prefix_weight: float = 0.1,
    boost_threshold: float = 0.7,
) -> "np.ndarray":
    """Jaro–Winkler per pair (Winkler 1990): the Jaro similarity
    boosted by the shared prefix (≤ 4 chars) when jaro > 0.7 —

        jw = jaro + l · 0.1 · (1 − jaro)

    in exactly that IEEE association; bit-identical to DuckDB's
    ``jaro_winkler_similarity`` (same 3k-pair verification as
    :func:`jaro_batch`), so pair outputs oracle as raw doubles. The
    de-facto default name comparator of production linkage systems
    (Splink, Febrl)."""
    out = np.empty(len(a), np.float64)
    for i, (s1, s2) in enumerate(zip(a, b)):
        s1 = s1 or ""
        s2 = s2 or ""
        j = _jaro_scalar(s1, s2)
        if j > boost_threshold:
            l = 0
            for x, y in zip(s1[:4], s2[:4]):
                if x != y:
                    break
                l += 1
            j = j + l * prefix_weight * (1 - j)
        out[i] = j
    return out
