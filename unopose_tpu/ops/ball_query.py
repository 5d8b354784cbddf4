"""Ball query + grouping for TPU (pure XLA).

Replaces the reference CUDA kernels
(_ext_src/src/ball_query_gpu.cu:14-49, group_points_gpu.cu) with a masked
top-k formulation. Reference semantics, reproduced exactly:

  for each query center, scan source points in index order and keep the
  first <= nsample indices with squared distance < radius^2; the remaining
  slots are padded with the FIRST in-radius index; centers with no in-radius
  point keep index 0.

We encode "in-radius, ascending index" as a monotone key and use lax.top_k;
positions returned by top_k are exactly the sorted original indices.
Grouping is a batched take_along_axis (scatter-add VJP for free).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from unopose_tpu.ops.geometry import pairwise_sqdist


def _first_k_in_radius(mask: jnp.ndarray, nsample: int) -> jnp.ndarray:
    """First-``nsample`` True positions per row of (..., N) mask, in index
    order, padded with the first True position (0 for all-False rows).

    Encodes (in-radius, index) into a SINGLE sortable int — in-radius points
    get (2N - i), the rest (N - i) — sorts values only (a single-array sort;
    a key+index lax.top_k sorts twice the data), and decodes indices from
    the sorted values. No gather, no argsort."""
    N = mask.shape[-1]
    iota = jnp.arange(N, dtype=jnp.int32)
    key = jnp.where(mask, 2 * N - iota, N - iota)
    # keys are unique, so an unstable single-operand sort suffices (a stable
    # jnp.sort pairs the operand with an iota and sorts twice the data)
    top = jax.lax.sort(-key, dimension=-1, is_stable=False)[..., :nsample]
    top = -top  # descending, first nsample
    idx = jnp.where(top > N, 2 * N - top, N - top)
    cnt = jnp.sum(mask, axis=-1, dtype=jnp.int32)[..., None]
    slot = jnp.arange(nsample, dtype=jnp.int32)
    first = jnp.where(cnt > 0, idx[..., :1], 0)
    return jnp.where(slot < cnt, idx, first).astype(jnp.int32)


def ball_query(
    radius: float, nsample: int, xyz: jnp.ndarray, new_xyz: jnp.ndarray, exact: bool = True
) -> jnp.ndarray:
    """Args:
        radius: ball radius.
        nsample: max neighbors per ball.
        xyz: (B, N, 3) source points.
        new_xyz: (B, P, 3) query centers.
    Returns:
        (B, P, nsample) int32 neighbor indices — first <= nsample in-radius
        points in index order, padded with the first (CUDA reference
        semantics, ball_query_gpu.cu:14-49).
    """
    del exact  # the encoded single-array sort is exact and the fast path
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)
    d2 = pairwise_sqdist(new_xyz, xyz)  # (B, P, N)
    return _first_k_in_radius(d2 < radius * radius, nsample)


def group_points(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather (B, N, C) features at (B, P, S) indices -> (B, P, S, C).

    Uses the flattened single-axis gather (see ops/fps.gather_points) —
    ~10x faster on TPU than a batched take_along_axis."""
    from unopose_tpu.ops.fps import gather_points

    return gather_points(features, idx)


def two_scale_group(
    r1: float,
    k1: int,
    r2: float,
    k2: int,
    pts: jnp.ndarray,
):
    """Grouped absolute neighbor coordinates for two nested ball scales
    around every point of the cloud itself (the fine PE pattern,
    reference oneref_predator_fine_point_matching.py:159-178 with
    new_xyz == xyz). Requires r1 < r2, k1 <= k2.

    The expensive parts are shared: ONE (B, N, N) distance matrix and ONE
    N-wide sort (scale 2); scale 1 is selected from scale 2's slots with a
    cheap k2-wide sort. Deviation from running two independent ball queries:
    scale 1 candidates are limited to scale 2's first-k2 in-radius set — they
    can only differ when a ball holds more than k2 closer-indexed r2
    neighbors before the k1-th r1 neighbor, and the neighborhood feeds
    BN + max-pool downstream.

    Returns (grouped1 (B,N,k1,3), grouped2 (B,N,k2,3)).
    """
    pts = pts.astype(jnp.float32)
    B, N, _ = pts.shape
    d2 = pairwise_sqdist(pts, pts)
    idx2 = _first_k_in_radius(d2 < r2 * r2, k2)  # (B, N, k2)
    grouped2 = group_points(pts, idx2)  # (B, N, k2, 3)

    rel2 = grouped2 - pts[:, :, None, :]
    d2_sel = jnp.sum(rel2 * rel2, axis=-1)  # (B, N, k2)
    # slot validity: padded slots duplicate the first index; they are
    # in-radius for r2 but must not seed extra scale-1 candidates beyond the
    # true ones — duplicates of an in-radius first point are harmless for
    # the max-pool, so keep the plain radius test.
    idx1_slots = _first_k_in_radius(d2_sel < r1 * r1, k1)  # (B, N, k1) slots into k2
    grouped1 = group_points(grouped2.reshape(B * N, k2, 3), idx1_slots.reshape(B * N, k1)).reshape(B, N, k1, 3)
    return grouped1, grouped2


def two_scale_group_planar(
    r1: float,
    k1: int,
    r2: float,
    k2: int,
    pts: jnp.ndarray,
):
    """Channel-planar variant of ``two_scale_group``: returns the grouped
    neighbor coordinates as separate x/y/z arrays of shape (B, N, k) so the
    downstream LRF / MLP math keeps (points, samples) in the TPU-tiled minor
    dims (a trailing width-3 axis wastes ~98% of each (8, 128) tile).

    Returns ((g1x, g1y, g1z), (g2x, g2y, g2z)).

    Gathers run in (rows, 3) tensor form (a width-1 planar gather is 3x the
    row fetches) and are split into planes with ONE minor->major transpose
    each (3 strided minor-dim slices cost ~3x more).
    """
    from unopose_tpu.ops.fps import gather_points

    pts = pts.astype(jnp.float32)
    B, N, _ = pts.shape
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    d2 = pairwise_sqdist(pts, pts)
    idx2 = _first_k_in_radius(d2 < r2 * r2, k2)  # (B, N, k2)
    g2t = gather_points(pts, idx2)  # (B, N, k2, 3)
    g2p = jnp.moveaxis(g2t, 3, 1)  # (B, 3, N, k2): one transposing copy
    g2 = (g2p[:, 0], g2p[:, 1], g2p[:, 2])

    d2_sel = (g2[0] - x[..., None]) ** 2 + (g2[1] - y[..., None]) ** 2 + (g2[2] - z[..., None]) ** 2
    idx1 = _first_k_in_radius(d2_sel < r1 * r1, k1)  # (B, N, k1) slots into k2
    g1t = gather_points(g2t.reshape(B * N, k2, 3), idx1.reshape(B * N, k1)).reshape(B, N, k1, 3)
    g1p = jnp.moveaxis(g1t, 3, 1)
    return (g1p[:, 0], g1p[:, 1], g1p[:, 2]), g2


def two_scale_group_exact_planar(r1: float, k1: int, r2: float, k2: int, pts: jnp.ndarray):
    """EXACT reference fine-PE grouping: two independent ball queries of the
    cloud around its own points (oneref_predator_fine_point_matching.py:159-178
    runs group1(r1, k1) and group2(r2, k2) separately), first-k-in-index-order
    slots padded with the first in-radius point — duplicates and all. One
    (B, N, N) distance matrix is shared between the scales.

    Used for reference-checkpoint parity (pe_neighbor_mode='first_k'); the
    production path is the masked single-group ``ball_group_planar``.

    Returns ((g1x, g1y, g1z) each (B, N, k1), (g2x, g2y, g2z) each (B, N, k2)).
    """
    from unopose_tpu.ops.gather_pallas import gather_planar

    pts = pts.astype(jnp.float32)
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    d2 = pairwise_sqdist(pts, pts)
    idx1 = _first_k_in_radius(d2 < r1 * r1, k1)
    idx2 = _first_k_in_radius(d2 < r2 * r2, k2)
    return gather_planar(x, y, z, idx1), gather_planar(x, y, z, idx2)


def _first_k_keys_pallas(
    r1: float,
    r2: float,
    pts: jnp.ndarray,
    pts_p: jnp.ndarray,
    perm: jnp.ndarray,
    chunks: int,
    rows: int = 256,
    interpret: bool = False,
    compact: int = 0,
    global_compact: bool = False,
    mask8: bool = False,
):
    """Fused production of the chunked first_k sort keys + counts in VMEM.
    ``mask8`` (raw mode only): emit 2-bit membership masks as int8
    (m2 | m1 << 1) instead of the full int16 sort-key encoding — half the
    HBM hop for the split compaction pipeline, which only needs the bits.

    The XLA formulation of ``two_scale_group_first_k_fast`` materializes the
    (B, N, N) distance matrix in HBM (268 MB at the operating point) and
    re-reads it for the two radius masks, the per-chunk counts, the
    first-hit index mins and the key build (~5-7 ms of pure HBM traffic).
    This kernel streams (rows, W) distance blocks through VMEM and writes
    only the compact products:

      key   (B, C, N, W) int16 — the 3-level encoded sort key (same encoding
             as the XLA path: miss / r2-hit / r1-hit, index-descending);
             CHUNK-major so every store is a natural (rows, W) tile — the
             (B, N, C, W) layout scattered each store across the C sublane
             dim and ran 7x slower
      ccnt  (B, N, C) int32    — per-chunk r2 hit counts
      aux   (B, N, 4) int32    — [cnt1, first2_orig, enc1, 0] where enc1 =
             first1_orig * 4096 + first1_permuted_pos (min over r1 hits of
             the original index, with the permuted position riding along —
             ties impossible since original indices are unique)

    d2 uses the expansion form x2 - 2 x.y + y2 like ops.geometry.
    pairwise_sqdist, with the cross term as a manual bf16x3 3-pass dot
    (x = xh + xl, xl <= 2^-9 |x|; xy = xh.yh + xh.yl + xl.yh — Mosaic has
    no Precision.HIGH). Rationale: on TPU nothing external needs this d2
    bitwise — the CPU parity tests run interpret mode (which uses an exact
    fp32 dot, see below) and the overflow fallback recomputes its own
    masks — so internal consistency (m1/m2/counts from ONE d2 pass)
    suffices. The missing xl.yl term is ~2^-18 relative: on LRF-normalized
    clouds (|p| <= ~1.2, r1 >= 0.1) it only flips hits within a ~1e-4
    relative band of the ball boundary — the 104-pair converted-weight
    study (benchmarks/SUBSET_STUDY.md) gates that this has zero pose
    effect. HIGHEST (6-pass) cost ~2x the kernel MXU time. (A DEFAULT
    bf16 cross term is NOT safe: catastrophic cancellation, see
    ops/geometry.py.)
    """
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, _ = pts.shape
    C = chunks
    W = N // C
    assert N % C == 0 and N % rows == 0 and N <= 4096, (N, C, rows)

    cand = jnp.moveaxis(pts_p, 1, 2)  # (B, 3, N) planar candidates
    permv = perm.reshape(C, W).astype(jnp.int32)
    # centers as (B, N, 1) planar columns: a (rows, 3) block would put the
    # 3-vector in the lane dim and every broadcast through a relayout
    cx = pts[..., 0][..., None]
    cy = pts[..., 1][..., None]
    cz = pts[..., 2][..., None]

    def kernel(cx_ref, cy_ref, cz_ref, cpts_ref, cand_ref, permv_ref, *refs):
        if global_compact:
            lt_ref, ltg_ref, key_ref, ccnt_ref, aux_ref = refs
        elif compact:
            lt_ref, key_ref, ccnt_ref, aux_ref = refs
        else:
            key_ref, ccnt_ref, aux_ref = refs
        payloads = []  # global_compact: per-chunk compacted payload columns
        x = cx_ref[0]  # (rows, 1)
        y = cy_ref[0]
        z = cz_ref[0]
        cpts = cpts_ref[0]  # (rows, 3) for the MXU cross term
        # manual bf16x3 split of the centers (Mosaic has no Precision.HIGH):
        # x = xh + xl with xl <= 2^-9 |x|, so the 3-dot cross term's missing
        # xl*yl part is ~2^-18 relative — fp32-grade (see docstring)
        cpts_h = cpts.astype(jnp.bfloat16)
        cpts_l = (cpts - cpts_h.astype(jnp.float32)).astype(jnp.bfloat16)
        cn = (x * x + y * y) + z * z  # (rows, 1)
        r1sq = r1 * r1
        r2sq = r2 * r2
        wiota = jax.lax.broadcasted_iota(jnp.int32, (rows, W), 1)
        big = jnp.int32(N)
        big_enc = jnp.int32(N * 4096)
        first2 = jnp.full((rows, 1), N, jnp.int32)
        enc1 = jnp.full((rows, 1), N * 4096, jnp.int32)
        cnt1 = jnp.zeros((rows, 1), jnp.int32)
        ccols = []
        for c in range(C):
            px = cand_ref[0, 0:1, c * W : (c + 1) * W]  # (1, W)
            py = cand_ref[0, 1:2, c * W : (c + 1) * W]
            pz = cand_ref[0, 2:3, c * W : (c + 1) * W]
            pn = (px * px + py * py) + pz * pz  # (1, W)
            cnd = cand_ref[0, :, c * W : (c + 1) * W]  # (3, W) fp32
            dotg = lambda a, b, prec: jax.lax.dot_general(
                a, b,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            if interpret:
                # CPU tests: exact fp32 dot, bitwise-matching the XLA path
                xy = dotg(cpts, cnd, jax.lax.Precision.HIGHEST)
            else:
                # 3-pass bf16x3 cross term (error ~2^-18 rel; see docstring).
                # DEFAULT precision on bf16 operands = native bf16 MXU pass
                # with fp32 accumulate (Mosaic rejects HIGHEST on bf16 lhs).
                cnd_h = cnd.astype(jnp.bfloat16)
                cnd_l = (cnd - cnd_h.astype(jnp.float32)).astype(jnp.bfloat16)
                prec = jax.lax.Precision.DEFAULT
                xy = dotg(cpts_h, cnd_h, prec) + (
                    dotg(cpts_h, cnd_l, prec) + dotg(cpts_l, cnd_h, prec)
                )
            d2 = (cn - 2.0 * xy) + pn
            m2 = d2 < r2sq
            m1 = d2 < r1sq
            if compact:
                # in-kernel hit compaction (replaces the XLA budget sort,
                # ~9 ms/batch): rank hits by a ONE-PASS bf16 matmul against
                # the lower-triangular ones matrix (0/1 operands + fp32
                # accumulate = exact counts <= W), then stream-compact them
                # to the leftmost lanes with 9 LSB-first binary shift
                # rounds. Collision-freeness: an incoming element (bit j of
                # its residual distance set, distances already multiples of
                # 2^j) can only land on a lane whose resident also leaves
                # or which is empty — resident staying would force the two
                # ranks 2^(j+1) apart, more than the 2^j lanes between them
                # can hold.
                rank = jax.lax.dot_general(
                    m2.astype(jnp.bfloat16),
                    lt_ref[...],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)  # inclusive hit count up to each lane
                keep = m2 & (rank <= compact)
                # one combined int32 per lane: payload (pos*4|m1*2|valid)
                # in the high bits, residual leftward distance in the low
                # dbits (decrementing the word by s decrements exactly the
                # dist bits: moving elements always have dist >= s)
                dbits = (W - 1).bit_length()
                work = jnp.where(
                    keep,
                    ((((c * W + wiota) << 2) | (m1.astype(jnp.int32) << 1) | 1) << dbits)
                    | (wiota - (rank - 1)),
                    0,
                )
                s = 1
                while s < W:
                    # left-shift by s == circular roll by W - s (pltpu.roll
                    # requires non-negative shifts); wrapped lanes masked below
                    w_in = pltpu.roll(work, W - s, axis=1)
                    move_in = ((w_in & s) != 0) & (wiota < W - s)
                    stay = (work & s) == 0  # empties (0) "stay" as empties
                    work = jnp.where(move_in, w_in - s, jnp.where(stay, work, 0))
                    s *= 2
                if global_compact:
                    payloads.append(work[:, :compact] >> dbits)
                else:
                    key_ref[0, c] = (work[:, :compact] >> dbits).astype(jnp.int16)
            elif mask8:
                key_ref[0, c] = (
                    m2.astype(jnp.int32) + 2 * m1.astype(jnp.int32)
                ).astype(jnp.int8)
            else:
                key = W - wiota + jnp.where(m2, 2 * W, 0) + jnp.where(m1, 4 * W, 0)
                key_ref[0, c] = key.astype(jnp.int16)
            ccols.append(jnp.sum(m2.astype(jnp.int32), axis=1, keepdims=True))
            pv = permv_ref[c : c + 1, :]  # (1, W)
            pv_enc = pv * 4096 + (c * W + wiota)  # (rows, W) orig*4096 + permpos
            first2 = jnp.minimum(first2, jnp.min(jnp.where(m2, pv, big), axis=1, keepdims=True))
            enc1 = jnp.minimum(enc1, jnp.min(jnp.where(m1, pv_enc, big_enc), axis=1, keepdims=True))
            cnt1 = cnt1 + jnp.sum(m1.astype(jnp.int32), axis=1, keepdims=True)
        if global_compact:
            # second-stage GLOBAL compaction across chunks: the decorrelating
            # permutation spreads every neighborhood's hits ~uniformly over
            # the C chunk groups, so the chunked layout leaves each group
            # half-empty. One more stable rank+shift pass (k2 lanes, same
            # construction as the per-chunk one) packs all valid hits to the
            # leftmost slots — a prerequisite for the PE kernel's per-block
            # half-budget fast path (ops/pe_fused.py).
            k2 = C * compact
            pay = jnp.concatenate(payloads, axis=1)  # (rows, k2) int32
            valid = (pay & 1) == 1
            grank = jax.lax.dot_general(
                valid.astype(jnp.bfloat16),
                ltg_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)  # inclusive valid count up to each lane (<= k2, exact)
            giota = jax.lax.broadcasted_iota(jnp.int32, (rows, k2), 1)
            gbits = (k2 - 1).bit_length()
            gwork = jnp.where(valid, (pay << gbits) | (giota - (grank - 1)), 0)
            s = 1
            while s < k2:
                w_in = pltpu.roll(gwork, k2 - s, axis=1)
                move_in = ((w_in & s) != 0) & (giota < k2 - s)
                stay = (gwork & s) == 0
                gwork = jnp.where(move_in, w_in - s, jnp.where(stay, gwork, 0))
                s *= 2
            key_ref[0] = (gwork >> gbits).astype(jnp.int16)
        ccnt_ref[0] = jnp.concatenate(ccols, axis=1)
        aux_ref[0] = jnp.concatenate([cnt1, first2, enc1, jnp.zeros((rows, 1), jnp.int32)], axis=1)

    grid = (B, N // rows)
    cspec = lambda: pl.BlockSpec((1, rows, 1), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM)
    in_specs = [
        cspec(),
        cspec(),
        cspec(),
        pl.BlockSpec((1, rows, 3), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, N), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((C, W), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    inputs = [cx, cy, cz, pts, cand, permv]
    if compact:
        # lower-triangular ones (w' <= w) for the one-pass bf16 rank matmul
        lt = jnp.asarray(np.tril(np.ones((W, W), np.float32)).T, jnp.bfloat16)
        in_specs.append(pl.BlockSpec((W, W), lambda b, j: (0, 0), memory_space=pltpu.VMEM))
        inputs.append(lt)
        if global_compact:
            k2 = C * compact
            ltg = jnp.asarray(np.tril(np.ones((k2, k2), np.float32)).T, jnp.bfloat16)
            in_specs.append(pl.BlockSpec((k2, k2), lambda b, j: (0, 0), memory_space=pltpu.VMEM))
            inputs.append(ltg)
            key_spec = pl.BlockSpec((1, rows, k2), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM)
            key_shape = jax.ShapeDtypeStruct((B, N, k2), jnp.int16)
        else:
            key_spec = pl.BlockSpec((1, C, rows, compact), lambda b, j: (b, 0, j, 0), memory_space=pltpu.VMEM)
            # int16 payload (pos*4|m1*2|valid <= 4N-1 <= 16383): halves the
            # select tensor's HBM round trip on the bandwidth-bound chip
            key_shape = jax.ShapeDtypeStruct((B, C, N, compact), jnp.int16)
    else:
        key_spec = pl.BlockSpec((1, C, rows, W), lambda b, j: (b, 0, j, 0), memory_space=pltpu.VMEM)
        key_shape = jax.ShapeDtypeStruct((B, C, N, W), jnp.int8 if mask8 else jnp.int16)
    outs = pl.pallas_call(
        functools.partial(kernel),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            key_spec,
            pl.BlockSpec((1, rows, C), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 4), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            key_shape,
            jax.ShapeDtypeStruct((B, N, C), jnp.int32),
            jax.ShapeDtypeStruct((B, N, 4), jnp.int32),
        ),
        interpret=interpret,
    )(*inputs)
    return outs


def _compact_stage_pallas(
    raw_keys: jnp.ndarray,  # (B, C, N, W) int16: key = W - w + 2W*m2 + 4W*m1
    compact: int,
    rows: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Stage 2 of the SPLIT keys pipeline: decode the raw 3-level keys ->
    per-chunk rank + budget filter -> stream compaction -> global
    compaction. Outputs are bitwise-identical to the single-kernel compact
    path (same rank matmuls, same shift rounds, same payload encoding).

    Why a split: in the fused kernel the compaction measured ~5.5 ms while
    the SAME shift rounds cost ~1 ms in isolation
    (benchmarks/profile_compact_micro.py) — the d2/mask pipeline and the
    serial shift chains de-optimize each other when Mosaic schedules them
    in one kernel, the same in-context pathology the PE-v5 split fixed.
    The hop costs one (B, C, N, W) int16 round trip (~268 MB/batch).
    Returns sel (B, N, k2) int16 (payload pos*4 | m1*2 | valid, hits
    leftmost).
    """
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, C, N, W = raw_keys.shape
    k2 = C * compact
    assert N % rows == 0
    is_mask8 = raw_keys.dtype == jnp.int8

    def kernel(raw_ref, lt_ref, ltg_ref, key_ref):
        wiota = jax.lax.broadcasted_iota(jnp.int32, (rows, W), 1)
        payloads = []
        for c in range(C):
            key = raw_ref[0, c].astype(jnp.int32)  # (rows, W); item at its lane
            if is_mask8:
                m1 = key >= 2
                m2 = (key - 2 * m1.astype(jnp.int32)) == 1
                m2 = m2 | m1
            else:
                m2 = key > 2 * W
                m1 = key > 4 * W
            rank = jax.lax.dot_general(
                m2.astype(jnp.bfloat16),
                lt_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            keep = m2 & (rank <= compact)
            dbits = (W - 1).bit_length()
            work = jnp.where(
                keep,
                ((((c * W + wiota) << 2) | (m1.astype(jnp.int32) << 1) | 1) << dbits)
                | (wiota - (rank - 1)),
                0,
            )
            s = 1
            while s < W:
                w_in = pltpu.roll(work, W - s, axis=1)
                move_in = ((w_in & s) != 0) & (wiota < W - s)
                stay = (work & s) == 0
                work = jnp.where(move_in, w_in - s, jnp.where(stay, work, 0))
                s *= 2
            payloads.append(work[:, :compact] >> dbits)
        pay = jnp.concatenate(payloads, axis=1)  # (rows, k2)
        valid = (pay & 1) == 1
        grank = jax.lax.dot_general(
            valid.astype(jnp.bfloat16),
            ltg_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        giota = jax.lax.broadcasted_iota(jnp.int32, (rows, k2), 1)
        gbits = (k2 - 1).bit_length()
        gwork = jnp.where(valid, (pay << gbits) | (giota - (grank - 1)), 0)
        s = 1
        while s < k2:
            w_in = pltpu.roll(gwork, k2 - s, axis=1)
            move_in = ((w_in & s) != 0) & (giota < k2 - s)
            stay = (gwork & s) == 0
            gwork = jnp.where(move_in, w_in - s, jnp.where(stay, gwork, 0))
            s *= 2
        key_ref[0] = (gwork >> gbits).astype(jnp.int16)

    lt = jnp.asarray(np.tril(np.ones((W, W), np.float32)).T, jnp.bfloat16)
    ltg = jnp.asarray(np.tril(np.ones((k2, k2), np.float32)).T, jnp.bfloat16)
    return pl.pallas_call(
        kernel,
        grid=(B, N // rows),
        in_specs=[
            pl.BlockSpec((1, C, rows, W), lambda b, j: (b, 0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, W), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k2, k2), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, k2), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, k2), jnp.int16),
        interpret=interpret,
    )(raw_keys, lt, ltg)


def _first_k_budget_select(
    r1: float,
    k1: int,
    r2: float,
    k2: int,
    pts: jnp.ndarray,
    chunks: int,
    fused_keys: bool | None,
    interpret: bool,
    global_compact: bool = False,
    materialize: bool = True,
):
    """Shared keys -> budget sort -> decode -> pad fill -> g2 gather of the
    sort-free first_k groupings. Returns a dict with the scale-2 grouping and
    everything the scale-1 consumers (materialized or packed) need.
    ``materialize=False`` skips the g2 gather (dict carries ``g2=None``) for
    consumers that gather in their own kernel.

    ``global_compact``: compact all valid hits to the leftmost slots across
    chunk groups (stable, so both backends produce the same slot order) and
    return per-point totals — the packed PE kernel's half-budget fast path
    needs every hit in the first half."""
    from unopose_tpu.ops.gather_pallas import gather_planar

    pts = pts.astype(jnp.float32)
    B, N, _ = pts.shape
    C = chunks
    W = N // C
    budget = k2 // C
    assert N % C == 0 and k2 % C == 0 and r1 < r2 and k1 <= k2 and N <= 4096, (N, C, k2, r1, r2)
    assert budget <= W, f"chunked budget select needs N >= k2 (N={N}, k2={k2})"

    # same fixed decorrelating permutation as the subset kernels
    perm_np = np.random.default_rng(20240613).permutation(N).astype(np.int32)
    inv_perm_np = np.empty_like(perm_np)
    inv_perm_np[perm_np] = np.arange(N, dtype=np.int32)
    perm = jnp.asarray(perm_np)
    inv_perm = jnp.asarray(inv_perm_np)

    pts_p = jnp.take(pts, perm, axis=1)
    xp, yp, zp = pts_p[..., 0], pts_p[..., 1], pts_p[..., 2]

    if fused_keys is None:
        fused_keys = jax.devices()[0].platform == "tpu" and N % 256 == 0

    if fused_keys:
        # VMEM key production: neither the (B, N, N) distance matrix nor
        # the sort keys ever touch HBM for the sort, and the XLA budget
        # sort (~9 ms/batch) disappears (see _first_k_keys_pallas).
        # The GLOBAL-compact path runs SPLIT by default: raw keys kernel ->
        # HBM hop -> dedicated compaction kernel — the fused form's d2/mask
        # pipeline and the serial shift chains de-optimize each other in
        # one kernel (compaction measured ~5.5 ms fused vs ~1 ms isolated,
        # benchmarks/profile_compact_micro.py; the same in-context pathology
        # the PE-v5 split fixed). UNOPOSE_KEYS_SPLIT=0 restores the fused
        # single-kernel form.
        import os as _os

        use_split = (
            global_compact and _os.environ.get("UNOPOSE_KEYS_SPLIT", "1") == "1"
        )
        if use_split:
            raw, ccnt, aux = _first_k_keys_pallas(
                r1, r2, pts, pts_p, perm, C, interpret=interpret, compact=0,
                global_compact=False, mask8=True,
            )
            sel = _compact_stage_pallas(raw, budget, interpret=interpret)
        else:
            sel, ccnt, aux = _first_k_keys_pallas(
                r1, r2, pts, pts_p, perm, C, interpret=interpret, compact=budget,
                global_compact=global_compact,
            )
        total2 = jnp.sum(ccnt, axis=-1)  # (B, N)
        cnt1 = aux[..., 0]
        first2_orig = aux[..., 1]
        enc1 = aux[..., 2]
        if global_compact:
            validslot = (sel & 1) == 1  # already (B, N, k2), hits leftmost
            m1slot = (sel & 2) != 0
            idx_p = sel >> 2  # int16: N <= 4096
        else:
            sel = jnp.moveaxis(sel, 1, 2)  # (B, N, C, budget) int16
            validslot = (sel & 1) == 1
            m1slot = (sel & 2) != 0
            idx_p = (sel >> 2).reshape(B, N, k2)  # int16: N <= 4096
            validslot = validslot.reshape(B, N, k2)
            m1slot = m1slot.reshape(B, N, k2)
    else:
        d2 = pairwise_sqdist(pts, pts_p)  # (B, P, N) columns in permuted order
        mask2 = d2 < r2 * r2
        mask1f = d2 < r1 * r1  # full scale-1 mask — shares the d2 pass

        mv = mask2.reshape(B, N, C, W)
        ccnt = jnp.sum(mv, axis=-1, dtype=jnp.int32)  # (B, N, C)
        total2 = jnp.sum(ccnt, axis=-1)  # (B, N)
        cnt1 = jnp.sum(mask1f, axis=-1, dtype=jnp.int32)  # (B, N)

        # first hit by ORIGINAL index per scale: masked min against the constant
        # permutation table (fuses into the mask pass; no gathers). Scale 1
        # carries the permuted position in the low bits (enc = orig*4096 + pos)
        permb = perm[None, None, :]
        posb = jnp.arange(N, dtype=jnp.int32)[None, None, :]
        first2_orig = jnp.min(jnp.where(mask2, permb, N), axis=-1)  # (B, N)
        enc1 = jnp.min(jnp.where(mask1f, permb * 4096 + posb, N * 4096), axis=-1)

        # per-chunk first-``budget`` hits via a narrow encoded sort. The key
        # carries a 3-level code — r1-hit (also r2) / r2-only / miss — so the
        # scale-1 membership bit (computed from the SAME expansion-based d2 as
        # the reference sort path; recomputing from gathered coords can flip
        # boundary-distance hits) rides along for free. Slot order within a
        # chunk is (level, permuted-index) — immaterial for the set.
        m1v = mask1f.reshape(B, N, C, W)
        wiota = jnp.arange(W, dtype=jnp.int32)[None, None, None, :]
        key = (
            W - wiota + jnp.where(mv, 2 * W, 0) + jnp.where(m1v, 4 * W, 0)
        ).astype(jnp.int16)  # max 7W = 3584, int16-safe
        top = -jax.lax.sort(-key, dimension=-1, is_stable=False)[..., :budget].astype(jnp.int32)
        m1slot = top > 4 * W  # (B, N, C, budget)
        validslot = top > 2 * W
        w = W - (top - jnp.where(validslot, 2 * W, 0) - jnp.where(m1slot, 4 * W, 0))
        idx_p = (jnp.arange(C, dtype=jnp.int32)[None, None, :, None] * W + w).reshape(B, N, k2)
        validslot = validslot.reshape(B, N, k2)
        m1slot = m1slot.reshape(B, N, k2)
        if global_compact:
            # stable left-compaction of valid slots (XLA mirror of the
            # kernel's rank+shift pass — same order, testable in interpret)
            order = jnp.argsort(~validslot, axis=-1, stable=True)
            idx_p = jnp.take_along_axis(idx_p, order, axis=-1)
            m1slot = jnp.take_along_axis(m1slot, order, axis=-1)
            validslot = jnp.take_along_axis(validslot, order, axis=-1)

    # pad with the first-by-original-index hit (CUDA reference padding);
    # zero-hit rows keep original point 0
    q_first = jnp.take(inv_perm, jnp.where(total2 > 0, first2_orig, 0), axis=0)  # (B, N)
    idx_p = jnp.where(validslot, idx_p, q_first[..., None].astype(idx_p.dtype))

    g2 = gather_planar(xp, yp, zp, idx_p) if materialize else None  # three (B, N, k2)

    overflow = jnp.any(ccnt > budget) | jnp.any(total2 > k2) | jnp.any(cnt1 > k1)
    return dict(
        g2=g2,
        idx_p=idx_p,
        validslot=validslot,
        m1slot=m1slot,
        cnt1=cnt1,
        enc1=enc1,
        total2=total2,
        q_first=q_first,
        overflow=overflow,
        xp=xp,
        yp=yp,
        zp=zp,
        inv_perm=inv_perm,
    )


def two_scale_group_first_k_packed(
    r1: float,
    k1: int,
    r2: float,
    k2: int,
    pts: jnp.ndarray,
    chunks: int = 4,
    fused_keys: bool | None = None,
    interpret: bool = False,
):
    """Packed EXACT first_k grouping: scale 2's compacted slots plus scale-1
    MULTISET WEIGHTS — no separate scale-1 materialization or k2-wide sort.

    Reference semantics (ball_query_gpu.cu:14-49): each scale keeps the first
    <= k in-radius points by original index, padding empty slots with the
    first hit. The PE consumer (per-neighborhood LRF moments/votes + shared
    MLP max-pool) is slot-order-invariant, so each scale is fully determined
    by its neighbor MULTISET:

      scale 2: {r2 hits} + (k2 - cnt2) x first2    -> materialized (pad fill)
      scale 1: {r1 hits} + (k1 - cnt1) x first1    -> r1 hits are a subset of
               scale 2's slots (r1 < r2, no overflow), so express it as
               per-slot weights on scale 2's gather:
               w1 = m1 + (slot == first1) * (k1 - cnt1)

    The self point is always an r1 hit (d2 = 0), so cnt1 >= 1 and the
    zero-hit pad rule never fires. Slots are GLOBALLY COMPACTED (all hits
    leftmost, pads after) so a consumer whose neighborhoods all fit in
    k2/2 hits can process half the slots (ops/pe_fused.py fast path).

    Returns (g2 (3 x (B, N, k2) pad-filled planes),
             w1 (B, N, k2) bf16 scale-1 multiset weights,
             w2 (B, N, k2) bf16 scale-2 multiset weights — 1 per hit plus
                the (k2 - total2) pad mass as a bump on the scan-first hit's
                slot, so weighted moment sums over ANY prefix containing all
                hits equal the reference's sums over all k2 pad-filled slots,
             total2 (B, N) int32 r2 hit counts,
             overflow bool).
    On overflow (chunk budget exceeded / total2 > k2 / cnt1 > k1) THE FAST
    OUTPUTS ARE INVALID — the caller must branch to
    two_scale_group_exact_planar-based computation (a grouping-level
    fallback cannot express scale 1's independent truncation, which may
    select r1 hits outside scale 2's kept slots).
    """
    sel = _first_k_budget_select(
        r1, k1, r2, k2, pts, chunks, fused_keys, interpret, global_compact=True
    )
    w1, w2 = _packed_multiset_weights(sel, k1, k2)
    return sel["g2"], w1, w2, sel["total2"], sel["overflow"]


def _packed_multiset_weights(sel, k1: int, k2: int):
    """Per-slot multiset weights for both scales on the compacted slots."""
    first1_pp = sel["enc1"] & 4095  # permuted position of the scan-first r1 hit
    npads1 = (k1 - sel["cnt1"]).astype(jnp.float32)  # >= 0 when not overflowed
    bump = (
        sel["idx_p"].astype(jnp.int32) == first1_pp[..., None]
    ).astype(jnp.float32) * npads1[..., None]
    # m1slot gating: pad slots duplicate first2's position, which can collide
    # with first1_pp when first1 == first2 — pads carry m1slot == False.
    # bf16 weights: multiplicities <= 1 + k1 are exact, half the HBM bytes
    w1 = jnp.where(sel["m1slot"], 1.0 + bump, 0.0).astype(jnp.bfloat16)
    # scale-2 weights: every valid slot once + the pad mass on the scan-first
    # hit's slot (pads duplicate it, so reference sums = hits + npads2*first2;
    # exactly one VALID slot holds q_first — pad slots also hold it but carry
    # validslot == False). Multiplicities <= 1 + k2 - 1 = 256: bf16-exact.
    bump2 = (
        sel["idx_p"].astype(jnp.int32) == sel["q_first"][..., None]
    ).astype(jnp.float32) * (k2 - sel["total2"]).astype(jnp.float32)[..., None]
    w2 = jnp.where(sel["validslot"], 1.0 + bump2, 0.0).astype(jnp.bfloat16)
    return w1, w2


def two_scale_group_first_k_packed_idx(
    r1: float,
    k1: int,
    r2: float,
    k2: int,
    pts: jnp.ndarray,
    chunks: int = 4,
    fused_keys: bool | None = None,
    interpret: bool = False,
):
    """``two_scale_group_first_k_packed`` WITHOUT the slot materialization:
    returns the permuted source planes plus pad-filled slot INDICES, for
    consumers that gather in their own kernel (ops/pe_fused.pe_fused_gather_t
    — the PE-v4 grouping-fused kernel). Skipping ``gather_planar`` removes
    the three (B, N, k2) f32 plane round-trips through HBM.

    Returns ((xp, yp, zp) permuted (B, N) planes,
             idx_p (B, N, k2) int16 pad-filled permuted slot positions,
             w1, w2, total2, overflow) — weight semantics as in
             two_scale_group_first_k_packed.
    """
    sel = _first_k_budget_select(
        r1, k1, r2, k2, pts, chunks, fused_keys, interpret,
        global_compact=True, materialize=False,
    )
    w1, w2 = _packed_multiset_weights(sel, k1, k2)
    return (
        (sel["xp"], sel["yp"], sel["zp"]),
        sel["idx_p"],
        w1,
        w2,
        sel["total2"],
        sel["overflow"],
    )


def two_scale_group_first_k_fast(
    r1: float,
    k1: int,
    r2: float,
    k2: int,
    pts: jnp.ndarray,
    chunks: int = 4,
    fused_keys: bool | None = None,
    interpret: bool = False,
):
    """Fast EXACT replacement for ``two_scale_group_exact_planar`` when no
    ball overflows its sample budget — which is every realistic cloud at the
    operating point (measured max 145 hits vs k2=256, 49 vs k1=64 on
    LRF-normalized surface clouds).

    Key observation: the reference's "first <=k in index order"
    (ball_query_gpu.cu:14-49) only differs from "ALL in-radius points" when
    the ball holds more than k hits. The PE consumer (LRF covariance + MLP
    max-pool) is slot-ORDER-invariant, so when no ball overflows, any
    enumeration of the full hit set plus the reference's pad-with-first-hit
    duplicates is bitwise-equivalent downstream. That removes the N-wide
    sort (~9 ms/batch): columns are decorrelated by a fixed permutation,
    split into ``chunks`` blocks, and each block keeps its first k2/chunks
    hits via a cheap narrow int16 sort — exact unless a block exceeds its
    budget, which (like total-count overflow) is detected EXACTLY and falls
    back to the reference sort path via ``lax.cond``.

    Padding reproduces the CUDA semantics: empty slots duplicate the hit
    with the smallest ORIGINAL index (computed by a masked min against the
    permutation table — no gather), rows with no hit keep point 0. Scale 1
    is selected from scale 2's slots (its hits are a subset of scale 2's
    full hit set) with a multi-operand sort that carries the coordinates.

    Returns ((g1x, g1y, g1z), (g2x, g2y, g2z)) like two_scale_group_exact_planar.
    """
    from unopose_tpu.ops.gather_pallas import gather_planar

    pts = pts.astype(jnp.float32)
    B, N, _ = pts.shape
    sel = _first_k_budget_select(r1, k1, r2, k2, pts, chunks, fused_keys, interpret)
    g2 = sel["g2"]
    cnt1 = sel["cnt1"]
    first1_orig = sel["enc1"] >> 12
    xp, yp, zp, inv_perm = sel["xp"], sel["yp"], sel["zp"], sel["inv_perm"]

    # ---- scale 1 from scale 2's slots (exact: r1-hits are a subset of the
    # FULL r2 hit set when nothing overflowed)
    mask1 = sel["m1slot"]  # carried bit: expansion-d2 membership, pads excluded

    siota = jnp.arange(k2, dtype=jnp.int32)[None, None, :]
    key1 = jnp.where(mask1, 2 * k2 - siota, k2 - siota).astype(jnp.int16)
    negk, g1x, g1y, g1z = jax.lax.sort(
        (-key1, g2[0], g2[1], g2[2]), dimension=-1, is_stable=False, num_keys=1
    )
    g1x, g1y, g1z = g1x[..., :k1], g1y[..., :k1], g1z[..., :k1]
    valid1 = (-negk[..., :k1]).astype(jnp.int32) > k2

    # scale-1 padding: the r1-hit with the smallest original index (from the
    # full mask — identical to the slot view when nothing overflowed, which
    # the overflow guard enforces); no-hit rows keep original point 0
    q1 = jnp.take(inv_perm, jnp.where(cnt1 > 0, first1_orig, 0), axis=0)
    p1x, p1y, p1z = gather_planar(xp, yp, zp, q1[..., None])
    g1x = jnp.where(valid1, g1x, p1x)
    g1y = jnp.where(valid1, g1y, p1y)
    g1z = jnp.where(valid1, g1z, p1z)

    overflow = sel["overflow"]

    def fallback(_):
        return two_scale_group_exact_planar(r1, k1, r2, k2, pts)

    def fast(_):
        return (g1x, g1y, g1z), g2

    return jax.lax.cond(overflow, fallback, fast, operand=None)


def ball_group_planar(radius: float, nsample: int, pts: jnp.ndarray, mode: str = "subset"):
    """One ball-query grouping of the cloud around its own points, returned
    channel-planar, plus squared neighbor distances and slot validity.

    Modes:
      * ``"subset"`` (default): partition a FIXED pseudo-random permutation
        of the cloud into ``nsample`` segments of N/nsample points and pick
        each segment's first in-radius point — a near-uniform random
        <=nsample-subset of the ball, with NO N-wide sort. The permutation
        decorrelates index order (image scan order) from position, so
        segment hit rates stay high. The reference's "first <=k in index
        order" (ball_query_gpu.cu) is itself an arbitrary scan-order subset;
        this one is exchangeable and cheaper. Requires nsample | N.
      * ``"first_k"``: exact reference semantics via the encoded sort.

    Returns ((gx, gy, gz) each (B, N, S), d2_sel (B, N, S), valid (B, N, S)).
    Only ``valid`` slots are meaningful; consumers mask (the fine PE's
    masked LRF + masked max-pool).
    """
    from unopose_tpu.ops.gather_pallas import gather_planar

    pts = pts.astype(jnp.float32)
    B, N, _ = pts.shape

    if mode == "subset" and N % nsample == 0 and N // nsample >= 1:
        G = N // nsample
        perm = jnp.asarray(np.random.default_rng(20240613).permutation(N).astype(np.int32))
        pts_p = jnp.take(pts, perm, axis=1)
        d2 = pairwise_sqdist(pts, pts_p)  # (B, P, N) columns in permuted order
        mask = d2 < radius * radius
        # slot s draws from permuted columns {g*S + s}: the first-hit reduce
        # then runs over the G axis with S on the (fast) minor dim — the
        # former (B, P, S, G) layout reduced over a width-G minor dim and
        # cost ~2x more
        gmask = mask.reshape(B, N, G, nsample)
        giota = jnp.arange(G, dtype=jnp.int32)[:, None]
        g_min = jnp.min(jnp.where(gmask, giota, G), axis=2)  # (B, P, S)
        valid = g_min < G
        g_min = jnp.minimum(g_min, G - 1)
        idx_p = g_min * nsample + jnp.arange(nsample, dtype=jnp.int32)[None, None, :]
        xp, yp, zp = pts_p[..., 0], pts_p[..., 1], pts_p[..., 2]
        planes = gather_planar(xp, yp, zp, idx_p)
    elif mode in ("subset", "first_k"):
        d2 = pairwise_sqdist(pts, pts)
        mask = d2 < radius * radius
        idx = _first_k_in_radius(mask, nsample)  # (B, N, S)
        cnt = jnp.sum(mask, axis=-1, dtype=jnp.int32)
        valid = jnp.arange(nsample, dtype=jnp.int32) < jnp.minimum(cnt, nsample)[..., None]
        x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
        planes = gather_planar(x, y, z, idx)
    else:
        raise ValueError(mode)

    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    d2_sel = (
        (planes[0] - x[..., None]) ** 2 + (planes[1] - y[..., None]) ** 2 + (planes[2] - z[..., None]) ** 2
    )
    return planes, d2_sel, valid


def query_and_group(
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    features: jnp.ndarray | None = None,
    use_xyz: bool = True,
    normalize_xyz: bool = False,
):
    """QueryAndGroup (reference pointnet2_utils.py:292-378), channel-last.

    Returns (B, P, S, C') grouped features where C' = 3 (+C if features given
    and use_xyz) following the reference concat order [rel_xyz, features].
    """
    idx = ball_query(radius, nsample, xyz, new_xyz)
    grouped_xyz = group_points(xyz, idx) - new_xyz[..., None, :]
    if normalize_xyz:
        grouped_xyz = grouped_xyz / radius
    if features is not None:
        grouped_feats = group_points(features, idx)
        if use_xyz:
            return jnp.concatenate([grouped_xyz, grouped_feats], axis=-1), idx
        return grouped_feats, idx
    return grouped_xyz, idx


def ball_group_subset_pallas(radius: float, nsample: int, pts, p_blk: int = 64, interpret: bool = False):
    """Pallas version of the 'subset' ball grouping: per point tile, the
    (p_blk, N) distance row, the first-hit-per-segment reduce, and the
    neighbor-coordinate selection all stay in VMEM. Selection is a one-hot
    sum over the G = N/nsample candidates per slot — no gather at all
    (the XLA path pays a (B, N, N) mask materialization + three banked
    row-gathers, ~7 ms/batch at the operating point).

    Same partition as ``ball_group_planar(mode='subset')``: permuted column
    g*nsample + s belongs to slot s, candidate g; first (smallest g) hit
    wins. Returns ((gx, gy, gz), d2_sel, valid) like ball_group_planar.
    """
    import functools

    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pts = pts.astype(jnp.float32)
    B, N, _ = pts.shape
    S = nsample
    assert N % S == 0 and N % p_blk == 0, (N, S, p_blk)
    G = N // S
    perm = jnp.asarray(np.random.default_rng(20240613).permutation(N).astype(np.int32))
    pts_p = jnp.take(pts, perm, axis=1)  # (B, N, 3) permuted order
    # candidate-major layout (B, G, S): slot s draws candidates g = 0..G-1
    # from permuted column g*S + s. Pre-split outside the kernel — Mosaic
    # cannot shape-cast a (P, N) vector into (P, G, S) when S < 128.
    xp = pts_p[..., 0].reshape(B, G, S)
    yp = pts_p[..., 1].reshape(B, G, S)
    zp = pts_p[..., 2].reshape(B, G, S)
    cx = pts[..., 0][..., None]  # (B, P, 1)
    cy = pts[..., 1][..., None]
    cz = pts[..., 2][..., None]

    def kernel(cx_ref, cy_ref, cz_ref, xp_ref, yp_ref, zp_ref, gx_ref, gy_ref, gz_ref, d2_ref, v_ref):
        x = cx_ref[0]  # (p_blk, 1)
        y = cy_ref[0]
        z = cz_ref[0]
        r2 = radius * radius
        # first-hit scan over the G candidates per slot, selection fused in:
        # all (p_blk, S) planes, no reshapes, G is small (N/nsample)
        found = jnp.zeros((p_blk, S), jnp.float32)
        gx = jnp.zeros((p_blk, S), jnp.float32)
        gy = jnp.zeros((p_blk, S), jnp.float32)
        gz = jnp.zeros((p_blk, S), jnp.float32)
        ds = jnp.zeros((p_blk, S), jnp.float32)
        for g in range(G):
            xg = xp_ref[0, g : g + 1, :]  # (1, S)
            yg = yp_ref[0, g : g + 1, :]
            zg = zp_ref[0, g : g + 1, :]
            dx = x - xg
            dy = y - yg
            dz = z - zg
            d2 = dx * dx + dy * dy + dz * dz
            take = jnp.logical_and(d2 < r2, found == 0.0).astype(jnp.float32)
            gx = gx + take * xg
            gy = gy + take * yg
            gz = gz + take * zg
            ds = ds + take * d2
            found = jnp.maximum(found, take)
        # slots with no hit keep candidate 0 coords (consumers mask by valid)
        miss = 1.0 - found
        gx_ref[0] = gx + miss * xp_ref[0, 0:1, :]
        gy_ref[0] = gy + miss * yp_ref[0, 0:1, :]
        gz_ref[0] = gz + miss * zp_ref[0, 0:1, :]
        d2_ref[0] = ds
        v_ref[0] = found

    grid = (B, N // p_blk)
    cspec = pl.BlockSpec((1, p_blk, 1), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((1, G, S), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, p_blk, S), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[cspec] * 3 + [fspec] * 3,
        out_specs=(ospec,) * 5,
        out_shape=tuple(jax.ShapeDtypeStruct((B, N, S), jnp.float32) for _ in range(5)),
        interpret=interpret,
    )(cx, cy, cz, xp, yp, zp)
    gx, gy, gz, d2_sel, valid = outs
    return (gx, gy, gz), d2_sel, valid > 0.5
