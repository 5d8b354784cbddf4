"""Coarse and fine point-matching stages with overlap ("predator") heads.

Flax counterparts of reference oneref_predator_coarse_point_matching.py:14-117
and oneref_predator_fine_point_matching.py:13-178. The modules are pure
feature->logits networks: they return per-block similarity matrices, overlap
scores and saliency scores. Loss computation (train) and pose solving (eval)
are applied by the top-level model / engine, keeping these modules
functional and shape-static.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import os

import flax.linen as nn
import jax
import jax.numpy as jnp

from unopose_tpu.models.attention import TransformerLayer
from unopose_tpu.models.transformer import GeometricTransformer, SparseToDenseTransformer
from unopose_tpu.ops.ball_query import ball_group_planar, ball_query, group_points
from unopose_tpu.ops.geometry import compute_feature_similarity
from unopose_tpu.ops.lrf import batch_lrf, batch_lrf_planar


def _block_outputs(atten, scores, n1: int, need_saliency: bool = True):
    """Split per-token scores and compute saliency from the similarity matrix
    (reference coarse :62-76 / fine :85-99).

    scores: (B, n1+1+n2+1, 1) raw head outputs on [bg, f1..., bg, f2...].
    ``need_saliency=False`` (inference) skips the two full softmax passes
    over the (B, n, n) matrix — the solvers consume only atten + score;
    saliency feeds the training loss alone.
    """
    s1 = scores[:, 1 : n1 + 1]  # (B, n1, 1)
    s2 = scores[:, n1 + 2 :]  # (B, n2, 1)
    score = jax.nn.sigmoid(jnp.concatenate([s1, s2], axis=1)[..., 0].astype(jnp.float32))
    if not need_saliency:
        return jnp.clip(score, 0.0, 1.0), None
    a = atten[:, 1:, 1:].astype(jnp.float32)
    m1 = jnp.matmul(jax.nn.softmax(a, axis=2), s2.astype(jnp.float32))
    # column-softmax contracted over rows == softmax(a^T) @ s1 without
    # materializing the transposed (B, n, n) matrix
    m2 = jnp.einsum("bij,bik->bjk", jax.nn.softmax(a, axis=1), s1.astype(jnp.float32))
    saliency = jax.nn.sigmoid(jnp.concatenate([m1, m2], axis=1)[..., 0])
    return jnp.clip(score, 0.0, 1.0), jnp.clip(saliency, 0.0, 1.0)


class _CoarseBlock(nn.Module):
    """One coarse stage: GeometricTransformer + per-block score head.

    Scan-compatible body — the nblock copies are stacked with nn.scan to
    keep the compiled program small."""

    hidden_dim: int
    num_heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, carry, geo1, geo2):
        f1, f2 = carry
        f1, f2 = GeometricTransformer(
            ("self", "cross"), self.hidden_dim, self.num_heads, dtype=self.dtype, name="transformer"
        )(f1, geo1, f2, geo2)
        scores = nn.Dense(1, dtype=self.dtype, name="score_head")(jnp.concatenate([f1, f2], axis=1))
        return (f1, f2), (f1, f2, scores)


class CoarsePointMatching(nn.Module):
    nblock: int = 3
    input_dim: int = 256
    hidden_dim: int = 256
    out_dim: int = 256
    num_heads: int = 4
    temp: float = 0.1
    sim_type: str = "cosine"
    normalize_feat: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, f1, geo1, f2, geo2, all_blocks: bool = False, with_saliency: bool | None = None):
        """f1 (B, n1, C), geo1 (B, n1+1, n1+1, C), f2 (B, n2, C), geo2 likewise.

        Returns (attens, scores, saliencies): lists over the evaluated blocks
        (all ``nblock`` when ``all_blocks`` — training — else just the last).
        """
        B, n1 = f1.shape[:2]
        in_proj = nn.Dense(self.hidden_dim, dtype=self.dtype, name="in_proj")
        out_proj = nn.Dense(self.out_dim, dtype=self.dtype, name="out_proj")
        bg_token = self.param("bg_token", nn.initializers.normal(0.02), (1, 1, self.hidden_dim))
        bg = jnp.broadcast_to(bg_token.astype(self.dtype), (B, 1, self.hidden_dim))

        f1 = jnp.concatenate([bg, in_proj(f1.astype(self.dtype))], axis=1)
        f2 = jnp.concatenate([bg, in_proj(f2.astype(self.dtype))], axis=1)

        Scanned = nn.scan(
            _CoarseBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast, nn.broadcast),
            length=self.nblock,
            metadata_params={nn.meta.PARTITION_NAME: None},
        )
        _, (f1s, f2s, scores_s) = Scanned(self.hidden_dim, self.num_heads, self.dtype, name="blocks")(
            (f1, f2), geo1, geo2
        )

        blocks = range(self.nblock) if all_blocks else [self.nblock - 1]
        attens, scores_l, sals = [], [], []
        for idx in blocks:
            atten = compute_feature_similarity(
                out_proj(f1s[idx]).astype(jnp.float32),
                out_proj(f2s[idx]).astype(jnp.float32),
                self.sim_type,
                self.temp,
                self.normalize_feat,
            )
            need_sal = all_blocks if with_saliency is None else with_saliency
            score, sal = _block_outputs(atten, scores_s[idx], n1, need_saliency=need_sal)
            attens.append(atten)
            scores_l.append(score)
            sals.append(sal)
        return attens, scores_l, sals


class _BNVars(nn.Module):
    """Declares/reads the exact variable tree of an nn.BatchNorm child
    (params: scale, bias; batch_stats: mean, var) without applying it — the
    fused inference path folds these into the MLP weights instead; the
    fused TRAIN path (ops/pe_train.py) reads the refs to run the flax
    running-stat update itself (``mutable=True``)."""

    features: int
    mutable: bool = False

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable("batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32))
        if self.mutable:
            return scale, bias, mean, var
        return scale, bias, mean.value, var.value


def _pe_folded_params(m: "FinePositionalEncoding"):
    """Declare the PE MLP/BN parameter tree (identical names to the XLA
    path) and return inference-folded (Ws, bs) per scale."""
    from unopose_tpu.ops.pe_fused import fold_bn

    folded = {}
    for name in ("mlp1", "mlp2"):
        Ws, bs = [], []
        cin = 6
        for i, d in enumerate((32, 64, 128)):
            W = m.param(f"{name}_fc{i}_kernel", nn.initializers.he_normal(), (cin, d))
            scale, bias, mean, var = _BNVars(d, name=f"{name}_bn{i}")()
            Wf, bf = fold_bn(W, scale, bias, mean, var)
            Ws.append(Wf)
            bs.append(bf)
            cin = d
    # (both scales declared before returning so init order is stable)
        folded[name] = (Ws, bs)
    return folded


def pe_fused_path(m: "FinePositionalEncoding", g1, valid1, g2, valid2, center, interpret: bool):
    """Invoke the fused PE kernel (ops/pe_fused.py), declaring the identical
    parameter/batch_stats tree as the XLA path (folded inference BN)."""
    from unopose_tpu.ops.pe_fused import pe_fused

    folded = _pe_folded_params(m)
    return pe_fused(
        g1, valid1, g2, valid2, center,
        *folded["mlp1"], *folded["mlp2"],
        m.r1, m.r2,
        interpret=interpret,
    )  # (B, P, 256) points-major


def _folded_scale_planar(center, grouped, r, Ws, bs, lrf_w=None, pool_mask=None):
    """Pure XLA inference MLP over one PE scale with folded-BN weights
    (cond-branch safe: no module calls). ``lrf_w`` optionally weights the
    LRF moment/vote sums by multiset multiplicity; ``pool_mask`` restricts
    the max-pool. Returns (B, d_last, P) float32."""
    x, y, z = center
    rel = tuple(g - c[..., None] for g, c in zip(grouped, (x, y, z)))
    lrf = batch_lrf_planar(center, grouped, r, mask=lrf_w)
    h = jnp.stack([*rel, *lrf], axis=1).astype(jnp.float32)  # (B, 6, P, S)
    for W, b in zip(Ws, bs):
        h = jnp.einsum("bcps,cd->bdps", h, W) + b[None, :, None, None]
        h = nn.relu(h)
    if pool_mask is not None:
        h = jnp.where(pool_mask[:, None, :, :], h, -jnp.inf)
    return jnp.max(h, axis=3)


def pe_packed_firstk_path(m: "FinePositionalEncoding", pts, center, use_kernel: bool, on_tpu: bool):
    """first_k inference via the PACKED grouping: scale 2's compacted slots +
    scale-1 multiset weights (ops/ball_query.two_scale_group_first_k_packed)
    — the separate scale-1 materialization and its k2-wide sort disappear.
    Overflow (any chunk budget / total2 > k2 / cnt1 > k1) branches to the
    exact reference sort path at the FEATURE level (a grouping-level
    fallback cannot express scale 1's independent truncation, which may
    keep r1 hits outside scale 2's kept slots)."""
    import os as _os

    from unopose_tpu.ops.ball_query import (
        two_scale_group_exact_planar,
        two_scale_group_first_k_packed,
        two_scale_group_first_k_packed_idx,
    )
    from unopose_tpu.ops.pe_fused import pe_fused_packed, pe_fused_packed_t

    folded = _pe_folded_params(m)
    use_v5 = (
        use_kernel
        and pts.shape[1] % 128 == 0
        and m.nsample2 == 256
        and _os.environ.get("UNOPOSE_PE_V5", "1") == "1"
    )
    if use_v5:
        # PE-v5 (PRODUCTION): gather+LRF+channel-store kernel -> slot-major
        # chunked MLP/pool kernel, on the index grouping (no slot
        # materialization). Splits the v4 mega-fusion at the measured seam
        # (ops/pe_fused.py v5 comment); bitwise-equal to pe_fused_gather_t.
        # Full-model A/B on the chip: 54.8 vs 64.0 ms/16-pair batch — the
        # round-4 PE plateau broken (benchmarks/bench_ab_pe_v4.py, round 5).
        # UNOPOSE_PE_V5=0 restores the point-major packed kernel.
        from unopose_tpu.ops.pe_fused import pe_fused_v5

        planes, idx_p, w1, w2, total2, overflow = two_scale_group_first_k_packed_idx(
            m.r1, m.nsample1, m.r2, m.nsample2, pts
        )

        def fast_v5(pts):
            return pe_fused_v5(
                planes, idx_p, w1, w2, total2, center,
                *folded["mlp1"], *folded["mlp2"],
                m.r1, m.r2, interpret=not on_tpu,
            )

        def slow_v5(pts):
            g1e, g2e = two_scale_group_exact_planar(m.r1, m.nsample1, m.r2, m.nsample2, pts)
            f1 = _folded_scale_planar(center, g1e, m.r1, *folded["mlp1"])
            f2 = _folded_scale_planar(center, g2e, m.r2, *folded["mlp2"])
            return jnp.swapaxes(jnp.concatenate([f1, f2], axis=1), 1, 2)

        return jax.lax.cond(overflow, slow_v5, fast_v5, pts)

    use_v4 = (
        use_kernel
        and pts.shape[1] % 128 == 0
        and m.nsample2 % 256 == 0
        and _os.environ.get("UNOPOSE_PE_V4", "0") == "1"
    )
    if use_v4:
        # PE-v4 (env-gated EXPERIMENT): grouping-fused slot-major kernel —
        # slot coordinates are gathered INSIDE the PE kernel from the
        # permuted planes + int16 indices, so the three (B, P, S2) f32
        # planes never exist in HBM and per-block adaptive tiers scale
        # gather+LRF+MLP together (bitwise-validated against
        # pe_fused_packed_t in all tiers, benchmarks/check_pe_v4.py).
        # GATED OFF: measured EQUAL to the production point-major kernel
        # in-model (64.7 vs 64.2 ms full-model A/B, bench_ab_pe_v4.py).
        # The internal ablation (benchmarks/profile_pe_v4.py) explains why:
        # gather is only ~1.2 ms and the LRF/MLP each measure small ALONE
        # (≈0.4 / ≈4.4 ms marginal), but feeding LRF outputs through the
        # per-chunk channel-stack relayout costs ~9 ms of pure interaction
        # — the in-VMEM stack/reshape is the bottleneck, not the math. The
        # successor (PE-v5) keeps this kernel's gather+LRF stage but WRITES
        # channels to HBM in PE-v3's flat chunk layout, feeding v3's
        # relayout-free cols-major MLP kernel.
        from unopose_tpu.ops.pe_fused import pe_fused_gather_t

        planes, idx_p, w1, w2, total2, overflow = two_scale_group_first_k_packed_idx(
            m.r1, m.nsample1, m.r2, m.nsample2, pts
        )

        def fast_v4(pts):
            return pe_fused_gather_t(
                planes, idx_p, w1, w2, total2, center,
                *folded["mlp1"], *folded["mlp2"],
                m.r1, m.r2, interpret=not on_tpu,
            )

        def slow_v4(pts):
            g1e, g2e = two_scale_group_exact_planar(m.r1, m.nsample1, m.r2, m.nsample2, pts)
            f1 = _folded_scale_planar(center, g1e, m.r1, *folded["mlp1"])
            f2 = _folded_scale_planar(center, g2e, m.r2, *folded["mlp2"])
            return jnp.swapaxes(jnp.concatenate([f1, f2], axis=1), 1, 2)

        return jax.lax.cond(overflow, slow_v4, fast_v4, pts)

    g2, w1, w2, total2, overflow = two_scale_group_first_k_packed(
        m.r1, m.nsample1, m.r2, m.nsample2, pts
    )

    def fast(pts):
        if use_kernel:
            import os as _os
            if (
                pts.shape[1] % 128 == 0
                and g2[0].shape[2] % 256 == 0
                and _os.environ.get("UNOPOSE_PE_V3", "0") == "1"
            ):
                # GATED OFF: measured EQUAL to the point-major kernel on the
                # real chip (round 4, benchmarks/profile_pe_split.py:
                # v3 channels 8.8 + kernel 10.2 vs old kernel 14.2 ms
                # host-chained; full-model 63.4 vs 63.7 ms). Two independent
                # designs plateauing at ~10 ms net of dispatch floor says the
                # cost is the irreducible LRF + MLP work at these shapes, not
                # the in-VMEM relayouts this design removes. Kept as the
                # structural basis for a future grouping-fused variant.
                # v3 split path (default): XLA channel construction + the
                # cols-major chunked MLP/pool kernel — no in-VMEM relayouts,
                # per-block adaptive slot budgets (ops/pe_fused.py PE-v3
                # comment). Exactness argument in pe_channels_packed.
                from unopose_tpu.ops.pe_fused import pe_channels_packed, pe_mlp_pool_packed

                chunks, _ = pe_channels_packed(g2, w1, w2, center, m.r1, m.r2)
                return pe_mlp_pool_packed(
                    chunks, total2,
                    *folded["mlp1"], *folded["mlp2"],
                    interpret=not on_tpu,
                )
            if (
                pts.shape[1] % 128 == 0
                and g2[0].shape[2] % 256 == 0
                and _os.environ.get("UNOPOSE_PE_SLOT_MAJOR") == "1"
            ):
                # Slot-major adaptive-budget kernel (env-gated EXPERIMENT,
                # not production). Numerics are fine — outputs differ from
                # pe_fused_packed only by fp reduction order (sublane- vs
                # lane-axis moment sums; w2-weighted vs duplicate-pad scale-2
                # LRF moments — mathematically equal), which the
                # sign-discontinuous LRF eigvec/vote steps amplify on frames
                # with no eigengap; it passes the same oracle tolerance tests
                # (tests/test_model.py::test_fine_pe_fused_matches_xla).
                # It is GATED OFF because it measured SLOWER than the
                # point-major kernel in the honest B=16 regime (13.1 vs
                # 11.4 ms standalone, 67.3 vs 63.9 ms full-model bench):
                # even with 99.6% of blocks on the 64-slot tier, the
                # slot-major layout's full-s2 sublane-axis LRF reductions +
                # the six (B,P,S2)->(B,S2,P) input transposes outweigh the
                # 4x MLP-chunk saving. An earlier B=32 measurement that
                # suggested -28% was inflated by an axon-tunnel stall.
                return pe_fused_packed_t(
                    tuple(jnp.swapaxes(p, 1, 2) for p in g2),
                    jnp.swapaxes(w1, 1, 2), jnp.swapaxes(w2, 1, 2),
                    total2, center,
                    *folded["mlp1"], *folded["mlp2"],
                    m.r1, m.r2, interpret=not on_tpu,
                )
            return pe_fused_packed(
                g2, w1, w2, total2, center,
                *folded["mlp1"], *folded["mlp2"],
                m.r1, m.r2, interpret=not on_tpu,
            )
        f1 = _folded_scale_planar(center, g2, m.r1, *folded["mlp1"], lrf_w=w1, pool_mask=w1 > 0)
        f2 = _folded_scale_planar(center, g2, m.r2, *folded["mlp2"])
        return jnp.swapaxes(jnp.concatenate([f1, f2], axis=1), 1, 2)

    def slow(pts):
        g1e, g2e = two_scale_group_exact_planar(m.r1, m.nsample1, m.r2, m.nsample2, pts)
        f1 = _folded_scale_planar(center, g1e, m.r1, *folded["mlp1"])
        f2 = _folded_scale_planar(center, g2e, m.r2, *folded["mlp2"])
        return jnp.swapaxes(jnp.concatenate([f1, f2], axis=1), 1, 2)

    return jax.lax.cond(overflow, slow, fast, pts)


class FinePositionalEncoding(nn.Module):
    """Two-scale local-geometry encoding (reference fine :138-178).

    For each point: ball-query neighborhoods at (r1, ns1) and (r2, ns2),
    per-neighborhood LRF coordinates (use_lrf) concatenated with relative
    xyz (use_xyz), shared 1x1-conv MLPs with BatchNorm, max-pool over
    neighbors, concat scales, project to out_dim. Runs in fp32 (the
    reference pins this block out of autocast, fine :163-165).
    """

    out_dim: int = 256
    r1: float = 0.1
    r2: float = 0.2
    nsample1: int = 64
    nsample2: int = 256
    use_lrf: bool = True
    use_xyz: bool = True
    use_bn: bool = True
    # 'first_k' = exact reference ball-query semantics (ball_query_gpu.cu),
    # served by the sort-free fast grouping — THE production config: the
    # 104-pair converted-weight study (benchmarks/SUBSET_STUDY.md) measured
    # subset-mode pose flips up to 148 deg (1% of pairs) vs first_k's
    # exactly-zero pose delta. 'subset' stays as the cheaper approximate
    # mode for from-scratch training experiments.
    neighbor_mode: str = "first_k"
    # storage dtype of the (B, {32,64,128}, P, S) MLP activations — the
    # single largest HBM tensor family of the whole forward (~15GB of
    # traffic per batch in fp32). bfloat16 halves it; GEMMs run at the
    # MXU's native bf16 and the LRF geometry + BatchNorm statistics stay
    # fp32, so only the already-BN-normalized activations are rounded.
    # The reference pins this block to fp32 only to dodge fp16-AMP
    # overflow (fine :163-165) — bf16 has fp32's range. ``None`` resolves
    # to fp32 in reference-parity mode ('first_k'), bfloat16 otherwise.
    compute_dtype: Any = None
    # fused-kernel override: None = auto (Pallas kernel on TPU inference),
    # True/False forces (True uses interpret mode off-TPU — for tests)
    fused: Any = None
    # packed first_k inference path (scale-1 as multiset weights on scale 2's
    # compacted slots): None/True = use when shapes allow; False forces the
    # materialized two-sort path (comparison studies / debugging)
    packed: Any = None

    @property
    def _cdt(self):
        if self.compute_dtype is not None:
            return self.compute_dtype
        return jnp.float32 if self.neighbor_mode == "first_k" else jnp.bfloat16

    def _scale(self, center, grouped, r, mlp_dims, train, name, mask=None):
        """Channel-first shared MLP over one neighborhood scale.

        center: (x, y, z) each (B, P); grouped: (gx, gy, gz) each (B, P, S).
        Channels live on a leading (sublane) axis — exactly the reference's
        Conv2d (B, C, npoint, nsample) layout, which is also the TPU-tiled
        one; a trailing width-3/6 channel axis wastes ~98% of each register
        tile and made this block the single largest cost in the profile.
        ``mask`` (B, P, S) restricts the neighborhood (masked LRF + masked
        max-pool). Returns (B, d_last, P) after max-pooling over samples.
        """
        cdt = self._cdt
        x, y, z = center
        rel = tuple(g - c[..., None] for g, c in zip(grouped, (x, y, z)))
        chans = []
        if self.use_xyz:
            chans += list(rel)
        if self.use_lrf:
            chans += list(batch_lrf_planar(center, grouped, r, mask=mask))
        else:
            chans += list(rel)
        h = jnp.stack(chans, axis=1).astype(cdt)  # (B, C, P, S)

        on_tpu = jax.default_backend() == "tpu"
        train_shapes_ok = (
            train
            and self.use_bn
            and mask is None
            and tuple(mlp_dims) == (32, 64, 128)
            and h.shape[1] == 6
            and h.shape[2] % 32 == 0
        )
        if train_shapes_ok and os.environ.get("UNOPOSE_PE_TRAIN_FROZEN") == "1":
            # OPT-IN fast-train mode: BN normalizes with the RUNNING stats
            # (use_running_average=True during training — a documented
            # DEVIATION from the reference recipe, which uses batch stats).
            # With frozen stats the BN backward has no batch-correction
            # sums, so the whole PE stack runs as ONE fused forward kernel
            # + ONE fused backward kernel (ops/pe_train.py frozen variant,
            # fp32-oracle-exact grads) instead of the XLA formulation's
            # ~99 ms backward share. Running stats are NOT updated.
            from unopose_tpu.ops.pe_train import pe_mlp_bn_pool_frozen

            Ws, gammas, betas, means, vars_ = [], [], [], [], []
            for i, d in enumerate(mlp_dims):
                cin = 6 if i == 0 else mlp_dims[i - 1]
                Ws.append(self.param(f"{name}_fc{i}_kernel", nn.initializers.he_normal(), (cin, d)))
                scale, bias, mv, vv = _BNVars(d, name=f"{name}_bn{i}")()
                gammas.append(scale)
                betas.append(bias)
                means.append(mv)
                vars_.append(vv)
            pooled = pe_mlp_bn_pool_frozen(
                jax.lax.stop_gradient(h.astype(jnp.float32)), Ws, gammas, betas,
                means, vars_, interpret=not on_tpu,
            )
            return jnp.swapaxes(pooled[..., : mlp_dims[-1]], 1, 2)  # (B, d, P)

        use_fused_train = train_shapes_ok and (
            self.fused is True or os.environ.get("UNOPOSE_PE_TRAIN_FUSED") == "1"
        )
        if use_fused_train:
            # fused train-path MLP/BN/pool with a custom VJP
            # (ops/pe_train.py): the (B, {32,64,128}, P, S) activation
            # family never reaches HBM in fwd OR bwd — it was 98.9 ms of
            # the 162 ms train backward as XLA (profile_train_bwd.py).
            # Channels are stop-gradded (coordinates are data; the fine
            # init pose is a GT-noise label), so the VJP computes only
            # (dW, dgamma, dbeta) — oracle-tested exact vs autodiff in
            # fp32 mode (tests/test_pe_train.py).
            # GATED OFF by default: measured 267 vs 249 ms/step on the
            # chip. Exact BN-train semantics force a pass-structured
            # pipeline (3 stats + 1 fwd + 3 bwd-sums + 1 bwd-dW, each
            # recomputing the chain in VMEM) — ~42 full-chain MXU units vs
            # the XLA path's ~9; the recompute tax exceeds the HBM-traffic
            # cost it removes. The module stays as the validated basis for
            # a frozen-BN fast-train variant (1 fwd + 2 bwd passes), which
            # WOULD win but deviates from the reference recipe.
            from unopose_tpu.ops.pe_train import pe_mlp_bn_pool_train

            Ws, gammas, betas, mvars, vvars = [], [], [], [], []
            for i, d in enumerate(mlp_dims):
                cin = 6 if i == 0 else mlp_dims[i - 1]
                Ws.append(self.param(f"{name}_fc{i}_kernel", nn.initializers.he_normal(), (cin, d)))
                scale, bias, mv, vv = _BNVars(d, mutable=True, name=f"{name}_bn{i}")()
                gammas.append(scale)
                betas.append(bias)
                mvars.append(mv)
                vvars.append(vv)
            pooled, (mus, vars_) = pe_mlp_bn_pool_train(
                jax.lax.stop_gradient(h.astype(jnp.float32)), Ws, gammas, betas,
                interpret=not on_tpu,
            )
            if not self.is_initializing():
                for i in range(3):
                    # flax BatchNorm running update, momentum 0.9
                    mvars[i].value = 0.9 * mvars[i].value + 0.1 * mus[i]
                    vvars[i].value = 0.9 * vvars[i].value + 0.1 * vars_[i]
            return jnp.swapaxes(pooled[..., : mlp_dims[-1]], 1, 2)  # (B, d, P)

        for i, d in enumerate(mlp_dims):
            cin = h.shape[1]
            W = self.param(f"{name}_fc{i}_kernel", nn.initializers.he_normal(), (cin, d))
            # fp32-form einsum on (possibly) bf16-stored activations: the
            # upcast fuses into the GEMM read, the TPU MXU truncates fp32
            # operands to bf16 at default precision anyway, and XLA:CPU
            # (tests) keeps a supported F32xF32 dot
            h = jnp.einsum("bcps,cd->bdps", h.astype(jnp.float32), W)
            if self.use_bn:
                h = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    axis=1,
                    dtype=jnp.float32,
                    name=f"{name}_bn{i}",
                )(h)
            else:
                h = h + self.param(f"{name}_fc{i}_bias", nn.initializers.zeros, (d,))[None, :, None, None]
            h = nn.relu(h).astype(cdt)
        h = h.astype(jnp.float32)
        if mask is not None:
            h = jnp.where(mask[:, None, :, :], h, -jnp.inf)
        return jnp.max(h, axis=3)  # max over samples -> (B, d, P)

    @nn.compact
    def __call__(self, pts: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Subset mode: each scale draws a fixed-permutation random
        <= nsample subset of its ball (the CUDA reference's 'first k in
        scan order' is itself an arbitrary subset); a max-pooled MLP is
        insensitive to the reference's pad-with-duplicates. The self point
        guarantees every grouping has a valid slot. first_k mode keeps the
        exact reference semantics for converted checkpoints."""
        from jax.ad_checkpoint import checkpoint_name

        pts = pts.astype(jnp.float32)
        center = (pts[..., 0], pts[..., 1], pts[..., 2])

        if self.neighbor_mode == "first_k":
            # exact reference semantics (parity mode): two independent ball
            # queries, UNMASKED LRF + max-pool over the padded slots —
            # duplicate pads participate in the covariance/vote exactly as
            # in the CUDA kernels (pointnet2_utils.py QueryAndLRFGroup).
            # The grouping itself uses the sort-free fast path (exact: it
            # self-detects budget overflow and falls back to the reference
            # sort inside lax.cond — ops/ball_query.two_scale_group_first_k_fast).
            from jax.ad_checkpoint import checkpoint_name

            from unopose_tpu.ops.ball_query import (
                two_scale_group_exact_planar,
                two_scale_group_first_k_fast,
            )

            N = pts.shape[1]
            on_tpu_fk = jax.default_backend() == "tpu"
            packed_ok = (
                not train
                and self.packed is not False
                and self.use_bn
                and self.use_lrf
                and self.use_xyz
                and N % 4 == 0
                and N % 64 == 0
                and N <= 4096
                and N >= self.nsample2  # chunked budget select needs N >= k2
                and self.nsample2 % 256 == 0
                and self.nsample2 % 4 == 0
            )
            if packed_ok:
                # packed inference path: no scale-1 materialization/sort
                feat = pe_packed_firstk_path(
                    self, pts, center,
                    use_kernel=(self.fused if self.fused is not None else on_tpu_fk),
                    on_tpu=on_tpu_fk,
                )
                return nn.Dense(self.out_dim, dtype=jnp.float32, name="mlp3")(feat)
            if N % 4 == 0 and self.nsample2 % 4 == 0:
                g1, g2 = two_scale_group_first_k_fast(
                    self.r1, self.nsample1, self.r2, self.nsample2, pts
                )
            else:
                g1, g2 = two_scale_group_exact_planar(
                    self.r1, self.nsample1, self.r2, self.nsample2, pts
                )
            g1 = tuple(checkpoint_name(g, "pe_grouped") for g in g1)
            g2 = tuple(checkpoint_name(g, "pe_grouped") for g in g2)
            use_fused_fk = (
                not train
                and self.use_bn
                and self.use_lrf
                and self.use_xyz
                and (self.fused if self.fused is not None else on_tpu_fk)
                and pts.shape[1] % 32 == 0
            )
            if use_fused_fk:
                # all-ones masks: the fused kernel's masked LRF/max over
                # every slot (padding duplicates included) IS the reference's
                # unmasked semantics; bf16 contractions match the XLA path's
                # effective TPU precision (study: first_k_bf16 pose delta 0)
                ones1 = jnp.ones(g1[0].shape, bool)
                ones2 = jnp.ones(g2[0].shape, bool)
                feat = pe_fused_path(
                    self, g1, ones1, g2, ones2, center, interpret=not on_tpu_fk
                )
            else:
                f1 = self._scale(center, g1, self.r1, (32, 64, 128), train, "mlp1", mask=None)
                f2 = self._scale(center, g2, self.r2, (32, 64, 128), train, "mlp2", mask=None)
                feat = jnp.swapaxes(jnp.concatenate([f1, f2], axis=1), 1, 2)
            return nn.Dense(self.out_dim, dtype=jnp.float32, name="mlp3")(feat)

        # two independent subset groupings at the reference's budgets
        # (nsample1=64, nsample2=256): running scale 1 on its own slots
        # instead of a masked view of scale 2's costs 37% less MLP work.
        # Every point's own segment contains the point itself, so both
        # groupings always have >= 1 valid slot.
        on_tpu_g = jax.default_backend() == "tpu"
        N = pts.shape[1]
        use_pallas_group = (
            self.neighbor_mode == "subset"
            and (self.fused if self.fused is not None else on_tpu_g)
            and N % self.nsample2 == 0
            and N % self.nsample1 == 0
            and N % 64 == 0
        )
        if use_pallas_group:
            # fused grouping kernel: distance row, first-hit reduce and
            # neighbor selection in VMEM (ops/ball_query.py
            # ball_group_subset_pallas) — the XLA path materializes the
            # (B, N, N) mask and pays three banked gathers
            from unopose_tpu.ops.ball_query import ball_group_subset_pallas

            g1, d1_sel, valid1 = ball_group_subset_pallas(
                self.r1, self.nsample1, pts, interpret=not on_tpu_g
            )
            g2, d2_sel, valid2 = ball_group_subset_pallas(
                self.r2, self.nsample2, pts, interpret=not on_tpu_g
            )
        else:
            g1, d1_sel, valid1 = ball_group_planar(self.r1, self.nsample1, pts, mode=self.neighbor_mode)
            g2, d2_sel, valid2 = ball_group_planar(self.r2, self.nsample2, pts, mode=self.neighbor_mode)
        # under remat (see FinePointMatching), keep the grouped neighborhoods
        # as residuals: re-running the selection + 8M-row gather in the
        # backward pass costs far more than storing (B, 3, P, S) fp32
        g1 = tuple(checkpoint_name(g, "pe_grouped") for g in g1)
        g2 = tuple(checkpoint_name(g, "pe_grouped") for g in g2)

        on_tpu = jax.default_backend() == "tpu"
        use_fused = (
            not train
            and self.use_bn
            and self.use_lrf
            and self.use_xyz
            and (self.fused if self.fused is not None else on_tpu)
            and pts.shape[1] % 32 == 0
        )
        if use_fused:
            # single Pallas kernel: LRF + folded-BN MLPs + masked max stay
            # in VMEM (see ops/pe_fused.py); declares the identical
            # parameter/batch_stats tree as the XLA path below.
            feat = pe_fused_path(self, g1, valid1, g2, valid2, center, interpret=not on_tpu)
        else:
            f1 = self._scale(center, g1, self.r1, (32, 64, 128), train, "mlp1", mask=valid1)
            f2 = self._scale(center, g2, self.r2, (32, 64, 128), train, "mlp2", mask=valid2)
            feat = jnp.swapaxes(jnp.concatenate([f1, f2], axis=1), 1, 2)  # (B, P, 256)
        return nn.Dense(self.out_dim, dtype=jnp.float32, name="mlp3")(feat)


class _FineBlock(nn.Module):
    """One fine stage: SparseToDenseTransformer + per-block score head
    (scan-compatible body, same rationale as _CoarseBlock)."""

    hidden_dim: int
    num_heads: int
    focusing_factor: float
    dtype: jnp.dtype
    parity_gather: bool = False

    @nn.compact
    def __call__(self, carry, geo1, fps_idx1, geo2, fps_idx2):
        f1, f2 = carry
        f1, f2 = SparseToDenseTransformer(
            self.hidden_dim,
            sparse_blocks=("self", "cross"),
            num_heads=self.num_heads,
            focusing_factor=self.focusing_factor,
            with_bg_token=True,
            replace_bg_token=True,
            parity_gather=self.parity_gather,
            dtype=self.dtype,
            name="transformer",
        )(f1, geo1, fps_idx1, f2, geo2, fps_idx2)
        scores = nn.Dense(1, dtype=self.dtype, name="score_head")(jnp.concatenate([f1, f2], axis=1))
        return (f1, f2), (f1, f2, scores)


class FinePointMatching(nn.Module):
    nblock: int = 3
    input_dim: int = 256
    hidden_dim: int = 256
    out_dim: int = 256
    num_heads: int = 4
    temp: float = 0.1
    sim_type: str = "cosine"
    normalize_feat: bool = True
    focusing_factor: float = 3.0
    pe_radius1: float = 0.1
    pe_radius2: float = 0.2
    nsample1: int = 64
    nsample2: int = 256
    use_lrf: bool = True
    use_xyz: bool = True
    parity_gather: bool = False  # reproduce the reference's bg-shifted gather
    pe_neighbor_mode: str = "first_k"  # production AND parity (see SUBSET_STUDY.md)
    pe_dtype: Any = None  # PE MLP activation storage; None -> fp32 in
    # reference-parity mode ('first_k'), bfloat16 otherwise
    pe_packed: Any = None  # packed first_k inference path; False forces
    # the materialized two-sort path (comparison studies)
    pe_fused: Any = None  # force the fused PE kernel (True -> interpret off
    # TPU; used by the CPU production-path gate test); None = auto
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, p1, f1, geo1, fps_idx1, p2, f2, geo2, fps_idx2, init_R, init_t, train: bool = False, return_proj: bool = False, with_saliency: bool | None = None):
        """p1/p2 (B, n, 3) dense clouds (normalized), f1/f2 (B, n, C) dense
        features, geo* (B, 197, 197, C) sparse embeddings, fps_idx* (B, 196).
        init_R/init_t: coarse pose (p1 gets pre-aligned into p2's frame,
        reference fine :65-69)."""
        B, n1 = p1.shape[:2]
        p1_aligned = jnp.matmul(p1 - init_t[:, None, :], init_R)

        # remat: the PE's (B, {32,64,128}, P, S) fp32 activations are ~3.5GB
        # per cloud at the training operating point — recomputing the block
        # in the backward pass trades that for headroom on a 16GB chip. The
        # grouped neighborhoods are kept (checkpoint_name above) so the
        # sort + gather are not re-run.
        RematPE = nn.remat(
            FinePositionalEncoding,
            static_argnums=(2,),
            policy=jax.checkpoint_policies.save_only_these_names("pe_grouped"),
        )
        pe_dtype = self.pe_dtype
        if pe_dtype is None:
            pe_dtype = jnp.float32 if self.pe_neighbor_mode == "first_k" else jnp.bfloat16
        pe = RematPE(
            out_dim=self.hidden_dim,
            r1=self.pe_radius1,
            r2=self.pe_radius2,
            nsample1=self.nsample1,
            nsample2=self.nsample2,
            use_lrf=self.use_lrf,
            use_xyz=self.use_xyz,
            neighbor_mode=self.pe_neighbor_mode,
            compute_dtype=pe_dtype,
            packed=self.pe_packed,
            fused=self.pe_fused,
            name="pe",
        )
        in_proj = nn.Dense(self.hidden_dim, dtype=self.dtype, name="in_proj")
        out_proj = nn.Dense(self.out_dim, dtype=self.dtype, name="out_proj")
        bg_token = self.param("bg_token", nn.initializers.normal(0.02), (1, 1, self.hidden_dim))
        bg = jnp.broadcast_to(bg_token.astype(self.dtype), (B, 1, self.hidden_dim))

        if train:
            # separate PE calls: BatchNorm batch statistics are per-cloud in
            # the reference's training path
            pe1 = pe(p1_aligned, train)
            pe2 = pe(p2, train)
        else:
            # inference BN uses running stats -> one 2B-batched call is
            # exact and halves the per-call cost of this grouping/VPU-bound
            # module
            pe_both = pe(jnp.concatenate([p1_aligned, p2], axis=0), train)
            pe1, pe2 = pe_both[:B], pe_both[B:]
        f1 = in_proj(f1.astype(self.dtype)) + pe1.astype(self.dtype)
        f1 = jnp.concatenate([bg, f1], axis=1)
        f2 = in_proj(f2.astype(self.dtype)) + pe2.astype(self.dtype)
        f2 = jnp.concatenate([bg, f2], axis=1)

        Scanned = nn.scan(
            _FineBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast,) * 4,
            length=self.nblock,
            metadata_params={nn.meta.PARTITION_NAME: None},
        )
        _, (f1s, f2s, scores_s) = Scanned(
            self.hidden_dim,
            self.num_heads,
            self.focusing_factor,
            self.dtype,
            parity_gather=self.parity_gather,
            name="blocks",
        )((f1, f2), geo1, fps_idx1, geo2, fps_idx2)

        blocks = range(self.nblock) if train else [self.nblock - 1]
        attens, scores_l, sals, projs = [], [], [], []
        for idx in blocks:
            f1o = out_proj(f1s[idx]).astype(jnp.float32)
            f2o = out_proj(f2s[idx]).astype(jnp.float32)
            if return_proj and not train:
                # fused-assignment path (ops/assignment_fused.py): the
                # solver rebuilds the similarity matrix tile-by-tile from
                # these features; never materialize the (B, n, n) matrix
                attens.append(None)
                projs.append((f1o, f2o))
                score, sal = _block_outputs(None, scores_s[idx], n1, need_saliency=False)
            else:
                atten = compute_feature_similarity(
                    f1o, f2o, self.sim_type, self.temp, self.normalize_feat
                )
                need_sal = train if with_saliency is None else with_saliency
                score, sal = _block_outputs(atten, scores_s[idx], n1, need_saliency=need_sal)
                attens.append(atten)
            scores_l.append(score)
            sals.append(sal)
        return attens, scores_l, sals, projs
