"""CPU interpret-mode validation of PE-v4 (pe_fused_gather_t) against the
production packed kernel (pe_fused_packed) and the slot-major experiment
(pe_fused_packed_t) on random LRF-normalized clouds.

cd /root/repo && python benchmarks/check_pe_v4.py
"""

from __future__ import annotations

import sys
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from unopose_tpu.ops.ball_query import (
        two_scale_group_first_k_packed,
        two_scale_group_first_k_packed_idx,
    )
    from unopose_tpu.ops.pe_fused import (
        pe_fused_gather_t,
        pe_fused_packed,
        pe_fused_packed_t,
    )

    import os

    rng = np.random.default_rng(7)
    B, N = 2, int(os.environ.get("PE_V4_N", "512"))
    r1, k1, r2, k2 = 0.1, 64, 0.2, 256
    dense = os.environ.get("PE_V4_DENSE", "0") == "1"
    # LRF-normalized-ish cloud: surface patch in the unit ball; the dense
    # config squeezes a band so some blocks hit tiers 1 and 0
    th = rng.uniform(0, np.pi * (float(os.environ.get("PE_V4_BAND", "0.5")) if dense else 1.0), (B, N))
    ph = rng.uniform(0, 2 * np.pi, (B, N))
    rad = 0.8 + 0.05 * rng.standard_normal((B, N))
    pts = np.stack(
        [rad * np.sin(th) * np.cos(ph), rad * np.sin(th) * np.sin(ph), rad * np.cos(th)],
        axis=-1,
    ).astype(np.float32)
    pts_j = jnp.asarray(pts)
    center = (pts_j[..., 0], pts_j[..., 1], pts_j[..., 2])

    mlp_dims = (32, 64, 128)
    w1_mlp, b1_mlp, w2_mlp, b2_mlp = [], [], [], []
    cin = 6
    for d in mlp_dims:
        w1_mlp.append(jnp.asarray(rng.standard_normal((cin, d)).astype(np.float32) * 0.3))
        b1_mlp.append(jnp.asarray(rng.standard_normal((d,)).astype(np.float32) * 0.1))
        w2_mlp.append(jnp.asarray(rng.standard_normal((cin, d)).astype(np.float32) * 0.3))
        b2_mlp.append(jnp.asarray(rng.standard_normal((d,)).astype(np.float32) * 0.1))
        cin = d

    g2, w1, w2, total2, overflow = two_scale_group_first_k_packed(
        r1, k1, r2, k2, pts_j, interpret=True
    )
    print("overflow:", bool(overflow), " total2 max:", int(jnp.max(total2)))
    assert not bool(overflow)

    ref = pe_fused_packed(
        g2, w1, w2, total2, center, w1_mlp, b1_mlp, w2_mlp, b2_mlp, r1, r2,
        interpret=True,
    )
    ref_t = pe_fused_packed_t(
        tuple(jnp.swapaxes(p, 1, 2) for p in g2),
        jnp.swapaxes(w1, 1, 2), jnp.swapaxes(w2, 1, 2), total2, center,
        w1_mlp, b1_mlp, w2_mlp, b2_mlp, r1, r2, interpret=True,
    )

    planes, idx_p, w1i, w2i, total2i, overflow_i = two_scale_group_first_k_packed_idx(
        r1, k1, r2, k2, pts_j, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w1i))
    np.testing.assert_array_equal(np.asarray(w2), np.asarray(w2i))
    np.testing.assert_array_equal(np.asarray(total2), np.asarray(total2i))
    # indices gather back to the materialized planes exactly
    for plane, gref in zip(planes, g2):
        got = np.take_along_axis(
            np.asarray(plane)[:, None, :].repeat(N, 1), np.asarray(idx_p).astype(np.int64), axis=2
        )
        np.testing.assert_array_equal(got, np.asarray(gref))
    print("idx grouping == materialized grouping: OK")

    v4 = pe_fused_gather_t(
        planes, idx_p, w1i, w2i, total2i, center,
        w1_mlp, b1_mlp, w2_mlp, b2_mlp, r1, r2, interpret=True,
    )
    a, b, c = np.asarray(ref), np.asarray(ref_t), np.asarray(v4)
    print("tier mix:", np.unique(np.asarray(jnp.max(total2.reshape(B, -1, 128), -1))))
    for name, x, y in (("v4 vs packed", a, c), ("v4 vs packed_t", b, c)):
        d = np.abs(x - y)
        print(f"{name}: max abs diff {d.max():.3e}  mean {d.mean():.3e}")
    # v4 must match the slot-major reference impl BITWISE (same reduction
    # axes; tier prefixes only drop exact-zero contributions)
    np.testing.assert_array_equal(b, c)
    # vs the point-major kernel only the documented lane-vs-sublane fp
    # reduction order differs (amplified by LRF sign steps on rare frames)
    frac = float(np.mean(~np.isclose(a, c, atol=5e-3, rtol=1e-3)))
    assert frac < 5e-3, f"v4 vs point-major: {frac:.2%} elements off"
    print("PE-v4 interpret validation OK")


if __name__ == "__main__":
    main()
