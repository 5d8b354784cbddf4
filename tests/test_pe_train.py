"""Oracle tests for the fused train-path PE MLP/BN/pool stack
(ops/pe_train.py): forward values, batch statistics, and parameter
gradients must match the pure-JAX/flax formulation the XLA train path uses
(einsum -> flax BatchNorm(train) -> ReLU -> max over samples)."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from unopose_tpu.ops.pe_train import pe_mlp_bn_pool_train

DIMS = (32, 64, 128)


class _RefStack(nn.Module):
    """The exact XLA train formulation of one PE scale (matching.py _scale
    with use_bn=True, mask=None), parameterized externally."""

    @nn.compact
    def __call__(self, chans):  # (B, 6, P, S)
        h = chans
        for i, d in enumerate(DIMS):
            W = self.param(f"fc{i}", nn.initializers.he_normal(), (h.shape[1], d))
            h = jnp.einsum("bcps,cd->bdps", h.astype(jnp.float32), W)
            h = nn.BatchNorm(
                use_running_average=False, momentum=0.9, epsilon=1e-5, axis=1,
                dtype=jnp.float32, name=f"bn{i}",
            )(h)
            h = nn.relu(h)
        return jnp.max(h, axis=3)  # (B, d3, P)


def _setup(rng, B=2, P=64, S=64):
    chans = jnp.asarray(rng.standard_normal((B, 6, P, S)).astype(np.float32))
    ref = _RefStack()
    variables = ref.init(jax.random.PRNGKey(0), chans)
    # randomize params so BN affines are non-trivial
    params = jax.tree_util.tree_map(
        lambda x: x + 0.3 * jnp.asarray(rng.standard_normal(x.shape), x.dtype), variables["params"]
    )
    variables = {"params": params, "batch_stats": variables["batch_stats"]}
    Ws = [params[f"fc{i}"] for i in range(3)]
    gammas = [params[f"bn{i}"]["scale"] for i in range(3)]
    betas = [params[f"bn{i}"]["bias"] for i in range(3)]
    return chans, ref, variables, Ws, gammas, betas


def test_pe_train_forward_and_stats(rng):
    chans, ref, variables, Ws, gammas, betas = _setup(rng)
    want, mut = ref.apply(variables, chans, mutable=["batch_stats"])
    (pooled, (mus, vars_)) = pe_mlp_bn_pool_train(chans, Ws, gammas, betas, interpret=True)
    got = jnp.swapaxes(pooled[..., : DIMS[-1]], 1, 2)  # (B, d3, P)
    err = np.abs(np.asarray(got) - np.asarray(want))
    assert np.median(err) < 2e-2, np.median(err)
    assert np.quantile(err, 0.99) < 0.15, np.quantile(err, 0.99)
    # batch stats: flax stores ra = 0.9*init + 0.1*batch; recover batch stats
    for i in range(3):
        bs = mut["batch_stats"][f"bn{i}"]
        batch_mean = (np.asarray(bs["mean"]) - 0.9 * 0.0) / 0.1
        batch_var = (np.asarray(bs["var"]) - 0.9 * 1.0) / 0.1
        # scale-relative: the fused stats run bf16 contractions (like the
        # TPU XLA path); the CPU reference here is true fp32
        ms = np.abs(batch_mean).max() + 1e-6
        vs = np.abs(batch_var).max() + 1e-6
        assert np.abs(np.asarray(mus[i]) - batch_mean).max() / ms < 3e-2, i
        assert np.abs(np.asarray(vars_[i]) - batch_var).max() / vs < 5e-2, i


def _grad_errs(rng, chans, ref, variables, Ws, gammas, betas):
    R = jnp.asarray(rng.standard_normal((2, DIMS[-1], 64)).astype(np.float32))

    def loss_ref(params):
        out, _ = ref.apply(
            {"params": params, "batch_stats": variables["batch_stats"]}, chans, mutable=["batch_stats"]
        )
        return jnp.sum(out * R)

    g_ref = jax.grad(loss_ref)(variables["params"])

    def loss_fused(Ws, gammas, betas):
        pooled, _ = pe_mlp_bn_pool_train(chans, Ws, gammas, betas, interpret=True)
        out = jnp.swapaxes(pooled[..., : DIMS[-1]], 1, 2)
        return jnp.sum(out * R)

    gW, gG, gB = jax.grad(loss_fused, argnums=(0, 1, 2))(Ws, gammas, betas)
    errs = {}
    for i in range(3):
        for name, got, want in (
            (f"W{i}", gW[i], g_ref[f"fc{i}"]),
            (f"gamma{i}", gG[i], g_ref[f"bn{i}"]["scale"]),
            (f"beta{i}", gB[i], g_ref[f"bn{i}"]["bias"]),
        ):
            got = np.asarray(got)
            want = np.asarray(want)
            errs[name] = np.abs(got - want) / (np.abs(want).max() + 1e-6)
    return errs


def test_pe_train_grads_exact_fp32(rng):
    """With fp32 contractions the custom VJP must reproduce jax autodiff of
    the flax formulation to float rounding — gates the BN-backward MATH."""
    import unopose_tpu.ops.pe_train as pt

    chans, ref, variables, Ws, gammas, betas = _setup(rng)
    old = pt._MM_DTYPE
    try:
        pt._MM_DTYPE = jnp.float32
        errs = _grad_errs(rng, chans, ref, variables, Ws, gammas, betas)
    finally:
        pt._MM_DTYPE = old
    for name, err in errs.items():
        assert err.max() < 1e-4, (name, err.max())


def test_pe_train_model_path_matches_xla(rng):
    """Model-level: FinePositionalEncoding with the fused train path
    (fused=True -> interpret off TPU) matches the XLA train formulation on
    outputs, updated batch_stats, and parameter grads."""
    from unopose_tpu.models.matching import FinePositionalEncoding

    v = rng.normal(size=(2, 256, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    pts = jnp.asarray((0.5 * v + rng.normal(size=(2, 256, 3)) * 2e-3).astype(np.float32))
    kw = dict(out_dim=32, r1=0.12, r2=0.24, nsample1=16, nsample2=64, neighbor_mode="first_k")
    pe_x = FinePositionalEncoding(fused=False, **kw)
    pe_f = FinePositionalEncoding(fused=True, **kw)
    variables = pe_x.init(jax.random.PRNGKey(0), pts, train=True)
    # fused path declares the identical tree
    vf = pe_f.init(jax.random.PRNGKey(0), pts, train=True)
    assert jax.tree_util.tree_structure(vf) == jax.tree_util.tree_structure(variables)

    def run(pe, params):
        out, mut = pe.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pts, train=True, mutable=["batch_stats"],
        )
        return out, mut

    out_x, mut_x = run(pe_x, variables["params"])
    out_f, mut_f = run(pe_f, variables["params"])
    err = np.abs(np.asarray(out_f) - np.asarray(out_x))
    assert np.median(err) < 2e-2, np.median(err)
    assert np.quantile(err, 0.99) < 0.2, np.quantile(err, 0.99)
    for k in mut_x["batch_stats"]:
        a = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(mut_x["batch_stats"][k])])
        b = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(mut_f["batch_stats"][k])])
        assert np.abs(a - b).max() / (np.abs(a).max() + 1e-6) < 5e-2, k

    def loss(pe, params):
        out, _ = run(pe, params)
        return jnp.sum(out * out)

    g_x = jax.grad(lambda p: loss(pe_x, p))(variables["params"])
    g_f = jax.grad(lambda p: loss(pe_f, p))(variables["params"])
    for k in g_x:
        for leaf_x, leaf_f in zip(jax.tree_util.tree_leaves(g_x[k]), jax.tree_util.tree_leaves(g_f[k])):
            ex = np.abs(np.asarray(leaf_f) - np.asarray(leaf_x)) / (np.abs(np.asarray(leaf_x)).max() + 1e-6)
            assert np.median(ex) < 6e-2, (k, np.median(ex))
            assert ex.max() < 0.5, (k, ex.max())


def test_pe_train_grads_bf16_distribution(rng):
    """Production bf16 contractions (the TPU XLA train path's effective
    precision) vs the CPU true-fp32 reference: boundary ReLU-gate /
    max-pool-tie flips produce rare outliers; gate the distribution."""
    chans, ref, variables, Ws, gammas, betas = _setup(rng)
    errs = _grad_errs(rng, chans, ref, variables, Ws, gammas, betas)
    for name, err in errs.items():
        assert np.median(err) < 6e-2, (name, np.median(err))
        assert np.quantile(err, 0.95) < 0.15, (name, np.quantile(err, 0.95))
        assert err.max() < 0.5, (name, err.max())


class _RefStackFrozen(nn.Module):
    """XLA formulation with FROZEN BN (use_running_average=True in train)."""

    @nn.compact
    def __call__(self, chans):
        h = chans
        for i, d in enumerate(DIMS):
            W = self.param(f"fc{i}", nn.initializers.he_normal(), (h.shape[1], d))
            h = jnp.einsum("bcps,cd->bdps", h.astype(jnp.float32), W)
            h = nn.BatchNorm(
                use_running_average=True, momentum=0.9, epsilon=1e-5, axis=1,
                dtype=jnp.float32, name=f"bn{i}",
            )(h)
            h = nn.relu(h)
        return jnp.max(h, axis=3)


def test_pe_train_frozen_grads_exact_fp32(rng):
    """Frozen-BN fast-train variant: with fp32 contractions the custom VJP
    must reproduce jax autodiff of the frozen-BN flax formulation to float
    rounding (1 fwd + 1 bwd kernel pass instead of the exact path's 8)."""
    import unopose_tpu.ops.pe_train as pt
    from unopose_tpu.ops.pe_train import pe_mlp_bn_pool_frozen

    chans = jnp.asarray(rng.standard_normal((2, 6, 64, 64)).astype(np.float32))
    ref = _RefStackFrozen()
    variables = ref.init(jax.random.PRNGKey(0), chans)
    params = jax.tree_util.tree_map(
        lambda x: x + 0.3 * jnp.asarray(rng.standard_normal(x.shape), x.dtype), variables["params"]
    )
    stats = jax.tree_util.tree_map(
        lambda x: x + 0.2 * jnp.abs(jnp.asarray(rng.standard_normal(x.shape), x.dtype)),
        variables["batch_stats"],
    )
    Ws = [params[f"fc{i}"] for i in range(3)]
    gammas = [params[f"bn{i}"]["scale"] for i in range(3)]
    betas = [params[f"bn{i}"]["bias"] for i in range(3)]
    means = [stats[f"bn{i}"]["mean"] for i in range(3)]
    vars_ = [stats[f"bn{i}"]["var"] for i in range(3)]
    R = jnp.asarray(rng.standard_normal((2, DIMS[-1], 64)).astype(np.float32))

    def loss_ref(params):
        out = ref.apply({"params": params, "batch_stats": stats}, chans)
        return jnp.sum(out * R)

    g_ref = jax.grad(loss_ref)(params)

    old = pt._MM_DTYPE
    try:
        pt._MM_DTYPE = jnp.float32

        def loss_fused(Ws, gammas, betas):
            pooled = pe_mlp_bn_pool_frozen(chans, Ws, gammas, betas, means, vars_, interpret=True)
            out = jnp.swapaxes(pooled[..., : DIMS[-1]], 1, 2)
            return jnp.sum(out * R)

        val_f = loss_fused(Ws, gammas, betas)
        assert np.isclose(float(val_f), float(loss_ref(params)), rtol=1e-5)
        gW, gG, gB = jax.grad(loss_fused, argnums=(0, 1, 2))(Ws, gammas, betas)
    finally:
        pt._MM_DTYPE = old
    for i in range(3):
        for name, got, want in (
            (f"W{i}", gW[i], g_ref[f"fc{i}"]),
            (f"gamma{i}", gG[i], g_ref[f"bn{i}"]["scale"]),
            (f"beta{i}", gB[i], g_ref[f"bn{i}"]["bias"]),
        ):
            err = np.abs(np.asarray(got) - np.asarray(want)) / (np.abs(np.asarray(want)).max() + 1e-6)
            assert err.max() < 1e-4, (name, err.max())
