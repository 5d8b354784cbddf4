"""Feature-extraction equivalences: bilinear_gather vs resize-then-gather."""

import numpy as np
import jax
import jax.numpy as jnp

from unopose_tpu.models.feature_extraction import bilinear_gather, get_chosen_pixel_feats


def test_bilinear_gather_matches_resize_gather(rng):
    B, g, C, out = 2, 8, 5, 28
    fmap = jnp.asarray(rng.normal(size=(B, g, g, C)).astype(np.float32))
    choose = jnp.asarray(rng.integers(0, out * out, size=(B, 40)).astype(np.int32))
    dense = jax.image.resize(fmap, (B, out, out, C), method="bilinear")
    want = get_chosen_pixel_feats(dense, choose)
    got = bilinear_gather(fmap, choose, out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_bilinear_gather_corners(rng):
    """Edge pixels must clamp like jax.image.resize."""
    B, g, C, out = 1, 4, 3, 16
    fmap = jnp.asarray(rng.normal(size=(B, g, g, C)).astype(np.float32))
    corners = jnp.asarray([[0, out - 1, out * (out - 1), out * out - 1]], dtype=jnp.int32)
    dense = jax.image.resize(fmap, (B, out, out, C), method="bilinear")
    want = get_chosen_pixel_feats(dense, corners)
    got = bilinear_gather(fmap, corners, out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
