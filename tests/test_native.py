"""Native host-ops: build, and equivalence with the numpy fallbacks."""

import numpy as np
import pytest

from unopose_tpu.data import native
from unopose_tpu.data.preprocess import binary_mask_to_rle, rle_to_binary_mask


def test_native_builds():
    assert native.have_native(), "native hostops failed to build"


def test_rle_roundtrip(rng):
    mask = rng.random((37, 53)) > 0.6
    rle = binary_mask_to_rle(mask)
    out = rle_to_binary_mask(rle)
    np.testing.assert_array_equal(out, mask)


def test_rle_decode_matches_python(rng):
    counts = [5, 3, 10, 2, 100, 7]
    size = (11, 13)
    got = native.rle_decode(counts, size)
    flat = np.zeros(size[0] * size[1], bool)
    pos = 0
    for i, c in enumerate(counts):
        if i % 2 == 1:
            flat[pos : pos + c] = True
        pos += c
    np.testing.assert_array_equal(got, flat.reshape(size, order="F"))


def test_compressed_rle_roundtrip(rng):
    """Encode counts with the COCO scheme in python, decode natively."""
    counts = [0, 4, 17, 1000, 3, 2]

    def encode(cnts):
        s = []
        for i, x in enumerate(cnts):
            if i > 2:
                x -= cnts[i - 2]
            more = True
            while more:
                c = x & 0x1F
                x >>= 5
                more = not (x == 0 and not (c & 0x10)) and not (x == -1 and (c & 0x10))
                if more:
                    c |= 0x20
                s.append(chr(c + 48))
        return "".join(s)

    got = native.rle_decompress_counts(encode(counts))
    np.testing.assert_array_equal(got, counts)


def test_mask_nonzero(rng):
    m = (rng.random((20, 30)) > 0.5).astype(np.uint8)
    np.testing.assert_array_equal(native.mask_nonzero(m), np.flatnonzero(m))


def test_backproject_choose_matches_numpy(rng):
    from unopose_tpu.data.preprocess import backproject_np

    K = np.array([[500.0, 0, 320], [0, 505.0, 240], [0, 0, 1]])
    depth = rng.uniform(0.5, 2.0, size=(480, 640)).astype(np.float32)
    bbox = [100, 180, 200, 280]
    crop = depth[bbox[0] : bbox[1], bbox[2] : bbox[3]]
    choose = rng.integers(0, crop.size, size=200)
    want = backproject_np(depth, K, bbox).reshape(-1, 3)[choose]
    got = native.backproject_choose(crop, bbox, choose, K)
    np.testing.assert_allclose(got, want, atol=1e-4)
