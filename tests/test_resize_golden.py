"""Interpolation golden tests vs torch: bicubic (A=-0.75, align_corners
False), bilinear, and PIL-style antialiased bilinear — the kernels behind
position-encoding resize and preprocessing."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from eventful_transformer_tpu.ops.resize import (  # noqa: E402
    avg_pool_1d,
    avg_pool_2d,
    resize_bicubic,
    resize_bilinear,
)


@pytest.mark.parametrize(
    "in_size,out_size",
    [((14, 14), (42, 42)), ((14, 14), (13, 13)), ((16, 16), (7, 9)), ((5, 5), (20, 20))],
)
def test_bicubic_matches_torch(rng, in_size, out_size):
    x = rng.standard_normal((2, 3) + in_size).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x), out_size, mode="bicubic", align_corners=False
    ).numpy()
    got = np.asarray(resize_bicubic(x, out_size))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)


@pytest.mark.parametrize(
    "in_size,out_size,antialias",
    [((14, 14), (28, 28), False), ((64, 48), (32, 24), True), ((17, 13), (8, 6), True)],
)
def test_bilinear_matches_torch(rng, in_size, out_size, antialias):
    x = rng.standard_normal((2, 3) + in_size).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x), out_size, mode="bilinear", align_corners=False,
        antialias=antialias,
    ).numpy()
    got = np.asarray(resize_bilinear(x, out_size, antialias=antialias))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)


def test_avg_pool_matches_torch(rng):
    x = rng.standard_normal((2, 3, 8, 12)).astype(np.float32)
    want = F.avg_pool2d(torch.from_numpy(x), (2, 3)).numpy()
    got = np.asarray(avg_pool_2d(x, (2, 3)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    x1 = rng.standard_normal((2, 3, 12)).astype(np.float32)
    want1 = F.avg_pool1d(torch.from_numpy(x1), 3).numpy()
    np.testing.assert_allclose(np.asarray(avg_pool_1d(x1, 3)), want1, rtol=1e-5, atol=1e-6)
