"""Image utilities (reference utils/image.py), numpy/JAX based —
no torchvision dependency."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from eventful_transformer_tpu.ops.resize import resize_bilinear


def as_float32(x):
    """uint8 [0,255] -> float32 [0,1] (reference utils/image.py:9-18)."""
    if hasattr(x, "dtype") and x.dtype == np.uint8:
        return np.asarray(x).astype(np.float32) / 255.0
    if type(x) in (tuple, list) and isinstance(x[0], int):
        return type(x)(x_i / 255.0 for x_i in x)
    return np.asarray(x, dtype=np.float32)


def as_uint8(x):
    """float [0,1] -> uint8 (reference utils/image.py:21-28)."""
    x = np.asarray(x)
    if x.dtype != np.uint8:
        x = (x * 255.0).clip(0.0, 255.0).astype(np.uint8)
    return x


def pad_to_size(x, size, pad_value=0.0):
    """Pad the trailing dims of x to ``size`` (bottom/right padding), with a
    scalar or broadcastable pad value (reference utils/image.py:31-49)."""
    x = jnp.asarray(x)
    ndim = len(size)
    pads = [(0, s - d) for s, d in zip(size, x.shape[-ndim:])]
    assert all(p[1] >= 0 for p in pads), (x.shape, size)
    full = [(0, 0)] * (x.ndim - ndim) + pads
    if np.isscalar(pad_value):
        return jnp.pad(x, full, constant_values=pad_value)
    out_shape = x.shape[: x.ndim - ndim] + tuple(size)
    out = jnp.broadcast_to(jnp.asarray(pad_value), out_shape)
    index = tuple(slice(None) for _ in range(x.ndim - ndim)) + tuple(
        slice(0, d) for d in x.shape[-ndim:]
    )
    return out.at[index].set(x)


def rescale(x, scale, antialias=True):
    """Scale the last two dims by ``scale`` (reference utils/image.py:52-61)."""
    if scale == 1.0:
        return x
    size = (round(scale * x.shape[-2]), round(scale * x.shape[-1]))
    return resize_bilinear(jnp.asarray(x), size, antialias=antialias)


def resize_to_fit(x, size, antialias=True):
    """Short-edge-cover resize (reference utils/image.py:64-70)."""
    scale = max(size[0] / x.shape[-2], size[1] / x.shape[-1])
    return rescale(x, scale, antialias=antialias)


def write_image(filename, image):
    """Write an image (C, H, W) or (H, W, C) uint8 via PIL."""
    from PIL import Image

    image = np.asarray(image)
    if image.ndim == 3 and image.shape[0] in (1, 3):
        image = np.moveaxis(image, 0, -1)
    Image.fromarray(as_uint8(image)).save(str(filename))


def write_video(filename, video, fps=30, is_chw=True):
    """Write a video via ffmpeg (reference utils/image.py:91-97 uses
    torchvision; host-side ffmpeg keeps the model path dependency-free)."""
    import subprocess
    import tempfile
    from pathlib import Path

    video = np.asarray(video)
    if is_chw:
        video = np.moveaxis(video, 1, -1)
    video = as_uint8(video)
    with tempfile.TemporaryDirectory() as tmp:
        for t in range(video.shape[0]):
            write_image(Path(tmp) / f"{t:06d}.png", video[t])
        try:
            code = subprocess.call(
                ["ffmpeg", "-y", "-loglevel", "error", "-framerate", str(fps),
                 "-i", str(Path(tmp) / "%06d.png"), str(filename)]
            )
        except FileNotFoundError:
            # No ffmpeg: fall back to an animated GIF via PIL.
            from PIL import Image

            frames = [Image.fromarray(video[t]) for t in range(video.shape[0])]
            gif = Path(filename).with_suffix(".gif")
            frames[0].save(gif, save_all=True, append_images=frames[1:],
                           duration=int(1000 / fps), loop=0)
            print(f"WARNING: ffmpeg not found; wrote {gif} instead", flush=True)
            return
    if code != 0:
        raise RuntimeError(f"ffmpeg failed writing {filename}")
