"""Host-side image utilities: PIL/numpy conversion, cropping, input noise.

Behavioral parity with the reference's utils/common_utils.py:12-262 and
utils/denoising_utils.py:4-27 (image format: numpy float32 (C, H, W) in
[0, 1]); the device-side format used throughout this framework is NHWC.
"""

from __future__ import annotations

import numpy as np

try:  # PIL is host-side only; keep importable without it.
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


# ---------------------------------------------------------------------------
# numpy <-> PIL <-> device layout converters
# ---------------------------------------------------------------------------

def pil_to_np(img_pil) -> np.ndarray:
    """PIL image -> float32 (C, H, W) in [0, 1] (ref utils/common_utils.py:179)."""
    ar = np.array(img_pil)
    if ar.ndim == 3:
        ar = ar.transpose(2, 0, 1)
    else:
        ar = ar[None, ...]
    return ar.astype(np.float32) / 255.0


def np_to_pil(img_np: np.ndarray):
    """float32 (C, H, W) in [0,1] -> PIL image (ref utils/common_utils.py:194)."""
    if Image is None:  # pragma: no cover
        raise RuntimeError("PIL not available")
    ar = np.clip(img_np * 255, 0, 255).astype(np.uint8)
    if img_np.shape[0] == 1:
        ar = ar[0]
    else:
        ar = ar.transpose(1, 2, 0)
    return Image.fromarray(ar)


def chw_to_nhwc(img_np: np.ndarray) -> np.ndarray:
    """(C, H, W) -> (1, H, W, C): the TPU-friendly device layout."""
    return np.ascontiguousarray(img_np.transpose(1, 2, 0))[None]


def nhwc_to_chw(x: np.ndarray) -> np.ndarray:
    """(1, H, W, C) -> (C, H, W) numpy, for npz-artifact parity."""
    return np.asarray(x)[0].transpose(2, 0, 1)


# ---------------------------------------------------------------------------
# cropping / loading
# ---------------------------------------------------------------------------

def crop_image(img_pil, d: int = 32):
    """Center-crop a PIL image so dimensions are divisible by ``d``
    (ref utils/common_utils.py:12-26)."""
    w, h = img_pil.size
    new_w, new_h = w - w % d, h - h % d
    bbox = (
        int((w - new_w) / 2),
        int((h - new_h) / 2),
        int((w + new_w) / 2),
        int((h + new_h) / 2),
    )
    return img_pil.crop(bbox)


def crop_np(img_np: np.ndarray, d: int = 32) -> np.ndarray:
    """Center-crop a (C, H, W) array so H and W are divisible by ``d``."""
    _, h, w = img_np.shape
    nh, nw = h - h % d, w - w % d
    top, left = (h - nh) // 2, (w - nw) // 2
    return img_np[:, top:top + nh, left:left + nw]


def load_image(path: str, imsize=-1) -> np.ndarray:
    """Load an image file, optionally resizing (ref utils/common_utils.py:102-122).

    Returns float32 (C, H, W) in [0, 1].
    """
    if Image is None:  # pragma: no cover
        raise RuntimeError("PIL not available")
    img = Image.open(path)
    if isinstance(imsize, int):
        imsize = (imsize, imsize)
    if imsize[0] != -1 and img.size != imsize:
        if imsize[0] > img.size[0]:
            img = img.resize(imsize, Image.BICUBIC)
        else:
            img = img.resize(imsize, Image.LANCZOS)
    return pil_to_np(img)


# ---------------------------------------------------------------------------
# input noise synthesis
# ---------------------------------------------------------------------------

def get_noise(input_depth: int, spatial_size, noise_type: str = "u",
              var: float = 0.1, rng: np.random.Generator | None = None
              ) -> np.ndarray:
    """Random DIP input tensor of shape (1, H, W, input_depth), scaled by
    ``var`` (ref utils/common_utils.py:134-176 — uniform[0,1] * 0.1 default).

    Returned in NHWC; generated host-side once per fit.
    """
    if isinstance(spatial_size, int):
        spatial_size = (spatial_size, spatial_size)
    rng = rng or np.random.default_rng()
    shape = (1, spatial_size[0], spatial_size[1], input_depth)
    if noise_type == "u":
        x = rng.random(shape, dtype=np.float32)
    elif noise_type == "n":
        x = rng.standard_normal(shape, dtype=np.float32)
    else:
        raise ValueError(f"unknown noise_type {noise_type!r}")
    return x * var


def get_meshgrid(spatial_size) -> np.ndarray:
    """Meshgrid input (1, H, W, 2) (ref utils/common_utils.py:164-167)."""
    if isinstance(spatial_size, int):
        spatial_size = (spatial_size, spatial_size)
    X, Y = np.meshgrid(
        np.arange(0, spatial_size[1]) / float(spatial_size[1] - 1),
        np.arange(0, spatial_size[0]) / float(spatial_size[0] - 1),
    )
    return np.stack([X, Y], axis=-1).astype(np.float32)[None]


# ---------------------------------------------------------------------------
# corruption models (ref utils/denoising_utils.py:4-27)
# ---------------------------------------------------------------------------

def add_gaussian_noise(img_np: np.ndarray, sigma: float,
                       rng: np.random.Generator | None = None) -> np.ndarray:
    """Gaussian corruption clipped to [0, 1] (ref utils/denoising_utils.py:4)."""
    rng = rng or np.random.default_rng()
    noisy = img_np + rng.normal(scale=sigma, size=img_np.shape)
    return np.clip(noisy, 0, 1).astype(np.float32)


def add_poisson_noise(img_np: np.ndarray, lam: float,
                      rng: np.random.Generator | None = None) -> np.ndarray:
    """Poisson corruption (ref utils/denoising_utils.py:17-27)."""
    rng = rng or np.random.default_rng()
    noisy = img_np + rng.poisson(lam=lam, size=img_np.shape) / 255.0
    return np.clip(noisy, 0, 1).astype(np.float32)


def put_in_center(img_np: np.ndarray, target_size) -> np.ndarray:
    """Zero-pad a (C,H,W) image into the center of target_size
    (ref utils/sr_utils.py:put_in_center)."""
    out = np.zeros((img_np.shape[0], target_size[0], target_size[1]),
                   np.float32)
    top = (target_size[0] - img_np.shape[1]) // 2
    left = (target_size[1] - img_np.shape[2]) // 2
    out[:, top:top + img_np.shape[1], left:left + img_np.shape[2]] = img_np
    return out


def load_lr_hr_imgs_sr(fname: str, imsize=-1, factor: int = 4,
                       enforce_div32: str | None = None) -> dict:
    """Load an HR image + anti-aliased LR version (ref utils/sr_utils.py:
    load_LR_HR_imgs_sr). Returns {'orig_np', 'HR_np', 'LR_np'}."""
    if Image is None:  # pragma: no cover
        raise RuntimeError("PIL not available")
    orig_np = load_image(fname, imsize)
    hr = orig_np
    if enforce_div32 == "CROP":
        hr = crop_np(orig_np, 32)
    hr_pil = np_to_pil(hr)
    lr_pil = hr_pil.resize((hr.shape[2] // factor, hr.shape[1] // factor),
                           Image.LANCZOS)
    return {"orig_np": orig_np, "HR_np": hr, "LR_np": pil_to_np(lr_pil)}


def sr_baselines(lr_np: np.ndarray, hr_shape) -> dict:
    """Bicubic / sharpened-bicubic / nearest SR baselines
    (ref utils/sr_utils.py:get_baselines)."""
    from PIL import ImageFilter
    lr_pil = np_to_pil(lr_np)
    size = (hr_shape[2], hr_shape[1])
    bic = lr_pil.resize(size, Image.BICUBIC)
    near = lr_pil.resize(size, Image.NEAREST)
    sharp = bic.filter(ImageFilter.UnsharpMask())
    return {"bicubic": pil_to_np(bic), "bicubic_sharp": pil_to_np(sharp),
            "nearest": pil_to_np(near)}


def normalize01(x: np.ndarray) -> np.ndarray:
    """Min-max normalize (ref utils/common_utils.py:96-99)."""
    x = x - x.min()
    m = x.max()
    return x / m if m > 0 else x
