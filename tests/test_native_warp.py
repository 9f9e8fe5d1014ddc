"""Native fused warp+normalize (native/warp.cpp): build + parity with the
cv2-based Python preprocessing chain in datasets/images.py.

The Python chain rounds the warped frame to uint8 (cv2.warpAffine output
dtype) and uses 5-bit fixed-point bilinear coefficients; the native path
keeps float precision end-to-end, so warp parity is to ~1 uint8 quantum
in normalized units, while the no-warp normalize is float-exact.
"""

import numpy as np
import pytest

from faster_voxelpose_tpu.datasets.images import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    normalize_image,
    preprocess_view_native,
)
from faster_voxelpose_tpu.native.build import (
    load_warp_lib,
    normalize_u8_native,
    warp_normalize_native,
)

cv2 = pytest.importorskip("cv2")

# one uint8 quantum after /255 and /std, plus fixed-point slack
ATOL_WARP = 1.5 / 255.0 / float(IMAGENET_STD.min())


@pytest.fixture(scope="module")
def lib():
    if load_warp_lib() is None:
        pytest.skip("no C++ toolchain")
    return True


def _python_chain(img_bgr, transform, size, color_rgb):
    img = img_bgr
    if color_rgb:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if transform is not None:
        img = cv2.warpAffine(
            img, transform.astype(np.float32), size, flags=cv2.INTER_LINEAR
        )
    return normalize_image(img)


def test_normalize_parity(lib):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (48, 64, 3), np.uint8)
    for swap in (False, True):
        ours = normalize_u8_native(img, IMAGENET_MEAN, IMAGENET_STD, swap)
        ref = _python_chain(img, None, None, swap)
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_warp_parity_resize(lib):
    """Downscale warp (the preprocess resize case), both channel orders."""
    from faster_voxelpose_tpu.geometry.transforms import get_resize_transform

    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (288, 360, 3), np.uint8)
    W, H = 160, 128
    t = get_resize_transform((360, 288), (W, H))
    inv = cv2.invertAffineTransform(t.astype(np.float64))
    for swap in (False, True):
        ours = warp_normalize_native(
            img, (W, H), inv, IMAGENET_MEAN, IMAGENET_STD, swap
        )
        ref = _python_chain(img, t, (W, H), swap)
        assert ours.shape == ref.shape == (H, W, 3)
        np.testing.assert_allclose(ours, ref, atol=ATOL_WARP)
        # aggregate agreement is much tighter than the worst pixel
        assert np.abs(ours - ref).mean() < ATOL_WARP / 4


def test_warp_zero_border(lib):
    """Out-of-source samples must match cv2's BORDER_CONSTANT(0)."""
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (32, 32, 3), np.uint8)
    # shift far enough that part of the output reads outside the source
    t = np.array([[1.0, 0.0, 20.0], [0.0, 1.0, -12.0]], np.float64)
    inv = cv2.invertAffineTransform(t)
    ours = warp_normalize_native(
        img, (32, 32), inv, IMAGENET_MEAN, IMAGENET_STD, True
    )
    ref = _python_chain(img, t, (32, 32), True)
    np.testing.assert_allclose(ours, ref, atol=ATOL_WARP)


def test_normalize_images_device_parity():
    """On-device uint8 normalize (normalize_images_device) matches the
    host chain (BGR->RGB swap + normalize_image) to float rounding."""
    from faster_voxelpose_tpu.datasets.images import normalize_images_device

    rng = np.random.RandomState(11)
    u8 = rng.randint(0, 256, (2, 3, 16, 24, 3), np.uint8)  # (B,V,H,W,3) BGR
    dev = np.asarray(normalize_images_device(u8, color_rgb=True))
    host = np.stack(
        [
            np.stack([normalize_image(v[..., ::-1]) for v in b])
            for b in u8
        ]
    )
    np.testing.assert_allclose(dev, host, atol=1e-5)
    # no-swap mode
    dev = np.asarray(normalize_images_device(u8[0], color_rgb=False))
    host = np.stack([normalize_image(v) for v in u8[0]])
    np.testing.assert_allclose(dev, host, atol=1e-5)


def test_load_view_images_u8_raw(lib, tmp_path):
    """The uint8 loader returns the decoded/warped BGR frame untouched."""
    from faster_voxelpose_tpu.datasets.images import load_view_images_u8
    from faster_voxelpose_tpu.geometry.transforms import get_resize_transform

    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, (64, 96, 3), np.uint8)
    p = str(tmp_path / "v.png")
    assert cv2.imwrite(p, img)
    out = load_view_images_u8([p], (96, 64))
    assert out.dtype == np.uint8 and out.shape == (1, 64, 96, 3)
    np.testing.assert_array_equal(out[0], img)  # PNG is lossless

    raw = rng.randint(0, 256, (120, 180, 3), np.uint8)
    p2 = str(tmp_path / "raw.png")
    assert cv2.imwrite(p2, raw)
    t = get_resize_transform((180, 120), (96, 64))
    out = load_view_images_u8([p2], (96, 64), t)
    ref = cv2.warpAffine(raw, t.astype(np.float32), (96, 64),
                         flags=cv2.INTER_LINEAR)
    np.testing.assert_array_equal(out[0], ref)


def test_load_view_images_fallback_parity(lib, tmp_path, monkeypatch):
    """load_view_images produces the same frames with and without the
    native kernel (pure-Python fallback path, toolchain-free boxes)."""
    from faster_voxelpose_tpu.datasets.images import load_view_images
    from faster_voxelpose_tpu.geometry.transforms import get_resize_transform
    from faster_voxelpose_tpu.native import build

    rng = np.random.RandomState(7)
    paths = []
    for i, shape in enumerate([(64, 96, 3), (120, 180, 3)]):
        p = str(tmp_path / f"view{i}.png")
        assert cv2.imwrite(p, rng.randint(0, 256, shape, np.uint8))
        paths.append(p)
    t = get_resize_transform((180, 120), (96, 64))

    native = load_view_images(paths, (96, 64), t, color_rgb=True)
    monkeypatch.setattr(build, "load_warp_lib", lambda: None)
    python = load_view_images(paths, (96, 64), t, color_rgb=True)
    assert native.shape == python.shape == (2, 64, 96, 3)
    np.testing.assert_allclose(native, python, atol=1e-5)


def test_preprocess_view_native_dispatch(lib):
    """The images.py wrapper (cv2 SIMD warp on the BGR frame + native
    fused normalize/swap) matches the Python chain near-exactly: the
    warp commutes with the channel swap, so both paths share cv2's
    fixed-point rounding and only float normalization order differs."""
    from faster_voxelpose_tpu.geometry.transforms import get_resize_transform

    rng = np.random.RandomState(3)
    at_size = rng.randint(0, 256, (64, 96, 3), np.uint8)
    out = preprocess_view_native(at_size, (96, 64), None, True)
    np.testing.assert_allclose(
        out, _python_chain(at_size, None, None, True), atol=1e-5
    )

    raw = rng.randint(0, 256, (120, 180, 3), np.uint8)
    t = get_resize_transform((180, 120), (96, 64))
    out = preprocess_view_native(raw, (96, 64), t, True)
    np.testing.assert_allclose(
        out, _python_chain(raw, t, (96, 64), True), atol=1e-5
    )
