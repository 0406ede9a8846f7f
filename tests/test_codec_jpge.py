"""jpge-equivalent configurable encoder (SURVEY.md C22): quality + chroma
subsampling modes, validated by decoding the emitted JFIF stream with
PIL/libjpeg.  The reference consumes jpge only in the unbuilt
tests/encode.cpp (16x16 grayscale text image, Y_ONLY, quality 90)."""

import io

import numpy as np
from PIL import Image

from fhetpu.codec import jpeg as J


def _smooth_rgb(seed=0, blocks=6):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(blocks, blocks, 3)).astype(np.float64)
    return np.clip(np.kron(base, np.ones((8, 8, 1))), 0, 255).astype(np.uint8)


def test_jpge_all_subsampling_modes_decode():
    img = _smooth_rgb()
    for mode, min_ratio in ((J.Y_ONLY, 0), (J.H1V1, 0), (J.H2V1, 0),
                            (J.H2V2, 0)):
        data = J.jpge_encode(img, quality=90, subsampling=mode)
        dec = Image.open(io.BytesIO(data))
        assert dec.size == (48, 48)
        arr = np.asarray(dec.convert("RGB")).astype(np.float64)
        if mode == J.Y_ONLY:
            gray = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
            rms = np.sqrt(((arr[..., 0] - gray) ** 2).mean())
            assert rms < 2.0, rms
        else:
            rms = np.sqrt(((arr - img.astype(np.float64)) ** 2).mean())
            assert rms < 20.0, (mode, rms)


def test_jpge_subsampled_streams_are_smaller():
    img = _smooth_rgb(seed=3)
    sizes = {m: len(J.jpge_encode(img, quality=90, subsampling=m))
             for m in (J.Y_ONLY, J.H1V1, J.H2V2)}
    assert sizes[J.Y_ONLY] < sizes[J.H2V2] < 2 * sizes[J.H1V1]


def test_jpge_reference_scenario_gray16():
    """tests/encode.cpp raymond_average: 16x16 grayscale, Y_ONLY, q=90."""
    rng = np.random.default_rng(5)
    g = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    data = J.jpge_encode(g, quality=90, subsampling=J.Y_ONLY)
    dec = np.asarray(Image.open(io.BytesIO(data)).convert("L")).astype(float)
    assert np.sqrt(((dec - g) ** 2).mean()) < 8.0  # q90 noise image


def test_jpge_odd_sizes_edge_replicate():
    img = _smooth_rgb(seed=1)[:41, :35]
    for mode in (J.H2V2, J.H2V1, J.H1V1, J.Y_ONLY):
        dec = Image.open(io.BytesIO(J.jpge_encode(img, 85, mode)))
        assert dec.size == (35, 41)


def test_jpge_no_chroma_discrim():
    img = _smooth_rgb(seed=2)
    a = J.jpge_encode(img, 40, J.H1V1, no_chroma_discrim=False)
    b = J.jpge_encode(img, 40, J.H1V1, no_chroma_discrim=True)
    ra = np.asarray(Image.open(io.BytesIO(a)).convert("RGB")).astype(float)
    rb = np.asarray(Image.open(io.BytesIO(b)).convert("RGB")).astype(float)
    ref = img.astype(float)
    # luma-table chroma quantizes chroma finer -> at least as accurate
    assert ((rb - ref) ** 2).mean() <= ((ra - ref) ** 2).mean() + 1e-9
