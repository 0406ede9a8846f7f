"""End-to-end CLI roundtrips for the resize and RLE-decode pipelines.

Complements test_jpeg_pipeline.test_cli_roundtrip: drives the actual
client/server main()s through the reference's file protocol (params.txt,
pubkey/seckey, ciphertext streams -- SURVEY.md 2.4) on tiny images, and
checks the receiving stages self-configure n/t from the wire (no
--cmod/--pmod repeated at every stage, unlike the reference where a flag
mismatch between binaries silently produces garbage).
"""

import os

import numpy as np
import pytest

from fhetpu.io import images

N, T = 2048, 1 << 14


def _write_img(tmp_path, h, w, seed=5):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    path = os.path.join(str(tmp_path), "in.png")
    images.save_rgb(path, img)
    return path, img


def test_resize_cli_roundtrip(tmp_path):
    from fhetpu.cli import client_resize, server_resize
    from fhetpu.pipelines.resize import BILINEAR, resize_float

    d = str(tmp_path)
    img_path, img = _write_img(tmp_path, 6, 6)
    size = ["--width", "3", "--height", "3"]
    # only --send names the ring degree; server and --recieve adopt it
    # from the stream header / params.txt
    client_resize.main(
        ["--send", "-f", img_path, "-c", os.path.join(d, "c2s.bin"),
         "--keydir", os.path.join(d, "keys"), "--cmod", str(N)] + size
    )
    server_resize.main(
        ["-i", os.path.join(d, "c2s.bin"), "-c", os.path.join(d, "s2c.bin"),
         "--keydir", os.path.join(d, "keys"), "--plain-fracts",
         "--platform", "cpu"] + size
    )
    out_png = os.path.join(d, "out.png")
    client_resize.main(
        ["--recieve", "-f", img_path, "-i", os.path.join(d, "s2c.bin"),
         "-o", out_png, "--keydir", os.path.join(d, "keys")] + size
    )
    ours = images.load_rgb(out_png).astype(np.float64)
    want = np.clip(resize_float(img.astype(np.float64), 3, 3, BILINEAR), 0, 255)
    # decrypt+clamp+round vs the pipeline's own plaintext sampler
    # (the printed RMSError line compares vs OpenCV's different half-pixel
    # mapping instead, like the reference's compare_resize_opencv)
    assert images.rms_error(ours, want) < 1.0


def test_resize_cli_sharded_matches_unsharded(tmp_path):
    """server_resize --sharded on the 8-virtual-device mesh produces the
    same decrypted image as the single-device streaming server (VERDICT r3
    missing item 3: the sharded halo engine must be reachable from the real
    driver, with non-divisible row counts)."""
    from fhetpu.cli import client_resize, server_resize
    from fhetpu.pipelines.resize import BILINEAR, resize_float

    d = str(tmp_path)
    img_path, img = _write_img(tmp_path, 6, 6, seed=9)
    size = ["--width", "3", "--height", "3"]
    # n=4096: the encrypted-fract ct*ct variant needs the bigger noise
    # budget (faithful bilinear at n=2048/t=2^14 is noise-dead -- the same
    # regime the reference's sweep avoids)
    client_resize.main(
        ["--send", "-f", img_path, "-c", os.path.join(d, "c2s.bin"),
         "--keydir", os.path.join(d, "keys"), "--cmod", "4096"] + size
    )
    outs = {}
    for variant, extra in (("plain", ["--plain-fracts"]),
                           ("single", ["--plain-fracts"]),
                           ("enc", [])):
        flags = list(extra)
        if variant != "single":
            flags.append("--sharded")
        server_resize.main(
            ["-i", os.path.join(d, "c2s.bin"),
             "-c", os.path.join(d, f"s2c_{variant}.bin"),
             "--keydir", os.path.join(d, "keys"), "--platform", "cpu"]
            + size + flags
        )
        out_png = os.path.join(d, f"out_{variant}.png")
        client_resize.main(
            ["--recieve", "-f", img_path, "-i",
             os.path.join(d, f"s2c_{variant}.bin"), "-o", out_png,
             "--keydir", os.path.join(d, "keys")] + size
        )
        outs[variant] = images.load_rgb(out_png).astype(np.float64)
    # sharded == unsharded exactly; both match the plaintext sampler
    np.testing.assert_array_equal(outs["plain"], outs["single"])
    want = np.clip(resize_float(img.astype(np.float64), 3, 3, BILINEAR), 0, 255)
    assert images.rms_error(outs["plain"], want) < 1.0
    # encrypted-fract ct*ct sharded decodes to the same values
    np.testing.assert_array_equal(outs["enc"], outs["plain"])


def test_resize_cli_streaming_gap_regression(tmp_path):
    """Regression for the streaming-window row-skip bug (VERDICT.md round-2
    item 1): when consecutive output tiles leave a GAP between their source
    row stencils (here 24->8 bilinear, step 3, 2-tap stencil, 4-row tiles:
    source rows 11-12 fall between tile stencils), the gap rows must still be
    consumed from the ciphertext stream -- the reference's sliding window
    always reads every row (fhe_resize.h:353-379).  Skipping desynchronized
    every read after output row 4 (RMS 29.49 instead of 17.96 at the
    reference's own 48->17 benchmark config)."""
    from fhetpu.cli import client_resize, server_resize
    from fhetpu.pipelines.resize import BILINEAR, resize_float

    d = str(tmp_path)
    img_path, img = _write_img(tmp_path, 24, 6)
    size = ["--width", "3", "--height", "8"]
    client_resize.main(
        ["--send", "-f", img_path, "-c", os.path.join(d, "c2s.bin"),
         "--keydir", os.path.join(d, "keys"), "--cmod", str(N)] + size
    )
    server_resize.main(
        ["-i", os.path.join(d, "c2s.bin"), "-c", os.path.join(d, "s2c.bin"),
         "--keydir", os.path.join(d, "keys"), "--plain-fracts",
         "--tile-rows", "4", "--platform", "cpu"] + size
    )
    out_png = os.path.join(d, "out.png")
    client_resize.main(
        ["--recieve", "-f", img_path, "-i", os.path.join(d, "s2c.bin"),
         "-o", out_png, "--keydir", os.path.join(d, "keys")] + size
    )
    ours = images.load_rgb(out_png).astype(np.float64)
    want = np.clip(resize_float(img.astype(np.float64), 8, 3, BILINEAR), 0, 255)
    assert images.rms_error(ours, want) < 1.0


def _fourier_oracle(img, order, degree, delta):
    """Exact-series Fourier reconstruction of each channel in doubles: the
    value BOTH decode server modes must reproduce (the trusted overload sums
    the same per-pair series; the harmonic protocol regroups it by
    linearity).  fhe_decode.h:244-282 semantics incl. the float32(j) quirk."""
    from fhetpu.cli.client_decode import rle_encode
    from fhetpu.pipelines.rle_decode import fourier_harmonics_host

    h0, w0 = img.shape[:2]
    pos = np.arange(h0 * w0, dtype=np.float64)
    out = np.zeros((h0 * w0, 3))
    for c in range(3):
        h = fourier_harmonics_host(rle_encode(img[..., c].reshape(-1)),
                                   order, degree, delta)
        vals = np.full(len(pos), h[0])
        for j in range(1, degree + 1):
            a_j = float(np.float32(j)) * np.pi / float(order)
            vals += h[j] * np.cos(a_j * pos) + h[degree + j] * np.sin(a_j * pos)
        out[:, c] = vals
    return out.reshape(h0, w0, 3)


def _assert_matches_series(out_png, img, order, degree, delta):
    """CLI output must equal trunc+clamp of the exact double-precision
    series to within 1 (the trunc boundary); rms<30 told us nothing
    (VERDICT.md round-2 weak item 6)."""
    ours = images.load_rgb(out_png).astype(np.float64)
    want = np.clip(np.trunc(_fourier_oracle(img, order, degree, delta)),
                   0, 255)
    diff = np.abs(ours - want).max()
    assert diff <= 1.0, diff


def test_decode_cli_roundtrip(tmp_path):
    from fhetpu.cli import client_decode, server_decode

    d = str(tmp_path)
    # constant runs make few RLE pairs -> fast trusted-path server
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:2] = 40
    img[2:] = 200
    img_path = os.path.join(d, "in.png")
    images.save_rgb(img_path, img)
    common = ["--keydir", os.path.join(d, "keys"), "--order", "16"]
    client_decode.main(
        ["--send", "-f", img_path, "-c", os.path.join(d, "c2s.bin"),
         "--cmod", str(N)] + common
    )
    server_decode.main(
        ["-i", os.path.join(d, "c2s.bin"), "-c", os.path.join(d, "s2c.bin"),
         "--degree", "48", "--delta", "0.5", "--platform", "cpu"] + common
    )
    out_png = os.path.join(d, "out.png")
    client_decode.main(
        ["--recieve", "-f", img_path, "-i", os.path.join(d, "s2c.bin"),
         "-o", out_png] + common
    )
    _assert_matches_series(out_png, img, order=16, degree=48, delta=0.5)


def test_bicubic_ct_ct_refuses_small_ring(tmp_path):
    """VERDICT.md item 6 done-criterion: the bicubic ct*ct server at n=2048
    refuses to start with a clear noise message instead of producing the
    reference's RMS-114 garbage (results.txt:64)."""
    from fhetpu.cli import client_resize, server_resize

    d = str(tmp_path)
    img_path, _ = _write_img(tmp_path, 6, 6)
    size = ["--width", "3", "--height", "3", "--bicubic"]
    client_resize.main(
        ["--send", "-f", img_path, "-c", os.path.join(d, "c2s.bin"),
         "--keydir", os.path.join(d, "keys"), "--cmod", str(N)] + size
    )
    with pytest.raises(SystemExit, match="noise budget exhausted"):
        server_resize.main(
            ["-i", os.path.join(d, "c2s.bin"), "-c", os.path.join(d, "s2c.bin"),
             "--keydir", os.path.join(d, "keys"), "--platform", "cpu"] + size
        )


def test_pure_fhe_requires_evalkeys(tmp_path):
    """--pure-fhe without evaluation keys fails fast instead of silently
    running unrelinearized (VERDICT.md round-1 weak item 4)."""
    from fhetpu.cli import client_decode, server_decode

    d = str(tmp_path)
    img = np.full((4, 4, 3), 80, dtype=np.uint8)
    img_path = os.path.join(d, "in.png")
    images.save_rgb(img_path, img)
    client_decode.main(
        ["--send", "-f", img_path, "-c", os.path.join(d, "c2s.bin"),
         "--keydir", os.path.join(d, "keys"), "--cmod", str(N)]
    )
    with pytest.raises(SystemExit, match="evaluation keys"):
        server_decode.main(
            ["-i", os.path.join(d, "c2s.bin"), "-c", os.path.join(d, "s2c.bin"),
             "--keydir", os.path.join(d, "keys"), "--pure-fhe",
             "--platform", "cpu"]
        )


def test_decode_harmonics_cli_roundtrip(tmp_path):
    """Client-side-trig pure-FHE protocol end to end: no secret key server
    side, output matches the Fourier-series reconstruction."""
    from fhetpu.cli import client_decode, server_decode

    d = str(tmp_path)
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:2] = 40
    img[2:] = 200
    img_path = os.path.join(d, "in.png")
    images.save_rgb(img_path, img)
    common = ["--keydir", os.path.join(d, "keys"), "--order", "16"]
    client_decode.main(
        ["--send", "-f", img_path, "-c", os.path.join(d, "c2s.bin"),
         "--cmod", str(N), "--harmonics", "--degree", "48"] + common
    )
    seckey = os.path.join(d, "keys", "seckey.npz")
    os.rename(seckey, seckey + ".hidden")  # prove the server never needs it
    server_decode.main(
        ["-i", os.path.join(d, "c2s.bin"), "-c", os.path.join(d, "s2c.bin"),
         "--platform", "cpu"] + common[:2]
    )
    os.rename(seckey + ".hidden", seckey)
    out_png = os.path.join(d, "out.png")
    client_decode.main(
        ["--recieve", "-f", img_path, "-i", os.path.join(d, "s2c.bin"),
         "-o", out_png] + common
    )
    _assert_matches_series(out_png, img, order=16, degree=48, delta=0.5)


def test_cmod_mismatch_fails_fast(tmp_path):
    from fhetpu.cli import client_jpeg, server_jpeg

    d = str(tmp_path)
    img_path, _ = _write_img(tmp_path, 8, 8)
    client_jpeg.main(
        ["--send", "-f", img_path, "-c", os.path.join(d, "c2s.bin"),
         "--keydir", os.path.join(d, "keys"), "--cmod", str(N)]
    )
    with pytest.raises(SystemExit):
        server_jpeg.main(
            ["-i", os.path.join(d, "c2s.bin"), "-c", os.path.join(d, "s2c.bin"),
             "--keydir", os.path.join(d, "keys"), "--cmod", "8192",
             "--platform", "cpu"]
        )
