"""Image ingest/output + 8x8 block utilities (SURVEY.md C7/C13 equivalents).

Replaces the reference's stb_image loading (client_jpeg.cpp:76), OpenCV PNG
save (fhe_resize.h:100-117), and split_image_eight_block (fhe_image.h:108-124)
with PIL + vectorized numpy.  Like the reference, images are assumed to have
dimensions divisible by 8 for the JPEG path (no padding).
"""

from __future__ import annotations

import numpy as np


def load_rgb(path: str) -> np.ndarray:
    """uint8 [H, W, 3] (stbi_load(..., 3) equivalent)."""
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), dtype=np.uint8)


def save_rgb(path: str, arr: np.ndarray):
    from PIL import Image

    Image.fromarray(arr.astype(np.uint8), mode="RGB").save(path)


def decode_jpeg_bytes(data: bytes) -> np.ndarray:
    import io as _io

    from PIL import Image

    return np.asarray(Image.open(_io.BytesIO(data)).convert("RGB"), dtype=np.uint8)


def split_blocks(channel: np.ndarray) -> np.ndarray:
    """[H, W] -> [nblocks, 64] in the reference's row-major block order
    (blocks scan left-to-right, top-to-bottom; within a block row-major)."""
    h, w = channel.shape
    assert h % 8 == 0 and w % 8 == 0, "image dims must be divisible by 8"
    return (
        channel.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 64)
    )


def merge_blocks(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (
        blocks.reshape(h // 8, w // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(h, w)
    )


def rms_error(a: np.ndarray, b: np.ndarray) -> float:
    """RMS over all interleaved samples (fhe_image.h:508-521 semantics)."""
    d = a.astype(np.int64) - b.astype(np.int64)
    return float(np.sqrt(np.mean(d.astype(np.float64) ** 2)))


def print_image(img: np.ndarray, file=None) -> str:
    """Debug grid printer (fhe_image.h:126-138 print_image equivalent):
    one row per line, integer-formatted samples."""
    import sys

    lines = [" ".join(f"{int(round(float(v))):4d}" for v in row)
             for row in np.asarray(img).reshape(img.shape[0], -1)]
    text = "\n".join(lines)
    print(text, file=file or sys.stdout)
    return text


def print_blocks(blocks: np.ndarray, file=None) -> str:
    """Debug 8x8-block printer (fhe_image.h:140-153 print_blocks
    equivalent): each block as an 8x8 grid separated by blank lines."""
    import sys

    parts = []
    for b in np.asarray(blocks).reshape(-1, 64):
        parts.append("\n".join(
            " ".join(f"{int(round(float(v))):5d}" for v in b[r * 8:(r + 1) * 8])
            for r in range(8)
        ))
    text = "\n\n".join(parts)
    print(text, file=file or sys.stdout)
    return text


def show_image(arr: np.ndarray, title: str = "fhetpu"):
    """Interactive display (fhe_resize.h:72-97/120-141 show_image*
    equivalent).  The reference shells out to X11 via OpenCV; headless TPU
    hosts have no display, so this opens a PIL viewer when a display is
    available and otherwise writes a PNG next to the cwd and says so."""
    import os
    import sys

    from PIL import Image

    im = Image.fromarray(np.asarray(arr).astype(np.uint8))
    if os.environ.get("DISPLAY") or sys.platform == "darwin":
        im.show(title=title)
        return None
    path = os.path.abspath(f"{title.replace(' ', '_')}.png")
    im.save(path)
    print(f"[show_image] no display; wrote {path}")
    return path
