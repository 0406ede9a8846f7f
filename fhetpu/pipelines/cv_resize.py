"""Float reimplementation of OpenCV's resize (INTER_LINEAR / INTER_CUBIC)
used as the reference's RMS ground truth (compare_resize_opencv,
fhe_resize.h:35-68).  OpenCV maps destination pixel x to source coordinate
(x + 0.5) * scale - 0.5 (unlike the FHE sampler's x/(dst-1)*src - 0.5 --
that mismatch is why the reference reports RMS ~18 even on success), uses
a = -0.75 for the cubic kernel, and border-replicates.  This is the float
version of cv2's fixed-point path; values can differ from cv2 by ~1 ulp of
the fixed-point tables, which moves the RMS in the 3rd decimal at most.
"""

from __future__ import annotations

import numpy as np


def _cubic_weights(f: float, a: float = -0.75):
    # OpenCV interpolateCubic
    w = np.zeros(4)
    w[0] = ((a * (f + 1) - 5 * a) * (f + 1) + 8 * a) * (f + 1) - 4 * a
    w[1] = ((a + 2) * f - (a + 3)) * f * f + 1
    w[2] = ((a + 2) * (1 - f) - (a + 3)) * (1 - f) * (1 - f) + 1
    w[3] = 1.0 - w[0] - w[1] - w[2]
    return w


def cv_resize(img: np.ndarray, dst_w: int, dst_h: int, bicubic: bool) -> np.ndarray:
    src_h, src_w = img.shape[:2]
    sx = src_w / dst_w
    sy = src_h / dst_h
    out = np.zeros((dst_h, dst_w) + img.shape[2:], dtype=np.float64)
    imgf = img.astype(np.float64)
    for y in range(dst_h):
        fy = (y + 0.5) * sy - 0.5
        iy = int(np.floor(fy))
        ry = fy - iy
        for x in range(dst_w):
            fx = (x + 0.5) * sx - 0.5
            ix = int(np.floor(fx))
            rx = fx - ix
            if bicubic:
                wy = _cubic_weights(ry)
                wx = _cubic_weights(rx)
                acc = 0.0
                for j in range(4):
                    yy = min(max(iy - 1 + j, 0), src_h - 1)
                    row = 0.0
                    for i in range(4):
                        xx = min(max(ix - 1 + i, 0), src_w - 1)
                        row += wx[i] * imgf[yy, xx]
                    acc += wy[j] * row
                out[y, x] = acc
            else:
                y0 = min(max(iy, 0), src_h - 1)
                y1 = min(max(iy + 1, 0), src_h - 1)
                x0 = min(max(ix, 0), src_w - 1)
                x1 = min(max(ix + 1, 0), src_w - 1)
                ry_c = min(max(ry, 0.0), 1.0)
                rx_c = min(max(rx, 0.0), 1.0)
                top = (1 - rx_c) * imgf[y0, x0] + rx_c * imgf[y0, x1]
                bot = (1 - rx_c) * imgf[y1, x0] + rx_c * imgf[y1, x1]
                out[y, x] = (1 - ry_c) * top + ry_c * bot
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)
