"""Ciphertext stream + key/params file formats.

The reference's inter-process protocol is plain files: keys/params.txt,
keys/pubkey.txt, keys/seckey.txt, and raw concatenations of
Ciphertext::save (SURVEY.md section 2.4).  We keep the same file roles and
params.txt text format, with an efficient binary array format for
ciphertext streams: a small header + raw uint32 limb data, chunk-appendable
so the server can stream blocks through bounded host memory (the analog of
the reference's 3-block / 4-row sliding windows).
"""

from __future__ import annotations

import json
import os
import struct
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from ..bfv.params import BfvParams

MAGIC = b"FHET"
VERSION = 1


def write_params_txt(path: str, width: int, height: int, channels: int, pmod: int):
    """Reference format: 'W H C pmod\\n' (client_jpeg.cpp:88-94)."""
    with open(path, "w") as f:
        f.write(f"{width} {height} {channels} {pmod}\n")


def read_params_txt(path: str):
    with open(path) as f:
        parts = f.read().split()
    return tuple(int(x) for x in parts)


def save_secret_key(path: str, small: np.ndarray):
    np.savez_compressed(path, secret=small)


def load_secret_key(path: str) -> np.ndarray:
    return np.load(path)["secret"]


def save_public_key(path: str, data: np.ndarray):
    np.savez_compressed(path, public=data)


def load_public_key(path: str) -> np.ndarray:
    return np.load(path)["public"]


# --- ciphertext streams -----------------------------------------------------


class CtWriter:
    """Appends fixed-shape ciphertext chunks [k, size, L, n] to a stream."""

    def __init__(self, path: str, size: int, L: int, n: int, meta: Optional[dict] = None):
        self.f = open(path, "wb")
        self.size, self.L, self.n = size, L, n
        self.count = 0
        self.meta = meta or {}
        header = {
            "size": size,
            "L": L,
            "n": n,
            "count": -1,
            "meta": self.meta,
        }
        # 16 bytes of slack so close() can rewrite with the real count
        hb = json.dumps(header).encode() + b" " * 16
        self.f.write(MAGIC + struct.pack("<II", VERSION, len(hb)) + hb)
        self._header_len = len(hb)

    def append(self, arr: np.ndarray):
        assert arr.shape[-3:] == (self.size, self.L, self.n), arr.shape
        flat = np.ascontiguousarray(arr, dtype=np.uint32)
        self.count += int(np.prod(arr.shape[:-3])) if arr.ndim > 3 else 1
        self.f.write(flat.tobytes())

    def close(self):
        # rewrite header with the final count (fixed-length via padding),
        # PRESERVING meta -- downstream stages read layout/ntt flags from it
        self.f.seek(len(MAGIC) + 8)
        header = {
            "size": self.size,
            "L": self.L,
            "n": self.n,
            "count": self.count,
            "meta": self.meta,
        }
        hb = json.dumps(header).encode()
        assert len(hb) <= self._header_len, "header slack exhausted"
        self.f.write(hb + b" " * (self._header_len - len(hb)))
        self.f.close()


class CtReader:
    """Streaming reader: iterate chunks of k ciphertexts at a time."""

    def __init__(self, path: str):
        self.f = open(path, "rb")
        magic = self.f.read(4)
        assert magic == MAGIC, f"bad ciphertext stream magic {magic!r}"
        version, hlen = struct.unpack("<II", self.f.read(8))
        header = json.loads(self.f.read(hlen))
        self.size = header["size"]
        self.L = header["L"]
        self.n = header["n"]
        self.count = header["count"]
        self.meta = header.get("meta", {})
        self._ct_bytes = self.size * self.L * self.n * 4

    def read(self, k: int) -> Optional[np.ndarray]:
        """Read up to k ciphertexts -> [m, size, L, n] or None at EOF."""
        buf = self.f.read(k * self._ct_bytes)
        if not buf:
            return None
        m = len(buf) // self._ct_bytes
        arr = np.frombuffer(buf[: m * self._ct_bytes], dtype=np.uint32)
        return arr.reshape(m, self.size, self.L, self.n)

    def read_all(self) -> np.ndarray:
        out = self.read(1 << 30)
        return out if out is not None else np.zeros((0, self.size, self.L, self.n), np.uint32)

    def close(self):
        self.f.close()


def write_ct_array(path: str, arr: np.ndarray, meta: Optional[dict] = None):
    """One-shot write of [count, size, L, n]."""
    w = CtWriter(path, arr.shape[-3], arr.shape[-2], arr.shape[-1], meta)
    w.append(arr.reshape(-1, *arr.shape[-3:]))
    w.close()
