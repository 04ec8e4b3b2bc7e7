"""ctypes bindings for the native data-path library (native/
procyon_native.cpp): batch protein tokenization with chunk splitting, MLM
masking, FASTA indexing. Compiled lazily with g++ on first use; every entry
point has a pure-python fallback so the framework runs without a toolchain.
"""

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "native", "procyon_native.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libprocyon_native.so")


def _build() -> Optional[str]:
    if os.path.exists(_SO) and \
            os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.count_rows.restype = ctypes.c_int
        lib.batch_encode.restype = ctypes.c_int
        lib.fasta_index.restype = ctypes.c_long
        lib.fasta_get.restype = ctypes.c_long
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def batch_encode(seqs, *, max_len=1024, long_strategy="split",
                 pad_rows_to=0):
    """Native batch_encode; falls back to the python implementation."""
    lib = get_lib()
    from procyon_tpu.data import protein_tokenizer as pt

    if lib is None:
        return pt.batch_encode(seqs, max_len=max_len,
                               long_strategy=long_strategy,
                               pad_rows_to=pad_rows_to)
    split = 1 if long_strategy == "split" else 0
    arr = (ctypes.c_char_p * len(seqs))(
        *[s.encode() for s in seqs])
    n_rows = lib.count_rows(arr, len(seqs), max_len, split)
    R = max(n_rows, 1)
    if pad_rows_to:
        R = max(R, pad_rows_to)
    longest = max((min(len(s), max_len) if split == 0
                   else min(len(s), max_len) if len(s) <= max_len
                   else max_len for s in seqs), default=1)
    width = longest + 2
    tokens = np.full((R, width), pt.PAD_IDX, np.int32)
    group_ids = np.zeros((R,), np.int32)
    row_valid = np.zeros((R,), np.float32)
    lib.batch_encode(
        arr, len(seqs), max_len, split,
        tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), R, width,
        group_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        row_valid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return pt.ProteinBatch(tokens=tokens, group_ids=group_ids,
                           row_valid=row_valid, num_groups=len(seqs))


def mask_for_mlm(tokens: np.ndarray, seed: int, *, mask_prob=0.15):
    """Native MLM masking; python fallback uses numpy RNG (different
    stream, same distribution)."""
    lib = get_lib()
    from procyon_tpu.data import protein_tokenizer as pt

    if lib is None:
        return pt.mask_for_mlm(tokens, np.random.default_rng(seed),
                               mask_prob=mask_prob)
    flat = np.ascontiguousarray(tokens, np.int32)
    out_t = np.empty_like(flat)
    out_l = np.empty_like(flat)
    lib.mask_for_mlm(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(flat.size), ctypes.c_float(mask_prob),
        ctypes.c_uint64(seed),
        out_t.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_l.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out_t.reshape(tokens.shape), out_l.reshape(tokens.shape)


class FastaIndex:
    """Indexed FASTA reader (native scan; python fallback)."""

    def __init__(self, path: str):
        self.path = path
        lib = get_lib()
        if lib is not None:
            n = lib.fasta_index(path.encode(), None, 0)
            if n < 0:
                raise FileNotFoundError(path)
            self.offsets = np.zeros((n,), np.int64)
            lib.fasta_index(
                path.encode(),
                self.offsets.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_int64)), n)
            self._native = True
        else:
            self.offsets = []
            pos = 0
            with open(path, "rb") as f:
                for line in f:
                    if line.startswith(b">"):
                        self.offsets.append(pos)
                    pos += len(line)
            self.offsets = np.asarray(self.offsets, np.int64)
            self._native = False

    def __len__(self):
        return len(self.offsets)

    def get(self, idx: int, max_len: int = 1 << 20) -> str:
        lib = get_lib()
        if lib is not None and self._native:
            buf = ctypes.create_string_buffer(max_len)
            n = lib.fasta_get(self.path.encode(),
                              ctypes.c_int64(int(self.offsets[idx])), buf,
                              max_len)
            return buf.value[:max(n, 0)].decode()
        with open(self.path, "rb") as f:
            f.seek(int(self.offsets[idx]))
            f.readline()  # header
            parts = []
            for line in f:
                if line.startswith(b">"):
                    break
                parts.append(line.strip().decode())
            return "".join(parts)
