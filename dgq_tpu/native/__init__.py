"""Native (C) host-side components.

The reference ships CUDA kernels + a torch cpp extension for its device hot
path (reference: dgq/kernels/); on TPU the device hot path is Pallas.  The
native layer here covers the *host* hot path instead: the INT4 nibble codec
used when converting multi-billion-parameter checkpoints on CPU, where the
numpy route allocates several full-size int32 temporaries.

Built on demand with the system C compiler into
``native/_build/nibblecodec*.so`` and loaded lazily; every entry point falls
back to the numpy implementation when the toolchain is unavailable.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "nibblecodec.c")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "_build")

_mod = None
_tried = False


def _build() -> Optional[object]:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    so_path = os.path.join(_BUILD_DIR, "nibblecodec.so")
    if not os.path.exists(so_path) or os.path.getmtime(so_path) < os.path.getmtime(_SRC):
        include = sysconfig.get_paths()["include"]
        cmd = [
            os.environ.get("CC", "gcc"), "-O3", "-shared", "-fPIC",
            "-march=native", f"-I{include}", _SRC, "-o", so_path, "-lm",
        ]
        subprocess.run(cmd, check=True, capture_output=True)
    import importlib.util

    spec = importlib.util.spec_from_file_location("nibblecodec", so_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def get_codec() -> Optional[object]:
    """The compiled codec module, or None when unavailable."""
    global _mod, _tried
    if _mod is None and not _tried:
        _tried = True
        try:
            _mod = _build()
        except Exception as e:  # no toolchain / sandbox: numpy fallback
            sys.stderr.write(f"[dgq_tpu.native] codec build failed ({e}); numpy fallback\n")
            _mod = None
    return _mod


def pack_nibbles_np(codes: np.ndarray, span: int = 0) -> np.ndarray:
    """(K, N) uint8 codes in [0,15] -> (K//2, N) int8, span layout.

    Uses the C codec when available, else numpy."""
    k, n = codes.shape
    codec = get_codec()
    out = np.empty((k // 2, n), np.int8)
    if codec is not None:
        codes_c = np.ascontiguousarray(codes, np.uint8)
        codec.pack_nibbles(codes_c, out, k, n, span)
        return out
    # numpy fallback (mirrors dgq_tpu/quant/packing.py)
    c = codes.astype(np.int32)
    if span:
        half = span // 2
        cs = c.reshape(k // span, span, n)
        hi = cs[:, :half, :].reshape(k // 2, n)
        lo = cs[:, half:, :].reshape(k // 2, n)
    else:
        hi, lo = c[0::2], c[1::2]
    return (((hi << 4) | (lo & 0xF)) & 0xFF).astype(np.uint8).view(np.int8)


def unpack_nibbles_np(packed: np.ndarray, span: int = 0) -> np.ndarray:
    """(K//2, N) int8 -> (K, N) uint8 codes."""
    k2, n = packed.shape
    k = 2 * k2
    codec = get_codec()
    if codec is not None:
        out = np.empty((k, n), np.uint8)
        codec.unpack_nibbles(np.ascontiguousarray(packed), out, k, n, span)
        return out
    ub = packed.view(np.uint8).astype(np.int32)
    hi, lo = ub >> 4, ub & 0xF
    if span:
        half = span // 2
        out = np.concatenate(
            [hi.reshape(k2 // half, half, n), lo.reshape(k2 // half, half, n)], axis=1
        ).reshape(k, n)
    else:
        out = np.stack([hi, lo], axis=1).reshape(k, n)
    return out.astype(np.uint8)


def quantize_pack_np(
    w: np.ndarray, scales: np.ndarray, zeros: np.ndarray, groupsize: int, span: int = 0
) -> np.ndarray:
    """Fused round(w/scale + zero)->clip->pack for (K, N) f32 weights with
    (G, N) effective fp scales/zeros.  C path avoids full-size temporaries."""
    k, n = w.shape
    codec = get_codec()
    if codec is not None:
        out = np.empty((k // 2, n), np.int8)
        codec.quantize_pack(
            np.ascontiguousarray(w, np.float32),
            np.ascontiguousarray(scales, np.float32),
            np.ascontiguousarray(zeros, np.float32),
            out, k, n, groupsize, span,
        )
        return out
    scales_k = np.repeat(scales, groupsize, axis=0)
    zeros_k = np.repeat(zeros, groupsize, axis=0)
    codes = np.clip(np.round(w / scales_k + zeros_k), 0, 15).astype(np.uint8)
    return pack_nibbles_np(codes, span)
