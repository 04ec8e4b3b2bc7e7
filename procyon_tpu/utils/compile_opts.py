"""Per-compile XLA compiler-option helpers.

The axon terminal fixes LIBTPU_INIT_ARGS/XLA_FLAGS server-side, but
proto-backed ``xla_*`` debug options ARE forwarded per compile — so
``jax.jit(f, compiler_options=...)`` can raise Mosaic's 16 MB scoped-vmem
stack limit even though the env flag cannot (and the local CPU XLA build
hard-crashes on unknown TPU flags in XLA_FLAGS).

Raising the scoped limit to 26 MB lets the fused LN+int8-MLP kernel run
block_m 256 at ESM2-3B width (measured 17.5 MB stack, 9.94 ms vs 13 ms
at the 16 MB-forced block_m 128 — the [d,H]+[H,d] int8 weight pair is
re-fetched once per row block, so doubling the rows halves the dominant
HBM cost). v5e has 128 MB of VMEM; 26 MB of stack leaves XLA ample
buffer space (512-row configs would need 37-39 MB — not worth it, the
kernel is already near its compute floor at 256 rows).

PAIRING CONTRACT: the big-block kernel config and the raised limit must
travel together — unpaired big blocks fail AOT compilation with a
scoped-vmem error. Callers therefore never set either by hand: use
``esm2.big_block_serving(cfg)``, which returns the opted-in config plus
the compiler options for the enclosing jit (or the unchanged config and
None off-TPU / at dim<2048 / under PROCYON_SCOPED_VMEM_KIB=0). Configs
that don't opt in keep the stock 16 MB block heuristics and compile
everywhere.
"""
import os

import jax


def scoped_vmem_kib() -> int:
    """The scoped-vmem limit (KiB) the process compiles with; 0/16384
    means the Mosaic default (no compiler option emitted)."""
    return int(os.environ.get("PROCYON_SCOPED_VMEM_KIB", "26624"))


def raised_scoped_vmem() -> bool:
    """True when kernels may assume the raised scoped-vmem limit (the
    paired jit must pass tpu_compiler_options())."""
    if scoped_vmem_kib() <= 16384:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001 — no backend: assume default limit
        return False


def tpu_compiler_options(dim: int = 2560):
    """compiler_options dict for jax.jit on the TPU serving paths, or
    None off-TPU (the CPU compiler rejects TPU debug options).

    Pass the model width: the raised limit only pays at dim>=2048 (the
    fused-MLP big-block config); narrower towers keep the stock limit —
    raising it for them measured a ~1% headline dip (XLA plans its own
    buffers in the remaining VMEM)."""
    if dim < 2048 or not raised_scoped_vmem():
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": str(scoped_vmem_kib())}
