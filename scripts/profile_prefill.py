"""Profile one W8A8 prefill forward at the retrieval-bench shape and print
the per-op device-time table (vm.trace.json.gz parsing per CLAUDE.md).

The retrieval workload (bench_retrieval.py, tracked #2) is one prompt
forward per query: B16 x S256 through a ~5.6B w8a8 decoder = 57% int8-MFU
as of round 3. This decomposes where the other 43% goes.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import procyon_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=4096)
    ap.add_argument("--layers", type=int, default=30)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--prompt_len", type=int, default=256)
    ap.add_argument("--quant_mode", default="w8a8")
    ap.add_argument("--trace_dir", default="/tmp/prefill_prof")
    a = ap.parse_args()

    from procyon_tpu.models import llama, unified

    cfg = unified.UnifiedConfig(
        llama=llama.LlamaConfig(
            vocab_size=32000, dim=a.dim, n_layers=a.layers,
            n_heads=a.dim // 128, n_kv_heads=max(a.dim // 512, 1),
            intermediate=int(a.dim * 2.6875),
            max_seq_len=a.prompt_len, dtype=jnp.bfloat16,
            quant_mode=a.quant_mode),
        esm=None, protein_embed_dim=2560, token_projector_layers=3,
        token_projector_hidden=2560, retrieval_dim=1024, dtype=jnp.bfloat16)

    def build():
        p = dict(unified.init_params(jax.random.PRNGKey(0), cfg))
        p["llama"] = llama.quantize_params(p["llama"], cfg.llama)
        return p

    shapes = jax.eval_shape(build)

    @jax.jit
    def materialize():
        return jax.tree_util.tree_map(
            lambda sd: jnp.full(sd.shape, 1, sd.dtype)
            if sd.dtype == jnp.int8 else jnp.full(sd.shape, 0.01, sd.dtype),
            shapes)

    params = materialize()
    rng = np.random.default_rng(0)
    B, L = a.batch, a.prompt_len
    batch = {
        "input_ids": jnp.asarray(
            rng.integers(4, cfg.llama.vocab_size, (B, L)), jnp.int32),
        "seg_ids": jnp.ones((B, L), jnp.int32),
        "positions": jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32),
                                      (B, L)),
        "soft_map": jnp.full((B, L), -1, jnp.int32),
        "protein_embeds": jnp.zeros((1, 2560), jnp.float32),
    }

    @jax.jit
    def fwd(params, b):
        out = unified.forward(params, cfg, b)
        return out["hidden"][:, -1].sum()

    float(fwd(params, batch))  # compile + warm
    float(fwd(params, batch))

    os.system(f"rm -rf {a.trace_dir}")
    jax.profiler.start_trace(a.trace_dir)
    for _ in range(3):
        r = fwd(params, batch)
    float(r)
    jax.profiler.stop_trace()

    from procyon_tpu.utils.trace import print_op_table
    print_op_table(a.trace_dir, top=24, header="3 fwd, nested")


if __name__ == "__main__":
    main()
