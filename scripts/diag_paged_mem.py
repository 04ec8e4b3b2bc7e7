"""Diagnose paged-beam HBM usage at the llama3-int4 flagship shape."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def stats(tag):
    import jax

    try:
        s = jax.local_devices()[0].memory_stats()
        print(tag, {k: round(v / 1e9, 3) for k, v in s.items()
                    if "bytes" in k and v > 1e6}, flush=True)
    except Exception as e:
        print(tag, "memory_stats unavailable:", e, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from procyon_tpu.inference import generation, paged_beam
    from procyon_tpu.models import llama, unified

    B, L = 4, 128
    lcfg = llama.llama3_8b(max_seq_len=L + 88, dtype=jnp.bfloat16)
    cfg = unified.UnifiedConfig(
        llama=lcfg, esm=None, protein_embed_dim=64,
        token_projector_layers=1, token_projector_hidden=64,
        retrieval_dim=64, dtype=jnp.bfloat16)

    def build():
        p_ = dict(unified.init_params(jax.random.PRNGKey(0), cfg))
        p_["llama"] = llama.quantize_params(p_["llama"], lcfg, bits=4)
        return p_

    shapes = jax.eval_shape(build)

    @jax.jit
    def materialize():
        return jax.tree_util.tree_map(
            lambda sd: jnp.full(sd.shape, 1, sd.dtype)
            if sd.dtype == jnp.int8 else jnp.full(sd.shape, 0.01, sd.dtype),
            shapes)

    params = materialize()
    jax.block_until_ready(params["llama"]["embed"])
    stats("after params:")

    rng = np.random.default_rng(0)
    batch = {
        "input_ids": np.asarray(
            rng.integers(4, lcfg.vocab_size, (B, L)), np.int32),
        "seg_ids": np.ones((B, L), np.int32),
        "positions": np.broadcast_to(np.arange(L, dtype=np.int32), (B, L)),
        "soft_map": np.full((B, L), -1, np.int32),
        "protein_embeds": np.zeros((1, 64), np.float32),
    }
    gen = generation.GenerationConfig(
        max_new_tokens=56, method="beam", beam_size=10, beam_group_size=2,
        diversity_penalty=0.8, eos_token_id=2, pad_token_id=0)

    state, ctx = paged_beam.paged_beam_init(params, cfg, batch, gen)
    pcfg = ctx["pcfg"]
    stats("after init:")
    print("pcfg:", pcfg, flush=True)

    @functools.partial(jax.jit, donate_argnums=(3,))
    def pstep(p, private, g0, state, t):
        return paged_beam.paged_beam_step(
            p, cfg, gen, pcfg, ctx["beam"], private, g0, state, t)

    for t in range(3):
        t0 = time.perf_counter()
        state = pstep(params, ctx["private"], ctx["g0"], state,
                      jnp.int32(t))
        float(jnp.sum(state[3]))
        print(f"step {t}: {(time.perf_counter()-t0)*1e3:.1f} ms",
              flush=True)
        stats(f"after step {t}:")
    # steady-state timing
    t0 = time.perf_counter()
    for t in range(3, 13):
        state = pstep(params, ctx["private"], ctx["g0"], state,
                      jnp.int32(t))
    float(jnp.sum(state[3]))
    print(f"10 steps: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
