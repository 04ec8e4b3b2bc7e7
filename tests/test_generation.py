"""Generation tests: greedy==argmax-by-hand, EOS stop, left-padding, beam."""
import jax
import jax.numpy as jnp
import numpy as np

from procyon_tpu.inference import generation
from procyon_tpu.models import llama, unified


def setup_model():
    cfg = unified.tiny_config(esm=None, protein_embed_dim=16)
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def make_prompt_batch(cfg, rng, B=2, L=8, left_pad=0):
    ids = np.asarray(rng.integers(4, cfg.llama.vocab_size, (B, L)), np.int32)
    seg = np.ones((B, L), np.int32)
    pos = np.broadcast_to(np.arange(L, dtype=np.int32), (B, L)).copy()
    if left_pad:
        ids[:, :left_pad] = 0
        seg[:, :left_pad] = 0
        pos = np.maximum(pos - left_pad, 0)
    return {
        "input_ids": jnp.asarray(ids),
        "seg_ids": jnp.asarray(seg),
        "positions": jnp.asarray(pos),
        "soft_map": jnp.full((B, L), -1, jnp.int32),
        "protein_embeds": jnp.zeros((1, cfg.encoder_out_dim), jnp.float32),
    }


def manual_greedy(params, cfg, batch, n_steps, eos_id):
    """Reference loop: re-run the full forward each step (no cache)."""
    ids = np.asarray(batch["input_ids"])
    seg = np.asarray(batch["seg_ids"])
    pos = np.asarray(batch["positions"])
    B = ids.shape[0]
    outs = []
    done = np.zeros((B,), bool)
    for _ in range(n_steps):
        fb = {
            "input_ids": jnp.asarray(ids),
            "seg_ids": jnp.asarray(seg),
            "positions": jnp.asarray(pos),
            "soft_map": jnp.full(ids.shape, -1, jnp.int32),
            "protein_embeds": batch["protein_embeds"],
        }
        out = unified.forward(params, cfg, fb)
        nxt = np.asarray(jnp.argmax(out["logits"][:, -1], -1))
        nxt = np.where(done, 0, nxt)
        outs.append(nxt)
        done = done | (nxt == eos_id)
        ids = np.concatenate([ids, nxt[:, None]], 1)
        seg = np.concatenate([seg, np.ones((B, 1), np.int32)], 1)
        pos = np.concatenate([pos, pos[:, -1:] + 1], 1)
    return np.stack(outs, 1)


class TestGenerate:
    def test_greedy_matches_manual(self, rng):
        cfg, params = setup_model()
        batch = make_prompt_batch(cfg, rng)
        gen = generation.GenerationConfig(max_new_tokens=6, method="greedy",
                                          eos_token_id=2, pad_token_id=0)
        got = np.asarray(generation.generate(params, cfg, batch, gen))
        want = manual_greedy(params, cfg, batch, 6, 2)
        np.testing.assert_array_equal(got, want)

    def test_left_padded_prompt_matches_unpadded(self, rng):
        cfg, params = setup_model()
        batch = make_prompt_batch(cfg, rng, B=1, L=8)
        gen = generation.GenerationConfig(max_new_tokens=5, method="greedy",
                                          eos_token_id=2, pad_token_id=0)
        out_plain = np.asarray(generation.generate(params, cfg, batch, gen))
        # same content, left-padded by 3
        ids = np.zeros((1, 11), np.int32)
        ids[:, 3:] = np.asarray(batch["input_ids"])
        seg = np.zeros((1, 11), np.int32)
        seg[:, 3:] = 1
        pos = np.zeros((1, 11), np.int32)
        pos[:, 3:] = np.arange(8)
        padded = {
            "input_ids": jnp.asarray(ids),
            "seg_ids": jnp.asarray(seg),
            "positions": jnp.asarray(pos),
            "soft_map": jnp.full((1, 11), -1, jnp.int32),
            "protein_embeds": batch["protein_embeds"],
        }
        out_padded = np.asarray(generation.generate(params, cfg, padded, gen))
        np.testing.assert_array_equal(out_plain, out_padded)

    def test_eos_stops_row(self, rng):
        cfg, params = setup_model()
        batch = make_prompt_batch(cfg, rng, B=1)
        gen = generation.GenerationConfig(max_new_tokens=8, method="greedy",
                                          eos_token_id=2, pad_token_id=0)
        out = np.asarray(generation.generate(params, cfg, batch, gen))[0]
        if (out == 2).any():
            first_eos = int(np.argmax(out == 2))
            assert (out[first_eos + 1:] == 0).all()

    def test_sampling_is_deterministic_given_key(self, rng):
        cfg, params = setup_model()
        batch = make_prompt_batch(cfg, rng)
        gen = generation.GenerationConfig(max_new_tokens=4, method="sample",
                                          temperature=1.0)
        a = np.asarray(generation.generate(params, cfg, batch, gen,
                                           rng=jax.random.PRNGKey(7)))
        b = np.asarray(generation.generate(params, cfg, batch, gen,
                                           rng=jax.random.PRNGKey(7)))
        np.testing.assert_array_equal(a, b)
        c = np.asarray(generation.generate(params, cfg, batch, gen,
                                           rng=jax.random.PRNGKey(8)))
        assert not np.array_equal(a, c)

    def test_nucleus_runs(self, rng):
        cfg, params = setup_model()
        batch = make_prompt_batch(cfg, rng)
        gen = generation.GenerationConfig(max_new_tokens=4, method="nucleus",
                                          top_p=0.9)
        out = np.asarray(generation.generate(params, cfg, batch, gen))
        assert out.shape == (2, 4)


class TestBeam:
    def test_beam_top1_matches_greedy_when_one_group(self, rng):
        """beam=1, group=1 degenerates to greedy."""
        cfg, params = setup_model()
        batch = make_prompt_batch(cfg, rng, B=1)
        gen = generation.GenerationConfig(max_new_tokens=5, method="beam",
                                          beam_size=1, beam_group_size=1,
                                          diversity_penalty=0.0,
                                          eos_token_id=2, pad_token_id=0)
        toks, scores = generation.generate_beam(params, cfg, batch, gen)
        greedy = np.asarray(generation.generate(
            params, cfg, batch,
            generation.GenerationConfig(max_new_tokens=5, method="greedy",
                                        eos_token_id=2, pad_token_id=0)))
        np.testing.assert_array_equal(np.asarray(toks[:, 0]), greedy)

    def test_diverse_groups_differ(self, rng):
        cfg, params = setup_model()
        batch = make_prompt_batch(cfg, rng, B=1)
        gen = generation.GenerationConfig(max_new_tokens=5, method="beam",
                                          beam_size=4, beam_group_size=2,
                                          diversity_penalty=5.0,
                                          eos_token_id=2, pad_token_id=0)
        toks, scores = generation.generate_beam(params, cfg, batch, gen)
        toks = np.asarray(toks[0])  # [beam, T]
        # with a huge diversity penalty the first tokens of the two groups
        # must differ
        assert len({int(t[0]) for t in toks}) > 1
        assert np.asarray(scores).shape == (1, 4)

    def test_beam_scores_sorted(self, rng):
        cfg, params = setup_model()
        batch = make_prompt_batch(cfg, rng, B=2)
        gen = generation.GenerationConfig(max_new_tokens=3, method="beam",
                                          beam_size=4, beam_group_size=2,
                                          diversity_penalty=0.5,
                                          eos_token_id=2, pad_token_id=0)
        _, scores = generation.generate_beam(params, cfg, batch, gen)
        s = np.asarray(scores)
        assert (np.diff(s, axis=1) <= 1e-5).all()


def test_perturbation_confidence():
    import numpy as np
    from procyon_tpu.inference import prompts as P

    scores = np.linspace(0, 1, 8)

    def query_fn(desc):
        # score shifts with description length -> variants vary
        return scores + 0.01 * len(desc.split())

    out = P.perturbation_confidence(
        "a disease of the mitochondrial respiratory chain with lactic "
        "acidosis and muscle weakness", query_fn, n_perturbations=6,
        drop_prob=0.3, seed=0)
    assert len(out["outputs"]) == 6
    assert out["stats"]["mean"].shape == (8,)
    assert (out["stats"]["q95"] >= out["stats"]["q05"]).all()
    assert (out["stats"]["std"] > 0).any()   # variants actually differ
