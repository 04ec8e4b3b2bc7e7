"""Quantization quality gates (VERDICT r2 weak #1): the probe passes on a
healthy implementation and trips loudly on corruption."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from procyon_tpu.evaluate import quant_quality as qq
from procyon_tpu.models import llama


def _tiny():
    # dim/intermediate multiples of 256: int4 packing needs nibble-pure
    # groups ((k/2) % group == 0 with group 128)
    cfg = llama.LlamaConfig(
        vocab_size=512, dim=256, n_layers=2, n_heads=2, n_kv_heads=1,
        intermediate=512, max_seq_len=64, dtype=jnp.float32,
        attn_backend="ref", remat=False)
    return cfg, llama.init_params(jax.random.PRNGKey(0), cfg)


class TestProbe:
    @pytest.mark.parametrize("bits,mode", [(8, "dequant"), (4, "dequant")])
    def test_healthy_implementation_passes(self, bits, mode):
        cfg, params = _tiny()
        r = qq.probe(bits, mode, cfg=cfg, params=params, batch=2, seq=32)
        assert r.passed, r.as_dict()
        assert r.weight_rel_err > 0  # it measured something
        assert np.isfinite(r.ce_delta)

    def test_weight_error_matches_theory(self):
        """Gaussian weights, group-wise symmetric: int8 ~1%, int4 ~12%."""
        cfg, params = _tiny()
        q8 = llama.quantize_params(params, cfg, bits=8)
        e8 = qq.weight_reconstruction_error(params, q8)
        assert 0.002 < e8 < 0.02, e8
        q4 = llama.quantize_params(params, cfg, bits=4)
        e4 = qq.weight_reconstruction_error(params, q4)
        assert 0.05 < e4 < 0.18, e4

    def test_corrupted_quantization_trips_gate(self):
        """Simulate a packing/scale bug: zero one leaf's scales."""
        cfg, params = _tiny()
        qparams = llama.quantize_params(params, cfg, bits=8)

        def corrupt(node):
            if isinstance(node, dict) and set(node) == {"q", "s"}:
                return {"q": node["q"], "s": node["s"] * 37.0}
            if isinstance(node, dict):
                return {k: corrupt(v) for k, v in node.items()}
            return node

        bad = corrupt(qparams)
        err = qq.weight_reconstruction_error(params, bad)
        assert err > qq.WEIGHT_ERR_GATES[8]

    def test_mis_scaled_int4_layer_fails_spread_gate(self):
        """VERDICT r3 #8 done criterion: a deliberately mis-scaled int4
        config fails the gate — specifically a x1.10 scale break on ONE
        layer, which stays UNDER the global w_err gate (the case the old
        CE-only gate with 2x slack was blind to) but trips the per-layer
        spread gate."""
        cfg, params = _tiny()
        qparams = llama.quantize_params(params, cfg, bits=4)
        # corrupt layer 1 of one stacked int4 leaf: s is
        # [L, k/group, 1, out]
        bad = jax.tree_util.tree_map(lambda x: x, qparams)  # deep-ish copy
        wg = dict(bad["layers"]["mlp"]["w_gate"])
        wg["s"] = wg["s"].at[1].multiply(1.10)
        bad["layers"] = {**bad["layers"],
                         "mlp": {**bad["layers"]["mlp"], "w_gate": wg}}
        r = qq.probe(4, "dequant", cfg=cfg, params=params, qparams=bad,
                     batch=2, seq=32)
        assert r.weight_rel_err <= r.gate_weight, r.as_dict()  # old gate blind
        assert r.ce_delta <= r.gate_ce, r.as_dict()            # old gate blind
        assert r.weight_err_spread > r.gate_spread, r.as_dict()
        assert not r.passed

    def test_topk_overlap_metric(self):
        logits = np.zeros((2, 16), np.float32)
        logits[0, :5] = [5, 4, 3, 2, 1]
        got = logits.copy()
        assert qq.topk_overlap(logits, got, k=5) == 1.0
        got2 = logits.copy()
        got2[0, 10] = 10.0  # one intruder replaces one of the top-5
        assert qq.topk_overlap(logits[:1], got2[:1], k=5) == 0.8

    def test_topk_gate_wiring(self):
        """The top-k gate participates in `passed` (int8 modes get a
        default; int4 is report-only like the cosine) and an explicit bar
        above the measured overlap fails the probe. Note: uniform scale
        corruptions do NOT reorder top-k (the residual stream is
        scale-tolerant; w_err/spread own that class) — top-k exists for
        output-reordering regressions, e.g. a wrong dequant axis."""
        cfg, params = _tiny()
        r = qq.probe(8, "dequant", cfg=cfg, params=params, batch=2, seq=32)
        assert r.gate_topk is not None and r.topk_overlap >= r.gate_topk
        r4 = qq.probe(4, "dequant", cfg=cfg, params=params, batch=2,
                      seq=32)
        assert r4.gate_topk is None  # report-only on random weights
        assert "topk_overlap" in r4.as_dict()
        r_bar = qq.probe(8, "dequant", cfg=cfg, params=params, batch=2,
                         seq=32, gate_topk=1.01)  # impossible bar
        assert not r_bar.passed

    def test_result_dict_is_self_describing(self):
        cfg, params = _tiny()
        r = qq.probe(8, "dequant", cfg=cfg, params=params, batch=2, seq=32)
        d = r.as_dict()
        assert d["quality_probe_synthetic_weights"] is True
        assert "quality_gate_passed" in d
        assert "ce_delta_nats" in d

    def test_explicit_cos_gate_for_real_checkpoints(self):
        cfg, params = _tiny()
        r = qq.probe(8, "dequant", cfg=cfg, params=params, batch=2, seq=32,
                     gate_cos=1.1)  # impossible bar -> must fail
        assert not r.passed
        assert r.as_dict()["quality_gate_cos"] == 1.1
