"""int8-W8A8 / int4 quantization + fused LN-MLP kernel correctness
(serving path for the headline embedding benchmark)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from procyon_tpu.models import esm2
from procyon_tpu.ops import quant
from procyon_tpu.ops.activations import gelu_erf_fast
from procyon_tpu.ops.fused_mlp import fused_ln_mlp_int8
from procyon_tpu.ops.norms import layer_norm


class TestW8A8:
    def test_matches_dequant_within_int8_rounding(self, rng):
        x = jnp.asarray(rng.standard_normal((32, 64)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((64, 48)), jnp.float32)
        qw = quant.quantize(w)
        ref = np.asarray(quant.qmatmul(x, qw))
        got = np.asarray(quant.qmatmul_w8a8(x, qw))
        cos = (ref * got).sum() / (np.linalg.norm(ref)
                                   * np.linalg.norm(got))
        assert cos > 0.9995

    def test_esm2_w8a8_embedding_quality(self, rng):
        cfg = esm2.tiny_config(dim=64, n_layers=2, n_heads=4)
        params = esm2.init_params(jax.random.PRNGKey(0), cfg)
        toks = np.full((2, 64), esm2.PAD_IDX, np.int32)
        for i in range(2):
            n = rng.integers(30, 60)
            toks[i, 0] = esm2.CLS_IDX
            toks[i, 1:n + 1] = rng.integers(4, 24, n)
            toks[i, n + 1] = esm2.EOS_IDX
        toks = jnp.asarray(toks)
        ref = np.asarray(esm2.forward(params, cfg, toks)["hidden"])
        qp = esm2.quantize_params(params, cfg)
        cfg8 = dataclasses.replace(cfg, quant_mode="w8a8")
        got = np.asarray(esm2.forward(qp, cfg8, toks)["hidden"])
        cos = (ref * got).sum() / (np.linalg.norm(ref)
                                   * np.linalg.norm(got))
        assert cos > 0.999

    def test_fuse_qkv_is_exact(self, rng):
        cfg = esm2.tiny_config(dim=64, n_layers=2, n_heads=4)
        params = esm2.init_params(jax.random.PRNGKey(1), cfg)
        toks = jnp.asarray(rng.integers(4, 24, (2, 32)), jnp.int32)
        a = esm2.forward(params, cfg, toks)["hidden"]
        b = esm2.forward(esm2.fuse_qkv_params(params), cfg, toks)["hidden"]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        qp = esm2.quantize_params(params, cfg)
        cfg8 = dataclasses.replace(cfg, quant_mode="w8a8")
        c = esm2.forward(qp, cfg8, toks)["hidden"]
        d = esm2.forward(esm2.fuse_qkv_params(qp), cfg8, toks)["hidden"]
        np.testing.assert_array_equal(np.asarray(c), np.asarray(d))


class TestFusedMLPKernel:
    @pytest.mark.parametrize("block_n,sub_tiles", [(512, 2), (256, 2),
                                                   (512, 4)])
    def test_matches_dequant_reference(self, rng, block_n, sub_tiles):
        M, d, H = 256, 256, 1024
        x = jnp.asarray(rng.standard_normal((M, d)), jnp.float32)
        lnw = jnp.asarray(rng.standard_normal(d) * 0.1 + 1, jnp.float32)
        lnb = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((d, H)) / np.sqrt(d),
                         jnp.float32)
        b1 = jnp.asarray(rng.standard_normal(H) * 0.05, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((H, d)) / np.sqrt(H),
                         jnp.float32)
        b2 = jnp.asarray(rng.standard_normal(d) * 0.05, jnp.float32)
        q1, q2 = quant.quantize(w1), quant.quantize(w2)
        out = fused_ln_mlp_int8(
            x, lnw, lnb, q1["q"], q1["s"], b1, q2["q"], q2["s"], b2,
            block_m=128, block_n=block_n, sub_tiles=sub_tiles,
            interpret=True)
        h = layer_norm(x, lnw, lnb)
        ref = gelu_erf_fast(
            h @ quant.dequantize(q1, jnp.float32) + b1) @ \
            quant.dequantize(q2, jnp.float32) + b2
        cos = float(jnp.sum(out * ref)
                    / (jnp.linalg.norm(out) * jnp.linalg.norm(ref)))
        assert cos > 0.999

    def test_prequant_matches_one_pass(self, rng):
        """fused_mlp_int8_prequant (LN+row-quant hoisted out of the
        matmul kernel) must reproduce fused_ln_mlp_int8 exactly: the
        quant math is identical, only the pass structure differs."""
        from procyon_tpu.ops.fused_mlp import (fused_mlp_int8_prequant,
                                               ln_quant_rows,
                                               ln_quant_rows_pallas)

        M, d, H = 256, 256, 1024
        x = jnp.asarray(rng.standard_normal((M, d)), jnp.float32)
        lnw = jnp.asarray(rng.standard_normal(d) * 0.1 + 1, jnp.float32)
        lnb = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((d, H)) / np.sqrt(d),
                         jnp.float32)
        b1 = jnp.asarray(rng.standard_normal(H) * 0.05, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((H, d)) / np.sqrt(H),
                         jnp.float32)
        b2 = jnp.asarray(rng.standard_normal(d) * 0.05, jnp.float32)
        q1, q2 = quant.quantize(w1), quant.quantize(w2)

        # the hoisted LN+quant (XLA and Pallas forms) agree bit-exactly
        xq_ref, sx_ref = ln_quant_rows(x, lnw, lnb)
        xq_pl, sx_pl = ln_quant_rows_pallas(x, lnw, lnb, interpret=True)
        np.testing.assert_array_equal(np.asarray(xq_ref),
                                      np.asarray(xq_pl))
        np.testing.assert_allclose(np.asarray(sx_ref[:, 0]),
                                   np.asarray(sx_pl[:, 0]), rtol=1e-6)

        one_pass = fused_ln_mlp_int8(
            x, lnw, lnb, q1["q"], q1["s"], b1, q2["q"], q2["s"], b2,
            block_m=128, block_n=512, sub_tiles=2, add_residual=True,
            interpret=True)
        two_pass = fused_mlp_int8_prequant(
            x, lnw, lnb, q1["q"], q1["s"], b1, q2["q"], q2["s"], b2,
            block_m=128, block_n=512, add_residual=True, interpret=True)
        np.testing.assert_allclose(np.asarray(two_pass),
                                   np.asarray(one_pass),
                                   rtol=2e-5, atol=2e-5)


class TestInt4:
    def test_pack_unpack_exact_for_representable(self, rng):
        """int4-representable weights survive the pack/unpack round trip
        bit-exactly."""
        g = 64
        s = rng.uniform(0.01, 0.2, (4, 1, 32)).astype(np.float32)
        q = rng.integers(-7, 8, (4 * g, 32)).astype(np.float32)
        w = jnp.asarray(q * np.repeat(s[:, 0], g, axis=0))
        q4 = quant.quantize4(w, group=g)
        wd = quant.dequantize4(q4, jnp.float32)
        np.testing.assert_allclose(np.asarray(wd), np.asarray(w),
                                   rtol=1e-5, atol=1e-6)

    def test_mm_dispatch_and_memory(self, rng):
        w = jnp.asarray(rng.standard_normal((256, 128)), jnp.float32)
        q4 = quant.quantize4(w)
        assert q4["p"].shape == (128, 128) and q4["p"].dtype == jnp.int8
        x = jnp.asarray(rng.standard_normal((8, 256)), jnp.float32)
        y = np.asarray(quant.mm(x, q4))
        ref = np.asarray(x @ w)
        cos = (y * ref).sum() / (np.linalg.norm(y) * np.linalg.norm(ref))
        assert cos > 0.98  # int4 RTN tolerance on gaussian weights

    def test_stacked_layers(self, rng):
        ws = jnp.asarray(rng.standard_normal((3, 256, 128)), jnp.float32)
        q4s = quant.quantize4(ws)
        per_layer = quant.dequantize4(quant.quantize4(ws[1]), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(quant.dequantize4(q4s, jnp.float32)[1]),
            np.asarray(per_layer), atol=1e-6)

    def test_llama_int4_tree(self, rng):
        from procyon_tpu.models import llama

        cfg = llama.tiny_config(dim=128, n_heads=4, n_kv_heads=2,
                                intermediate=256)
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        q4 = llama.quantize_params(params, cfg, bits=4, group=64)
        assert quant.is_quantized4(q4["layers"]["attn"]["wq"])
        assert quant.is_quantized4(q4["lm_head"])
        toks = jnp.asarray(np.arange(16).reshape(1, 16) % 256)
        out = llama.forward(q4, cfg, tokens=toks)
        assert np.isfinite(np.asarray(out["logits"])).all()


class TestInt4PallasKernel:
    """ops/int4_matmul.qmatvec4 (fused unpack+matmul, interpret mode) must
    equal the XLA dequant path bit-for-bit modulo dot rounding."""

    @pytest.mark.parametrize("impl", ["affine", "dq"])
    def test_matches_dequant_path(self, rng, impl):
        w = jnp.asarray(rng.standard_normal((512, 384)), jnp.float32)
        q4 = quant.quantize4(w, group=128)
        x = jnp.asarray(rng.standard_normal((5, 512)), jnp.bfloat16)

        from procyon_tpu.ops.int4_matmul import qmatvec4
        got = np.asarray(qmatvec4(x, q4, interpret=True, impl=impl),
                         np.float32)
        # both paths dot in bf16 with different reduction orders: bound by
        # sqrt(k) * bf16 eps * operand scale (~0.4 at k=512)
        ref = np.asarray(x @ quant.dequantize4(q4, x.dtype), np.float32)
        np.testing.assert_allclose(got, ref, atol=0.6, rtol=5e-2)
        cos = (got * ref).sum() / (np.linalg.norm(got) *
                                   np.linalg.norm(ref))
        assert cos > 0.9999, cos

    def test_3d_rows_and_row_padding(self, rng):
        w = jnp.asarray(rng.standard_normal((256, 128)), jnp.float32)
        q4 = quant.quantize4(w, group=128)
        x = jnp.asarray(rng.standard_normal((3, 1, 256)), jnp.float32)

        from procyon_tpu.ops.int4_matmul import qmatvec4
        got = np.asarray(qmatvec4(x, q4, interpret=True))
        assert got.shape == (3, 1, 128)
        ref = np.asarray(x @ quant.dequantize4(q4, x.dtype))
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


class TestFusedRmsSwiglu:
    def test_matches_xla_w8a8_chain(self):
        """fused_rms_swiglu_int8 (interpret) vs the XLA W8A8 route
        (rms_norm -> qmatmul_w8a8 gate/up -> silu*up -> qmatmul_w8a8
        down -> residual). The kernel requantizes the SwiGLU output per
        n-tile instead of per full row — finer grid, small differences."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from procyon_tpu.ops import quant
        from procyon_tpu.ops.fused_mlp import fused_rms_swiglu_int8
        from procyon_tpu.ops.norms import rms_norm

        rng = np.random.default_rng(0)
        M, d, H = 256, 256, 512
        x = jnp.asarray(rng.standard_normal((M, d)) * 0.5, jnp.float32)
        nw = jnp.asarray(1.0 + 0.1 * rng.standard_normal((d,)),
                         jnp.float32)
        wg = quant.quantize(jnp.asarray(
            rng.standard_normal((d, H)) / np.sqrt(d), jnp.float32))
        wu = quant.quantize(jnp.asarray(
            rng.standard_normal((d, H)) / np.sqrt(d), jnp.float32))
        wd = quant.quantize(jnp.asarray(
            rng.standard_normal((H, d)) / np.sqrt(H), jnp.float32))

        h = rms_norm(x, nw, eps=1e-5)
        gated = jax.nn.silu(quant.qmatmul_w8a8(h, wg)) * \
            quant.qmatmul_w8a8(h, wu)
        ref = x + quant.qmatmul_w8a8(gated.astype(x.dtype), wd)

        # exact-math reference (dequantized weights, fp32): both int8
        # routes are quantization approximations OF THIS; they differ
        # from each other by their activation-quant grids (per n-tile in
        # the kernel vs per full row in XLA), so parity is "no worse
        # error", not bit equality
        wg_f, wu_f, wd_f = (quant.dequantize(w, jnp.float32)
                            for w in (wg, wu, wd))
        exact = x + (jax.nn.silu(h @ wg_f) * (h @ wu_f)) @ wd_f

        got = fused_rms_swiglu_int8(
            x, nw, wg["q"], wg["s"], wu["q"], wu["s"], wd["q"], wd["s"],
            eps=1e-5, block_m=128, block_n=256, interpret=True)
        g, r, e = np.asarray(got), np.asarray(ref), np.asarray(exact)
        np.testing.assert_allclose(g, r, atol=8e-2, rtol=8e-2)
        err_kernel = np.linalg.norm(g - e) / np.linalg.norm(e)
        err_xla = np.linalg.norm(r - e) / np.linalg.norm(e)
        assert err_kernel <= err_xla * 1.25 + 1e-4, (err_kernel, err_xla)
