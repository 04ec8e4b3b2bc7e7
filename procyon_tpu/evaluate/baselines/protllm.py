"""ProtLLM-style QA baseline, native.

The reference's ProtLLM QA baseline
(procyon/evaluate/framework/ProtLLMQA.py:365-835 + procyon/model/protllm.py)
is an ESM-2-650M protein encoder whose mean-pooled embedding is linearly
projected (``prot2llm_linear``) into a Llama decoder's token space and
spliced into the prompt where the protein is mentioned; a binary
classification head reads the first token of each label word ("yes"/"no")
at the final position (protllm.py:243-320 ProtLlmForBinaryCls).

Native rebuild: our JAX ESM2 (models/esm2.py) + Llama (models/llama.py) +
one projector matrix; the yes/no decision is the softmax over the two
label-token logits at the last prompt position (same math as
``init_cls_head`` label2tok_ids scoring).
"""

import dataclasses
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from procyon_tpu.evaluate.qa import AbstractQAModel


@dataclasses.dataclass
class ProtLLMConfig:
    max_text_len: int = 128
    max_protein_len: int = 256
    batch_size: int = 8


class ProtLLMQAEval(AbstractQAModel):
    name = "protllm"

    def __init__(self, esm_params, esm_cfg, llama_params, llama_cfg,
                 projector, tokenizer, store, *,
                 cfg: Optional[ProtLLMConfig] = None,
                 prompt_template: str =
                 "Does the protein <|protein|> have the following "
                 "property? [EXT] Answer: "):
        self.esm_params = esm_params
        self.esm_cfg = esm_cfg
        self.llama_params = llama_params
        self.llama_cfg = llama_cfg
        self.projector = projector  # [esm_dim, llama_dim]
        self.tokenizer = tokenizer
        self.store = store
        self.cfg = cfg or ProtLLMConfig()
        self.prompt_template = prompt_template

        from procyon_tpu.models import esm2, llama

        @jax.jit
        def _prot_embed(params, proj, tokens):
            out = esm2.forward(params, esm_cfg, tokens)
            valid = (tokens != esm2.PAD_IDX).astype(jnp.float32)[..., None]
            pooled = (out["hidden"].astype(jnp.float32) * valid).sum(1) \
                / jnp.maximum(valid.sum(1), 1e-6)
            return pooled @ proj

        @jax.jit
        def _lm_logits(params, embeds, seg_ids, last_pos):
            out = llama.forward(params, llama_cfg, input_embeds=embeds,
                                seg_ids=seg_ids)
            logits = out["logits"].astype(jnp.float32)
            return logits[jnp.arange(logits.shape[0]), last_pos]

        self._prot_embed = _prot_embed
        self._lm_logits = _lm_logits

    @classmethod
    def synthetic(cls, store, *, seed: int = 0, **kw):
        from procyon_tpu.data.text_tokenizer import WordTokenizer
        from procyon_tpu.models import esm2, llama

        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        ecfg = esm2.tiny_config()
        lcfg = llama.tiny_config()
        proj = jax.random.normal(k3, (ecfg.dim, lcfg.dim),
                                 jnp.float32) / np.sqrt(ecfg.dim)
        return cls(esm2.init_params(k1, ecfg), ecfg,
                   llama.init_params(k2, lcfg), lcfg, proj,
                   WordTokenizer(vocab_size=lcfg.vocab_size), store, **kw)

    def _build_batch(self, samples: Sequence[Tuple[int, int]]):
        """samples: (aaseq_idx, text_idx). Returns (embeds, seg, last_pos)
        with the projected protein embedding spliced at <|protein|>."""
        from procyon_tpu.data import protein_tokenizer as pt

        spec = self.tokenizer.spec
        pb = pt.batch_encode(
            [self.store.protein_sequence(a) for a, _ in samples],
            max_len=self.cfg.max_protein_len)
        prot = np.asarray(self._prot_embed(
            self.esm_params, self.projector, jnp.asarray(pb.tokens)),
            np.float32)

        rows = []
        for a, t in samples:
            text = self.store.text(t)
            body = self.prompt_template.replace("[EXT]", text)
            ids = self.tokenizer.encode(body, add_bos=True)
            rows.append(ids[:self.cfg.max_text_len])
        S = max(len(r) for r in rows)
        B = len(rows)
        tok = np.zeros((B, S), np.int32)
        seg = np.zeros((B, S), np.int32)
        last = np.zeros((B,), np.int32)
        prot_pos = np.zeros((B,), np.int32)
        for i, r in enumerate(rows):
            tok[i, :len(r)] = r
            seg[i, :len(r)] = 1
            last[i] = len(r) - 1
            hits = [j for j, x in enumerate(r) if x == spec.protein_id]
            prot_pos[i] = hits[0] if hits else 0
        embeds = np.asarray(
            self.llama_params["embed"], np.float32)[tok]
        embeds[np.arange(B), prot_pos] = prot
        return jnp.asarray(embeds), jnp.asarray(seg), jnp.asarray(last)

    def get_predictions(self, dataset):
        """dataset: sequence of (aaseq_idx, text_idx, label)."""
        spec = self.tokenizer.spec
        yes_all, labels_all = [], []
        for s in range(0, len(dataset), self.cfg.batch_size):
            chunk = dataset[s:s + self.cfg.batch_size]
            embeds, seg, last = self._build_batch(
                [(a, t) for a, t, _ in chunk])
            at = np.asarray(self._lm_logits(self.llama_params, embeds, seg,
                                            last), np.float32)
            two = at[:, [spec.yes_id, spec.no_id]]
            two = two - two.max(axis=1, keepdims=True)
            p = np.exp(two)
            yes_all.append(p[:, 0] / p.sum(axis=1))
            labels_all.append([y for _, _, y in chunk])
        return np.concatenate(yes_all), np.concatenate(labels_all)
