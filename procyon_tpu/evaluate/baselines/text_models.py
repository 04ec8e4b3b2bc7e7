"""Native third-party baseline models: BioTranslator, ProtST,
PubMedBERT/SimCSE text encoders.

The reference implements these as real torch models
(procyon/evaluate/framework/biotranslator.py:27-80 one-hot CNN protein
tower + :171-217 HFTextEncoder text tower; framework/protst.py +
baseline_models/protst.py ESM tower + PubMedBERT tower with 2-layer MLP
projections; procyon/model/pubmedbert.py + simcse.py SimCSE-style pooled
text encoders).  Here they all ride the one JAX BERT encoder
(models/bert.py) and the JAX ESM2 encoder (models/esm2.py); the CNN tower
is native lax.conv.  Weight ingestion from the released torch ``.pth``
checkpoints goes through ``load_torch_state`` (torch-cpu is available for
unpickling only; all compute is JAX).

TPU-first notes: the 16 parallel conv1d towers of the DeepGOPlus CNN are
issued as 16 static XLA convs over a fixed [B, L, 21] layout and reduce to
global-max features on device; text/protein embedding sweeps batch through
one jitted function per tower.
"""

import dataclasses
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from procyon_tpu.evaluate.qa import AbstractQAModel
from procyon_tpu.evaluate.retrieval import AbstractRetrievalModel
from procyon_tpu.models import bert

# DeepGOPlus amino-acid ordering (biotranslator.py:37-66): index 0 is the
# out-of-range/padding channel, 1..20 the amino acids
AALETTER = "ARNDCQEGHILKMFPSTWYV"
AAINDEX = {c: i + 1 for i, c in enumerate(AALETTER)}


def one_hot_protein(seq: str, max_len: int = 2000) -> np.ndarray:
    """[L, 21] one-hot encoding (channel-last for TPU convs; the reference
    emits [21, L] for torch conv1d — same content, biotranslator.py:27-66).
    Unknown residues map to channel 0, as does padding."""
    out = np.zeros((max_len, 21), np.float32)
    n = min(max_len, len(seq))
    for i in range(n):
        out[i, AAINDEX.get(seq[i], 0)] = 1.0
    out[n:, 0] = 1.0
    return out


# ---------------------------------------------------------------------------
# BioTranslator protein tower: parallel-kernel CNN (DeepGOPlus)

@dataclasses.dataclass(frozen=True)
class CNNConfig:
    in_channels: int = 21
    out_channels: int = 512       # seq_in_nc
    max_kernel: int = 129         # kernels 8, 16, ..., 128
    seq_length: int = 2000
    hidden_dim: int = 1000

    @property
    def kernels(self):
        return tuple(range(8, self.max_kernel, 8))


def init_cnn_params(key, cfg: CNNConfig):
    ks = cfg.kernels
    keys = jax.random.split(key, len(ks) + 1)
    convs = []
    for i, k in enumerate(ks):
        fan_in = cfg.in_channels * k
        convs.append({
            "w": jax.random.normal(keys[i], (k, cfg.in_channels,
                                             cfg.out_channels),
                                   jnp.float32) / np.sqrt(fan_in),
            "b": jnp.zeros((cfg.out_channels,), jnp.float32),
        })
    fc_in = len(ks) * cfg.out_channels
    return {
        "convs": convs,
        "fc_w": jax.random.normal(keys[-1], (fc_in, cfg.hidden_dim),
                                  jnp.float32) / np.sqrt(fc_in),
        "fc_b": jnp.zeros((cfg.hidden_dim,), jnp.float32),
    }


@partial(jax.jit, static_argnames=("cfg",))
def cnn_forward(params, cfg: CNNConfig, x):
    """x [B, L, 21] one-hot -> [B, hidden_dim].

    Per kernel size k: valid conv over length, global max pool (the
    MaxPool1d(L-k+1) of biotranslator.py:120-136 IS a global max), concat,
    Linear + LeakyReLU."""
    feats = []
    for conv in params["convs"]:
        y = jax.lax.conv_general_dilated(
            x, conv["w"], window_strides=(1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"))
        feats.append(jnp.max(y + conv["b"], axis=1))
    h = jnp.concatenate(feats, axis=-1)
    return jax.nn.leaky_relu(h @ params["fc_w"] + params["fc_b"],
                             negative_slope=0.01)


# ---------------------------------------------------------------------------
# projections


@partial(jax.tree_util.register_dataclass, data_fields=("ws", "bs"),
         meta_fields=("act",))
@dataclasses.dataclass
class MLPProj:
    """Projection head pytree; ``act`` is static metadata so the tree jits
    cleanly as a function argument."""
    ws: List
    bs: List
    act: str = "relu"


def init_mlp_proj(key, d_in: int, d_out: int, *, kind: str = "mlp",
                  n_layers: int = 2, activation: str = "relu") -> MLPProj:
    """kind="mlp": open_clip-style bias-free Linear-GELU-Linear with hidden
    (d_in+d_out)//2 (biotranslator_tencoder.py:186-192); kind="tower_mlp":
    torchdrug layers.MLP d_in->d_in->d_out with ReLU + biases
    (baseline_models/protst.py:36-40); kind="linear": bias-free Linear."""
    if kind == "linear":
        return MLPProj(ws=[jax.random.normal(key, (d_in, d_out),
                                             jnp.float32) / np.sqrt(d_in)],
                       bs=[None], act=activation)
    if kind == "mlp":
        hidden = (d_in + d_out) // 2
        dims = [d_in, hidden, d_out]
        biases = False
        act = "gelu"
    elif kind == "tower_mlp":
        dims = [d_in] * n_layers + [d_out]
        biases = True
        act = activation
    else:
        raise ValueError(kind)
    keys = jax.random.split(key, len(dims) - 1)
    ws, bs = [], []
    for i in range(len(dims) - 1):
        ws.append(jax.random.normal(keys[i], (dims[i], dims[i + 1]),
                                    jnp.float32) / np.sqrt(dims[i]))
        bs.append(jnp.zeros((dims[i + 1],), jnp.float32) if biases
                  else None)
    return MLPProj(ws=ws, bs=bs, act=act)


def apply_proj(proj: Optional[MLPProj], x):
    if proj is None:
        return x
    act = jax.nn.gelu if proj.act == "gelu" else jax.nn.relu
    n = len(proj.ws)
    for i, (w, b) in enumerate(zip(proj.ws, proj.bs)):
        x = x @ w
        if b is not None:
            x = x + b
        if i < n - 1:
            x = act(x)
    return x


# ---------------------------------------------------------------------------
# text towers

class BertTextTower:
    """BERT encoder + pooler + optional projection; batches and jits the
    embedding sweep. Covers HFTextEncoder (cls pooler + mlp proj,
    BioTranslator), ProtST's PubMedBERT (mean readout over non-special +
    tower_mlp), and SimCSE/PubMedBERT poolers."""

    def __init__(self, params, cfg: bert.BertConfig, tokenizer, *,
                 pooler: str = "cls", proj=None, max_len: int = 256,
                 batch_size: int = 32, exclude_special_from_mean=False):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.pooler = pooler
        self.proj = proj
        self.max_len = max_len
        self.batch_size = batch_size
        self.exclude_special = exclude_special_from_mean

        @partial(jax.jit, static_argnames=())
        def _embed(params, proj, ids, pool_mask):
            out = bert.forward(params, cfg, ids)
            pooled = bert.pool(out["hidden"], pool_mask, self.pooler,
                               pooled=out["pooled"])
            return apply_proj(proj, pooled.astype(jnp.float32))

        self._embed = _embed

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        outs = []
        for s in range(0, len(texts), self.batch_size):
            chunk = list(texts[s:s + self.batch_size])
            enc = self.tokenizer.batch_encode(chunk, max_len=self.max_len)
            pool_mask = enc.attention_mask.astype(np.float32)
            if self.exclude_special and self.pooler in ("mean", "avg"):
                # ProtST mean readout skips CLS/SEP (protst.py:216-221)
                for sid in (self.tokenizer.cls_id, self.tokenizer.sep_id):
                    pool_mask[enc.ids == sid] = 0.0
            outs.append(np.asarray(
                self._embed(self.params, self.proj, jnp.asarray(enc.ids),
                            jnp.asarray(pool_mask)), np.float32))
        return np.concatenate(outs, 0) if outs else np.zeros((0, 1))


def _normalize(x):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-8)


# ---------------------------------------------------------------------------
# eval-framework wrappers

class BioTranslatorRetrievalEval(AbstractRetrievalModel):
    """Text query -> BERT text tower; protein target -> one-hot CNN tower;
    cosine sims (biotranslator.py:324-382)."""

    name = "biotranslator"

    def __init__(self, text_tower: BertTextTower, cnn_params,
                 cnn_cfg: CNNConfig, store, *, batch_size: int = 16):
        self.text_tower = text_tower
        self.cnn_params = cnn_params
        self.cnn_cfg = cnn_cfg
        self.store = store
        self.batch_size = batch_size

    @classmethod
    def synthetic(cls, store, *, seed: int = 0, embed_dim: int = 64,
                  cnn_cfg: Optional[CNNConfig] = None, tokenizer=None,
                  bert_cfg: Optional[bert.BertConfig] = None, **kw):
        """Randomly-initialized towers (no released checkpoint in env);
        exercises the full compute path."""
        from procyon_tpu.data.wordpiece import WordPieceTokenizer

        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        bcfg = bert_cfg or bert.tiny_config()
        bparams = bert.init_params(k1, bcfg)
        tok = tokenizer or WordPieceTokenizer.synthetic()
        proj = init_mlp_proj(k3, bcfg.dim, embed_dim, kind="mlp")
        tower = BertTextTower(bparams, bcfg, tok, pooler="cls", proj=proj)
        ccfg = cnn_cfg or CNNConfig(out_channels=32, max_kernel=33,
                                    seq_length=256, hidden_dim=embed_dim)
        cnn = init_cnn_params(k2, ccfg)
        return cls(tower, cnn, ccfg, store, **kw)

    def _target_embeddings(self, target_order) -> np.ndarray:
        outs = []
        for s in range(0, len(target_order), self.batch_size):
            chunk = target_order[s:s + self.batch_size]
            x = np.stack([one_hot_protein(self.store.protein_sequence(a),
                                          self.cnn_cfg.seq_length)
                          for a in chunk])
            outs.append(np.asarray(
                cnn_forward(self.cnn_params, self.cnn_cfg,
                            jnp.asarray(x)), np.float32))
        return np.concatenate(outs, 0)

    def get_predictions(self, query_order, target_order, dataset=None):
        q = _normalize(self.text_tower.embed_texts(
            [self.store.text(t) for t in query_order]))
        t = _normalize(self._target_embeddings(target_order))
        return q @ t.T


class ProtSTRetrievalEval(AbstractRetrievalModel):
    """ProtST (framework/protst.py): ESM protein tower (mean residue
    readout + 2-layer MLP to 512) vs PubMedBERT text tower (mean non-special
    readout + 2-layer MLP to 512), cosine sims."""

    name = "protst"

    def __init__(self, text_tower: BertTextTower, esm_params, esm_cfg,
                 graph_proj, store, *, batch_size: int = 8,
                 max_protein_len: int = 512):
        self.text_tower = text_tower
        self.esm_params = esm_params
        self.esm_cfg = esm_cfg
        self.graph_proj = graph_proj
        self.store = store
        self.batch_size = batch_size
        self.max_protein_len = max_protein_len

        from procyon_tpu.models import esm2

        @jax.jit
        def _embed_prot(params, proj, tokens):
            out = esm2.forward(params, esm_cfg, tokens)
            # mean over residues only (protst.py:73-79: CLS/EOS stripped)
            valid = ((tokens != esm2.PAD_IDX) & (tokens != esm2.CLS_IDX)
                     & (tokens != esm2.EOS_IDX)).astype(jnp.float32)
            m = valid[..., None]
            pooled = (out["hidden"].astype(jnp.float32) * m).sum(1) \
                / jnp.maximum(m.sum(1), 1e-6)
            return apply_proj(proj, pooled)

        self._embed_prot = _embed_prot

    @classmethod
    def synthetic(cls, store, *, seed: int = 0, embed_dim: int = 64, **kw):
        from procyon_tpu.data.wordpiece import WordPieceTokenizer
        from procyon_tpu.models import esm2

        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
        bcfg = bert.tiny_config()
        tower = BertTextTower(
            bert.init_params(k1, bcfg), bcfg,
            WordPieceTokenizer.synthetic(), pooler="mean",
            proj=init_mlp_proj(k3, bcfg.dim, embed_dim, kind="tower_mlp"),
            exclude_special_from_mean=True)
        ecfg = esm2.tiny_config()
        eparams = esm2.init_params(k2, ecfg)
        gproj = init_mlp_proj(k4, ecfg.dim, embed_dim, kind="tower_mlp")
        return cls(tower, eparams, ecfg, gproj, store, **kw)

    def _target_embeddings(self, target_order) -> np.ndarray:
        from procyon_tpu.data import protein_tokenizer as pt

        outs = []
        for s in range(0, len(target_order), self.batch_size):
            chunk = target_order[s:s + self.batch_size]
            pb = pt.batch_encode(
                [self.store.protein_sequence(a) for a in chunk],
                max_len=self.max_protein_len)
            outs.append(np.asarray(
                self._embed_prot(self.esm_params, self.graph_proj,
                                 jnp.asarray(pb.tokens)), np.float32))
        return np.concatenate(outs, 0)

    def get_predictions(self, query_order, target_order, dataset=None):
        q = _normalize(self.text_tower.embed_texts(
            [self.store.text(t) for t in query_order]))
        t = _normalize(self._target_embeddings(target_order))
        return q @ t.T


class TextEncoderRetrievalEval(AbstractRetrievalModel):
    """PubMedBERT / SimCSE text-encoder baseline: both sides embedded by
    the same pooled BERT encoder — queries are phenotype descriptions,
    targets are the proteins' functional descriptions (supplied via
    ``target_text_fn``). Mirrors the reference's SimCSE/PubMedBERT usage as
    pure text encoders (procyon/model/pubmedbert.py:20-84, simcse.py)."""

    name = "text_encoder"

    def __init__(self, tower: BertTextTower, store,
                 target_text_fn: Callable[[int], str]):
        self.tower = tower
        self.store = store
        self.target_text_fn = target_text_fn

    @classmethod
    def synthetic(cls, store, target_text_fn, *, seed: int = 0,
                  pooler: str = "cls"):
        from procyon_tpu.data.wordpiece import WordPieceTokenizer

        cfg = bert.tiny_config()
        tower = BertTextTower(
            bert.init_params(jax.random.PRNGKey(seed), cfg), cfg,
            WordPieceTokenizer.synthetic(), pooler=pooler)
        return cls(tower, store, target_text_fn)

    def get_predictions(self, query_order, target_order, dataset=None):
        q = _normalize(self.tower.embed_texts(
            [self.store.text(t) for t in query_order]))
        t = _normalize(self.tower.embed_texts(
            [self.target_text_fn(a) for a in target_order]))
        return q @ t.T


# ---------------------------------------------------------------------------
# released-checkpoint ingestion (torch .pth unpickle -> numpy -> our trees)

def load_torch_state(path: str) -> Dict[str, np.ndarray]:
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if "model" in state and isinstance(state["model"], dict):
        state = state["model"]
    # detach: checkpoints saved from live modules can hold Parameters with
    # requires_grad=True, on which .numpy() raises
    return {k: v.detach().float().numpy() for k, v in state.items()
            if hasattr(v, "numpy")}


def convert_biotranslator_text(state: Dict[str, np.ndarray],
                               dtype=jnp.bfloat16):
    """Map the released BioTranslator text_encoder ``.pth``
    (TextEncoder: ``text.transformer.*`` BERT weights + ``text.proj.*``
    mlp head, biotranslator.py:171-217) to (bert_params, bert_cfg,
    MLPProj)."""
    bert_state = {k[len("text.transformer."):]: v for k, v in state.items()
                  if k.startswith("text.transformer.")}
    params, cfg = bert.convert_hf_state(bert_state, dtype=dtype)
    proj_ws = {int(k.split(".")[2]): v.T for k, v in state.items()
               if k.startswith("text.proj.") and k.endswith(".weight")}
    proj = MLPProj(ws=[jnp.asarray(proj_ws[i], jnp.float32)
                       for i in sorted(proj_ws)],
                   bs=[None] * len(proj_ws), act="gelu") \
        if proj_ws else None
    return params, cfg, proj


def convert_biotranslator_cnn(state: Dict[str, np.ndarray],
                              cfg: CNNConfig):
    """Map the released BioTranslator data_encoder ``.pth``
    (conv1d_{i}.weight [C_out, C_in, k] torch layout) to our
    [k, C_in, C_out] conv trees + fc."""
    convs = []
    for i, _ in enumerate(cfg.kernels):
        w = state[f"conv1d_{i}.weight"]        # [C_out, C_in, k]
        convs.append({"w": jnp.asarray(w.transpose(2, 1, 0)),
                      "b": jnp.asarray(state[f"conv1d_{i}.bias"])})
    return {"convs": convs,
            "fc_w": jnp.asarray(state["fc_seq.0.weight"].T),
            "fc_b": jnp.asarray(state["fc_seq.0.bias"])}
