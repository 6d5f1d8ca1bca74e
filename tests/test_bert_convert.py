"""BERT checkpoint-conversion parity: an exact-HF-named torch oracle ->
``convert_hf_bert_params`` -> flax ``BertEncoder``.

Same pattern as test_convert_parity.py (VQGAN/CLIP): build a torch module
replicating the HF ``BertModel`` architecture with its exact state_dict
naming, run both on the same inputs, and require matching hidden states.
This validates the key mapping + transposes of the converter that feeds
pretrained SpanBERT into v1 training (reference ``train.py:68``).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from imagegenerator_tpu.models.bert import (
    BertConfig,
    BertEncoder,
    config_from_state_dict,
    convert_hf_bert_params,
    load_bert_checkpoint,
)

torch.manual_seed(0)


class THFBertLayer(nn.Module):
    """One HF BertLayer with exact submodule naming
    (attention.self.{query,key,value}, attention.output.{dense,LayerNorm},
    intermediate.dense, output.{dense,LayerNorm})."""

    def __init__(self, cfg: BertConfig):
        super().__init__()
        h = cfg.hidden_size
        self.attention = nn.Module()
        self.attention.self = nn.Module()
        self.attention.self.query = nn.Linear(h, h)
        self.attention.self.key = nn.Linear(h, h)
        self.attention.self.value = nn.Linear(h, h)
        self.attention.output = nn.Module()
        self.attention.output.dense = nn.Linear(h, h)
        self.attention.output.LayerNorm = nn.LayerNorm(h, eps=cfg.layer_norm_eps)
        self.intermediate = nn.Module()
        self.intermediate.dense = nn.Linear(h, cfg.intermediate_size)
        self.output = nn.Module()
        self.output.dense = nn.Linear(cfg.intermediate_size, h)
        self.output.LayerNorm = nn.LayerNorm(h, eps=cfg.layer_norm_eps)
        self.nh = cfg.num_heads
        self.hd = h // cfg.num_heads

    def forward(self, x, mask):
        B, T, H = x.shape
        split = lambda t: t.view(B, T, self.nh, self.hd).permute(0, 2, 1, 3)
        q = split(self.attention.self.query(x))
        k = split(self.attention.self.key(x))
        v = split(self.attention.self.value(x))
        logits = q @ k.transpose(-1, -2) / math.sqrt(self.hd)
        if mask is not None:
            logits = logits.masked_fill(
                mask[:, None, None, :] == 0, torch.finfo(logits.dtype).min
            )
        probs = torch.softmax(logits, dim=-1)
        ctx = (probs @ v).permute(0, 2, 1, 3).reshape(B, T, H)
        attn = self.attention.output.dense(ctx)
        x = self.attention.output.LayerNorm(x + attn)
        y = self.output.dense(nn.functional.gelu(self.intermediate.dense(x)))
        return self.output.LayerNorm(x + y)


class THFBert(nn.Module):
    def __init__(self, cfg: BertConfig):
        super().__init__()
        self.embeddings = nn.Module()
        self.embeddings.word_embeddings = nn.Embedding(
            cfg.vocab_size, cfg.hidden_size
        )
        self.embeddings.position_embeddings = nn.Embedding(
            cfg.max_position_embeddings, cfg.hidden_size
        )
        self.embeddings.token_type_embeddings = nn.Embedding(
            cfg.type_vocab_size, cfg.hidden_size
        )
        self.embeddings.LayerNorm = nn.LayerNorm(
            cfg.hidden_size, eps=cfg.layer_norm_eps
        )
        self.encoder = nn.Module()
        self.encoder.layer = nn.ModuleList(
            [THFBertLayer(cfg) for _ in range(cfg.num_layers)]
        )

    def forward(self, ids, mask):
        T = ids.shape[1]
        x = (
            self.embeddings.word_embeddings(ids)
            + self.embeddings.position_embeddings(
                torch.arange(T, device=ids.device)[None, :]
            )
            + self.embeddings.token_type_embeddings(torch.zeros_like(ids))
        )
        x = self.embeddings.LayerNorm(x)
        for layer in self.encoder.layer:
            x = layer(x, mask)
        return x


def _parity_case(cfg, prefix=""):
    oracle = THFBert(cfg).eval()
    sd = {f"{prefix}{k}": v for k, v in oracle.state_dict().items()}

    ids = torch.randint(0, cfg.vocab_size, (3, 12))
    mask = torch.ones(3, 12, dtype=torch.long)
    mask[1, 7:] = 0
    mask[2, 4:] = 0
    with torch.no_grad():
        want = oracle(ids, mask).numpy()

    params = convert_hf_bert_params(sd, cfg)
    enc = BertEncoder(cfg)
    got = enc.apply(
        {"params": params},
        jnp.asarray(ids.numpy()),
        jnp.asarray(mask.numpy()),
        deterministic=True,
    )
    # padded positions attend to real tokens only, but their own outputs
    # are junk in both frameworks; compare the attended region
    got = np.asarray(got)
    for b, n in ((0, 12), (1, 7), (2, 4)):
        np.testing.assert_allclose(
            got[b, :n], want[b, :n], rtol=2e-4, atol=2e-5
        )


def test_convert_parity_tiny():
    _parity_case(
        BertConfig(
            vocab_size=97,
            hidden_size=32,
            num_layers=2,
            num_heads=4,
            intermediate_size=64,
            max_position_embeddings=32,
        )
    )


def test_convert_parity_bert_prefixed_keys():
    """HF full-model checkpoints prefix everything with ``bert.``."""
    _parity_case(
        BertConfig(
            vocab_size=53,
            hidden_size=16,
            num_layers=1,
            num_heads=2,
            intermediate_size=24,
            max_position_embeddings=16,
        ),
        prefix="bert.",
    )


def test_config_inference_and_checkpoint_load(tmp_path):
    """load_bert_checkpoint: torch file -> (params, inferred config) whose
    encoder produces the oracle's hidden states (head count inferred as
    hidden/64, so use a 64-per-head oracle)."""
    cfg = BertConfig(
        vocab_size=211,
        hidden_size=128,
        num_layers=2,
        num_heads=2,
        intermediate_size=96,
        max_position_embeddings=40,
        type_vocab_size=2,
    )
    oracle = THFBert(cfg).eval()
    path = tmp_path / "pytorch_model.bin"
    torch.save(oracle.state_dict(), str(path))

    inferred = config_from_state_dict(oracle.state_dict())
    assert inferred.vocab_size == 211
    assert inferred.hidden_size == 128
    assert inferred.num_layers == 2
    assert inferred.num_heads == 2
    assert inferred.intermediate_size == 96
    assert inferred.max_position_embeddings == 40

    params, loaded_cfg = load_bert_checkpoint(str(path))
    assert loaded_cfg == inferred

    ids = torch.randint(0, cfg.vocab_size, (2, 10))
    mask = torch.ones(2, 10, dtype=torch.long)
    with torch.no_grad():
        want = oracle(ids, mask).numpy()
    got = BertEncoder(loaded_cfg).apply(
        {"params": params},
        jnp.asarray(ids.numpy()),
        jnp.asarray(mask.numpy()),
        deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_cli_trains_from_bert_checkpoint(tmp_path):
    """End-to-end smoke: --bert_checkpoint feeds a converted synthetic
    SpanBERT-shaped checkpoint into one epoch of tiny stage-1 training
    (the pretrained-encoder wiring of reference train.py:68)."""
    import io
    import json

    from PIL import Image

    from imagegenerator_tpu.data import open_store
    from imagegenerator_tpu.train import cli

    cfg = BertConfig(
        vocab_size=64,
        hidden_size=16,
        num_layers=1,
        num_heads=2,
        intermediate_size=24,
        max_position_embeddings=16,
    )
    ckpt = tmp_path / "spanbert.bin"
    torch.save(THFBert(cfg).state_dict(), str(ckpt))

    store = open_store("mem://bert-cli-smoke")
    rng = np.random.default_rng(0)
    images, annotations = [], []
    # batch_size is per-device and the conftest mesh has 8 virtual CPU
    # devices -> global batch 16; 16 samples = exactly one real step
    for i in range(16):
        buf = io.BytesIO()
        Image.fromarray(
            rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
        ).save(buf, format="PNG")
        store.write_bytes(f"imgs/img{i}.png", buf.getvalue())
        images.append({"id": i, "file_name": f"img{i}.png"})
        annotations.append({"image_id": i, "caption": f"a caption {i}"})
    store.write_text(
        "ann/captions.json",
        json.dumps({"images": images, "annotations": annotations}),
    )

    cli.main(
        [
            "--stage", "1",
            "--tiny",
            "--data", "mem://bert-cli-smoke",
            "--root", "imgs",
            "--ann_file", "ann/captions.json",
            "--batch_size", "2",
            "--num_epochs", "1",
            "--n_critic", "1",
            "--seq_len", "8",
            "--bert_checkpoint", str(ckpt),
            "--checkpoint_dir", str(tmp_path / "ckpts"),
        ]
    )
    # the run checkpointed epoch 0 — proof it completed a full epoch
    assert (tmp_path / "ckpts" / "Stage1" / "LATEST_EPOCH").exists()


def test_converted_params_match_init_structure():
    """Converted trees must be drop-in replacements for randomly
    initialized ones (same treedef + shapes) so optimizer states line up."""
    cfg = BertConfig.tiny()
    oracle = THFBert(cfg)
    params = convert_hf_bert_params(oracle.state_dict(), cfg)
    ref = BertEncoder(cfg).init(
        jax.random.key(0),
        jnp.zeros((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32),
    )["params"]
    assert jax.tree.structure(params) == jax.tree.structure(ref)
    got_shapes = jax.tree.map(lambda x: x.shape, params)
    ref_shapes = jax.tree.map(lambda x: x.shape, ref)
    assert got_shapes == ref_shapes


def test_gelu_tanh_flavor_runs_and_differs():
    """gelu_approximate=True (the --gelu tanh / BENCH_GELU=tanh fast
    path) must produce close-but-not-identical hidden states vs the
    HF-faithful exact-erf default on the same params."""
    import dataclasses

    cfg = BertConfig.tiny()
    enc_exact = BertEncoder(cfg)
    enc_tanh = BertEncoder(dataclasses.replace(cfg, gelu_approximate=True))
    ids = jnp.arange(12, dtype=jnp.int32)[None, :] % cfg.vocab_size
    params = enc_exact.init(jax.random.key(0), ids)["params"]
    out_exact = enc_exact.apply({"params": params}, ids)
    out_tanh = enc_tanh.apply({"params": params}, ids)
    assert out_exact.shape == out_tanh.shape
    diff = float(jnp.max(jnp.abs(out_exact - out_tanh)))
    assert 0.0 < diff < 0.05, diff
