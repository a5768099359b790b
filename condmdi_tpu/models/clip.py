"""CLIP ViT-B/32 text tower in Flax + tokenizer + checkpoint converter.

The reference conditions on a frozen CLIP text encoder loaded through the
`clip` package (mdm.py:173 load_and_freeze_clip, :214 encode_text with the
context_length=22 + zero-pad-to-77 trick). This module provides the same
capability natively:

  * `ClipTextModel` — the text transformer (vocab 49408, ctx 77, width 512,
    12 pre-LN layers, 8 heads, QuickGELU, causal mask, ln_final,
    text_projection; features taken at the EOT token = argmax of ids).
  * `convert_clip_text_state_dict` — maps an OpenAI CLIP state dict onto the
    Flax tree (drop-in for a locally available ViT-B/32 checkpoint).
  * `ClipTokenizer` — byte-pair tokenizer; needs the standard
    `bpe_simple_vocab_16e6.txt.gz` vocabulary file (gated: text conditioning
    falls back to models.text encoders when absent).
  * `encode_text(...)` — the reference's 22-token trick reproduced.
"""

from __future__ import annotations

import gzip
import html
from functools import lru_cache
from pathlib import Path
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from condmdi_tpu.ops.attention import _xla_attention

Array = jax.Array

CLIP_VOCAB = 49408
CLIP_CTX = 77
CLIP_WIDTH = 512
CLIP_LAYERS = 12
CLIP_HEADS = 8


def quick_gelu(x: Array) -> Array:
    return x * jax.nn.sigmoid(1.702 * x)


class ClipResidualBlock(nn.Module):
    width: int = CLIP_WIDTH
    heads: int = CLIP_HEADS

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        qkv = nn.Dense(3 * self.width, name="attn_in")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        a = _xla_attention(q, k, v, self.heads, causal=True)
        x = x + nn.Dense(self.width, name="attn_out")(a)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(self.width * 4, name="mlp_fc")(h)
        h = quick_gelu(h)
        x = x + nn.Dense(self.width, name="mlp_proj")(h)
        return x


class ClipTextModel(nn.Module):
    vocab_size: int = CLIP_VOCAB
    context_length: int = CLIP_CTX
    width: int = CLIP_WIDTH
    layers: int = CLIP_LAYERS
    heads: int = CLIP_HEADS
    embed_dim: int = 512

    @nn.compact
    def __call__(self, token_ids: Array) -> Array:
        """token_ids [B, 77] int → text features [B, embed_dim]."""
        tok = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (self.vocab_size, self.width),
        )
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = tok[token_ids] + pos[None, : token_ids.shape[1]]
        for i in range(self.layers):
            x = ClipResidualBlock(self.width, self.heads, name=f"block{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        proj = self.param(
            "text_projection", nn.initializers.normal(0.02),
            (self.width, self.embed_dim),
        )
        eot = jnp.argmax(token_ids, axis=-1)  # EOT has the highest token id
        feats = x[jnp.arange(x.shape[0]), eot]
        return feats @ proj


def convert_clip_text_state_dict(sd: dict) -> dict:
    """OpenAI CLIP state dict (text tower keys) → Flax params tree."""

    def npy(t):
        if hasattr(t, "detach"):
            t = t.detach().cpu().float().numpy()
        return np.asarray(t, dtype=np.float32)

    p: dict = {
        "token_embedding": npy(sd["token_embedding.weight"]),
        "positional_embedding": npy(sd["positional_embedding"]),
        "text_projection": npy(sd["text_projection"]),
        "ln_final": {"scale": npy(sd["ln_final.weight"]), "bias": npy(sd["ln_final.bias"])},
    }
    i = 0
    while f"transformer.resblocks.{i}.ln_1.weight" in sd:
        pre = f"transformer.resblocks.{i}"
        p[f"block{i}"] = {
            "ln_1": {"scale": npy(sd[f"{pre}.ln_1.weight"]), "bias": npy(sd[f"{pre}.ln_1.bias"])},
            "ln_2": {"scale": npy(sd[f"{pre}.ln_2.weight"]), "bias": npy(sd[f"{pre}.ln_2.bias"])},
            "attn_in": {
                "kernel": npy(sd[f"{pre}.attn.in_proj_weight"]).T,
                "bias": npy(sd[f"{pre}.attn.in_proj_bias"]),
            },
            "attn_out": {
                "kernel": npy(sd[f"{pre}.attn.out_proj.weight"]).T,
                "bias": npy(sd[f"{pre}.attn.out_proj.bias"]),
            },
            "mlp_fc": {
                "kernel": npy(sd[f"{pre}.mlp.c_fc.weight"]).T,
                "bias": npy(sd[f"{pre}.mlp.c_fc.bias"]),
            },
            "mlp_proj": {
                "kernel": npy(sd[f"{pre}.mlp.c_proj.weight"]).T,
                "bias": npy(sd[f"{pre}.mlp.c_proj.bias"]),
            },
        }
        i += 1
    return {"params": p}


# --------------------------------------------------------------------------- #
# BPE tokenizer (standard CLIP BPE; requires the public vocab file)
# --------------------------------------------------------------------------- #
@lru_cache()
def _bytes_to_unicode():
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


class ClipTokenizer:
    """CLIP's lowercase BPE over byte-encoded text (standard algorithm)."""

    def __init__(self, bpe_path: Optional[str] = None):
        import re

        path = bpe_path or self._find_vocab()
        if path is None:
            raise FileNotFoundError(
                "bpe_simple_vocab_16e6.txt.gz not found; set CONDMDI_CLIP_BPE"
            )
        merges = gzip.open(path, "rt", encoding="utf-8").read().split("\n")
        merges = [tuple(m.split()) for m in merges[1 : 49152 - 256 - 2 + 1]]
        self.byte_encoder = _bytes_to_unicode()
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {v: i for i, v in enumerate(vocab)}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {}
        self.pat = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"
            if False
            else r"'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+",
            re.IGNORECASE,
        )

    @staticmethod
    def _find_vocab() -> Optional[str]:
        import os

        for c in (
            os.environ.get("CONDMDI_CLIP_BPE", ""),
            "assets/bpe_simple_vocab_16e6.txt.gz",
            "bpe_simple_vocab_16e6.txt.gz",
        ):
            if c and Path(c).exists():
                return c
        return None

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                    new_word.extend(word[i:j])
                    i = j
                except ValueError:
                    new_word.extend(word[i:])
                    break
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> list[int]:
        text = html.unescape(html.unescape(text)).strip().lower()
        ids = []
        for tok in self.pat.findall(text):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(tok).split(" "))
        return ids

    def tokenize(
        self, texts: Sequence[str], context_length: int = CLIP_CTX, truncate: bool = True
    ) -> np.ndarray:
        sot = self.encoder["<|startoftext|>"]
        eot = self.encoder["<|endoftext|>"]
        out = np.zeros((len(texts), context_length), np.int32)
        for i, t in enumerate(texts):
            toks = [sot] + self.encode(t) + [eot]
            if len(toks) > context_length:
                if not truncate:
                    raise ValueError(f"too long: {t}")
                toks = toks[: context_length - 1] + [eot]
            out[i, : len(toks)] = toks
        return out


class ClipTextEncoder:
    """Drop-in TextEncoder producing real CLIP embeddings.

    Reproduces the reference's humanml trick (mdm.py:214-231): tokenize with
    context_length = max_text_len(20) + 2, zero-pad to 77.
    """

    def __init__(self, params: dict, tokenizer: Optional[ClipTokenizer] = None,
                 max_text_len: Optional[int] = 20):
        self.model = ClipTextModel()
        self.params = params
        self.tokenizer = tokenizer or ClipTokenizer()
        self.max_text_len = max_text_len
        self._apply = jax.jit(lambda ids: self.model.apply(self.params, ids))

    @classmethod
    def from_torch_checkpoint(cls, path: str, **kw) -> "ClipTextEncoder":
        import torch

        blob = torch.load(path, map_location="cpu", weights_only=False)
        sd = blob.state_dict() if hasattr(blob, "state_dict") else blob
        return cls(convert_clip_text_state_dict(sd), **kw)

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        if self.max_text_len is not None:
            ctx = self.max_text_len + 2
            ids = self.tokenizer.tokenize(texts, context_length=ctx)
            ids = np.pad(ids, ((0, 0), (0, CLIP_CTX - ctx)))
        else:
            ids = self.tokenizer.tokenize(texts)
        return np.asarray(self._apply(jnp.asarray(ids)))
