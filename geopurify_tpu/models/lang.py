"""CLIP-style language encoder + tokenizer + prompt engineering.

TPU-native rebuild of the reference's LanguageEncoder
(reference third_party/X-Decoder/xdecoder/modeling/language/vlpencoder.py:20-271,
LangEncoder/transformer.py:81-210): token embedding + learned positional
embedding, 12 causal post-norm transformer blocks (width 512, 8 heads), final
LayerNorm, pooled at the EOT position (argmax of input ids), projected to the
512-d joint space, L2-normalized. ``embed_class_names`` averages the ~80
standard CLIP prompt templates per class (vlpencoder.py:102-126).

Tokenization: a faithful CLIP byte-pair tokenizer when the public
``bpe_simple_vocab_16e6.txt.gz`` asset is available; otherwise a deterministic
hash tokenizer with identical interface (zero-egress environments can still
exercise the full text stack and swap in the real vocab later).
"""

from __future__ import annotations

import gzip
import hashlib
import html
import os
from functools import lru_cache
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

# Standard CLIP ImageNet prompt templates (public constants; the reference
# vendors the same list in utils/prompt_engineering.py:4-89).
PROMPT_TEMPLATES: Tuple[str, ...] = (
    '{}.', 'a photo of a {}.', 'a bad photo of a {}.', 'a photo of many {}.',
    'a sculpture of a {}.', 'a photo of the hard to see {}.',
    'a low resolution photo of the {}.', 'a rendering of a {}.',
    'graffiti of a {}.', 'a bad photo of the {}.', 'a cropped photo of the {}.',
    'a tattoo of a {}.', 'the embroidered {}.', 'a photo of a hard to see {}.',
    'a bright photo of a {}.', 'a photo of a clean {}.', 'a photo of a dirty {}.',
    'a dark photo of the {}.', 'a drawing of a {}.', 'a photo of my {}.',
    'the plastic {}.', 'a photo of the cool {}.', 'a close-up photo of a {}.',
    'a black and white photo of the {}.', 'a painting of the {}.',
    'a painting of a {}.', 'a pixelated photo of the {}.', 'a sculpture of the {}.',
    'a bright photo of the {}.', 'a cropped photo of a {}.', 'a plastic {}.',
    'a photo of the dirty {}.', 'a jpeg corrupted photo of a {}.',
    'a blurry photo of the {}.', 'a photo of the {}.', 'a good photo of the {}.',
    'a rendering of the {}.', 'a {} in a video game.', 'a photo of one {}.',
    'a doodle of a {}.', 'a close-up photo of the {}.', 'the origami {}.',
    'the {} in a video game.', 'a sketch of a {}.', 'a doodle of the {}.',
    'a origami {}.', 'a low resolution photo of a {}.', 'the toy {}.',
    'a rendition of the {}.', 'a photo of the clean {}.', 'a photo of a large {}.',
    'a rendition of a {}.', 'a photo of a nice {}.', 'a photo of a weird {}.',
    'a blurry photo of a {}.', 'a cartoon {}.', 'art of a {}.',
    'a sketch of the {}.', 'a embroidered {}.', 'a pixelated photo of a {}.',
    'itap of the {}.', 'a jpeg corrupted photo of the {}.', 'a good photo of a {}.',
    'a plushie {}.', 'a photo of the nice {}.', 'a photo of the small {}.',
    'a photo of the weird {}.', 'the cartoon {}.', 'art of the {}.',
    'a drawing of the {}.', 'a photo of the large {}.',
    'a black and white photo of a {}.', 'the plushie {}.', 'a dark photo of a {}.',
    'itap of a {}.', 'graffiti of the {}.', 'a toy {}.', 'itap of my {}.',
    'a photo of a cool {}.', 'a photo of a small {}.', 'a tattoo of the {}.',
)


# ---------------------------------------------------------------------------
# Tokenizers
# ---------------------------------------------------------------------------

@lru_cache()
def _bytes_to_unicode():
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
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


def _basic_clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    return text.strip()


def _whitespace_clean(text: str) -> str:
    return " ".join(text.split())


class ClipBPETokenizer:
    """The CLIP byte-pair tokenizer (public algorithm); needs the merges file."""

    def __init__(self, bpe_path: str, context_length: int = 77):
        import regex as re

        self._re = re
        self.context_length = context_length
        with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
            merges = f.read().split("\n")
        merges = merges[1 : 49152 - 256 - 2 + 1]
        # keep only real pair lines: the released 16e6 vocab exactly fills
        # the slice (filtering is a no-op there), but truncated/toy vocab
        # files leave trailing empty lines that would become bogus ()-merges
        # and shift every id after them
        merges = [m for m in (tuple(m.split()) for m in merges) if len(m) == 2]
        self.byte_encoder = _bytes_to_unicode()
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = dict(zip(vocab, range(len(vocab))))
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }
        self.pat = re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE,
        )
        self.vocab_size = len(self.encoder)
        self.sot = self.encoder["<|startoftext|>"]
        self.eot = self.encoder["<|endoftext|>"]

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

    def encode(self, text: str) -> List[int]:
        bpe_tokens: List[int] = []
        text = _whitespace_clean(_basic_clean(text)).lower()
        for token in self._re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(self.encoder[t] for t in self._bpe(token).split(" "))
        return bpe_tokens

    def __call__(self, texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (input_ids [B,L], attention_mask [B,L]) padded/truncated."""
        L = self.context_length
        ids = np.zeros((len(texts), L), np.int32)
        mask = np.zeros((len(texts), L), np.int32)
        for i, t in enumerate(texts):
            toks = [self.sot] + self.encode(t)[: L - 2] + [self.eot]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return ids, mask

    def decode(self, ids: Sequence[int]) -> str:
        """Ids -> text, stopping at EOT and dropping SOT (the captioning
        batch_decode + '<|endoftext|>' split, interface/xdecoder.py:411-419)."""
        if not hasattr(self, "_decoder"):
            self._decoder = {v: k for k, v in self.encoder.items()}
            self._byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        parts = []
        for i in ids:
            i = int(i)
            if i == self.eot:
                break
            if i == self.sot:
                continue
            parts.append(self._decoder.get(i, ""))
        text = "".join(parts)
        raw = bytearray(self._byte_decoder[c] for c in text.replace("</w>", "Ġ"))
        return raw.decode("utf-8", errors="replace").replace("Ġ", " ").strip()


class HashTokenizer:
    """Deterministic stand-in with the CLIP interface: per-word hashing, SOT/EOT
    as the top two ids so EOT stays the argmax position (vlpencoder.py:149-151)."""

    def __init__(self, vocab_size: int = 49408, context_length: int = 77):
        self.vocab_size = vocab_size
        self.context_length = context_length
        self.sot = vocab_size - 2
        self.eot = vocab_size - 1

    def encode(self, text: str) -> List[int]:
        words = _whitespace_clean(_basic_clean(text)).lower().split()
        out = []
        for w in words:
            h = int(hashlib.md5(w.encode()).hexdigest(), 16)
            out.append(h % (self.vocab_size - 2))
        return out

    def __call__(self, texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        L = self.context_length
        ids = np.zeros((len(texts), L), np.int32)
        mask = np.zeros((len(texts), L), np.int32)
        for i, t in enumerate(texts):
            toks = [self.sot] + self.encode(t)[: L - 2] + [self.eot]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return ids, mask

    def decode(self, ids: Sequence[int]) -> str:
        """Hashing is one-way — emit ``<id>`` placeholders (stops at EOT,
        drops SOT) so decode round-trips structurally for smoke tests."""
        out = []
        for i in ids:
            i = int(i)
            if i == self.eot:
                break
            if i == self.sot:
                continue
            out.append(f"<{i}>")
        return " ".join(out)


def build_tokenizer(vocab_path: Optional[str] = None, context_length: int = 77):
    if vocab_path and os.path.exists(vocab_path):
        return ClipBPETokenizer(vocab_path, context_length)
    return HashTokenizer(context_length=context_length)


# ---------------------------------------------------------------------------
# Text transformer
# ---------------------------------------------------------------------------

class TextTransformerBlock(nn.Module):
    width: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        from geopurify_tpu.models.layers import MultiHeadAttention

        # the reference tower's LayerNorm uses eps=1e-12 (TF-style, its own
        # LayerNorm class) and the MLP uses CLIP's QuickGELU x*sigmoid(1.702x)
        # — both torch-oracle-pinned (LangEncoder/transformer.py:21-41)
        h = nn.LayerNorm(
            epsilon=1e-12, dtype=jnp.float32, name="ln_1"
        )(x).astype(self.dtype)
        x = x + MultiHeadAttention(self.width, self.heads, self.dtype, name="attn")(
            h, h, h, mask=causal_mask
        )
        h = nn.LayerNorm(
            epsilon=1e-12, dtype=jnp.float32, name="ln_2"
        )(x).astype(self.dtype)
        h = nn.Dense(self.width * 4, dtype=self.dtype, name="mlp_c_fc")(h)
        h = h * jax.nn.sigmoid(1.702 * h)          # QuickGELU
        h = nn.Dense(self.width, dtype=self.dtype, name="mlp_c_proj")(h)
        return x + h


class TextTransformer(nn.Module):
    """Causal CLIP text tower (LangEncoder/transformer.py:81-210)."""

    vocab_size: int = 49408
    width: int = 512
    layers: int = 12
    heads: int = 8
    context_length: int = 77
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:  # [B,L] -> [B,L,W]
        tok = nn.Embed(
            self.vocab_size, self.width, dtype=self.dtype, name="token_embedding"
        )(input_ids)
        pos = self.param(
            "positional_embedding",
            nn.initializers.truncated_normal(0.02),
            (self.context_length, self.width),
        )
        x = tok + pos[None, : input_ids.shape[1]].astype(self.dtype)
        L = input_ids.shape[1]
        causal = jnp.triu(jnp.ones((L, L), bool), k=1)[None, None]
        for i in range(self.layers):
            x = TextTransformerBlock(
                self.width, self.heads, self.dtype, name=f"resblocks{i}"
            )(x, causal)
        return nn.LayerNorm(
            epsilon=1e-12, dtype=jnp.float32, name="ln_final"
        )(x).astype(self.dtype)


class LanguageEncoder(nn.Module):
    """Text tower + projection + logit scale (vlpencoder.py:20-185)."""

    vocab_size: int = 49408
    width: int = 512
    layers: int = 12
    heads: int = 8
    context_length: int = 77
    dim_proj: int = 512
    dtype: Dtype = jnp.float32

    def setup(self):
        self.transformer = TextTransformer(
            self.vocab_size, self.width, self.layers, self.heads,
            self.context_length, self.dtype, name="lang_encoder",
        )
        self.lang_proj = self.param(
            "lang_proj", nn.initializers.truncated_normal(0.02),
            (self.width, self.dim_proj),
        )
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.ones, ()
        )

    def __call__(self, input_ids: jax.Array, norm: bool = True) -> jax.Array:
        """Pooled text embedding [B, dim_proj] at the EOT (= argmax id) position."""
        x = self.transformer(input_ids)
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot]
        pooled = pooled.astype(jnp.float32) @ self.lang_proj
        if norm:
            pooled = pooled / (jnp.linalg.norm(pooled, axis=-1, keepdims=True) + 1e-7)
        return pooled

    def encode_tokens(self, input_ids: jax.Array):
        """Token-level embeddings for the VLP decoder path
        (≙ get_text_token_embeddings, vlpencoder.py:130-157): returns
        (token_emb [B, T, dim_proj], pooled_emb [B, dim_proj] normalized)."""
        x = self.transformer(input_ids)
        tok = x.astype(jnp.float32) @ self.lang_proj
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = tok[jnp.arange(tok.shape[0]), eot]
        pooled = pooled / (jnp.linalg.norm(pooled, axis=-1, keepdims=True) + 1e-7)
        return tok, pooled

    def scale(self) -> jax.Array:
        return jnp.exp(self.logit_scale)


def class_name_prompts(
    class_names: Sequence[str],
    template: Optional[str] = None,
    add_background: bool = True,
) -> List[str]:
    """The exact label strings fed to text embedding.

    The reference wraps every class name in the scene prompt before embedding
    and appends a literal "background" class
    (reference models/affinity_module.py:242-245:
    ``labelset = ["a " + label + " in a scene" for label in cfg.all_label];
    labelset.append('background')``). The background name is NOT wrapped.
    """
    names = [template.format(n) if template else n for n in class_names]
    if add_background:
        names.append("background")
    return names


def embed_class_names(
    apply_fn,
    variables,
    tokenizer,
    class_names: Sequence[str],
    use_templates: bool = True,
    add_background: bool = True,
    template: Optional[str] = None,
    batch_size: int = 80,
) -> np.ndarray:
    """Per-class prompt-template-averaged, L2-normalized text embeddings
    (vlpencoder.py:102-126). Returns [n_cls(+1), dim_proj] f32, background last.

    ``template`` (e.g. ``"a {} in a scene"``) wraps each class name BEFORE the
    80-template averaging, matching affinity_module.py:242-245."""
    names = class_name_prompts(class_names, template, add_background)
    out = []
    for cls in names:
        clean = cls.replace("-other", "").replace("-merged", "").replace("-stuff", "")
        texts = (
            [t.format(clean) for t in PROMPT_TEMPLATES] if use_templates else [clean]
        )
        ids, _ = tokenizer(texts)
        emb = np.asarray(apply_fn(variables, jnp.asarray(ids)))
        mean = emb.mean(0)
        out.append(mean / (np.linalg.norm(mean) + 1e-12))
    return np.stack(out).astype(np.float32)
