"""BitwiseARModel: VAR-style multi-scale autoregressive motion generator.

Audio-conditioned AdaLN transformer that generates binary BSQ motion codes
scale-by-scale (1 -> 5 -> 25 -> 50 -> 100 tokens) over sliding 4-second
windows, with the previous window's encoded summary as an attention prefix
(reference: app/models.py:13-135, app/transformer.py:12-79).

TPU-first redesign (same bits, fewer FLOPs, one compiled graph):

- **Incremental KV-cached level decode.** The reference re-feeds all tokens of
  levels <= current as queries at every level and recomputes full attention
  (models.py:97-104). Because the VAR mask makes a token's hidden states
  depend only on tokens of levels <= its own, earlier levels' K/V are
  invariant across level iterations; we compute each level's tokens exactly
  once and append their per-block K/V to a cache laid out as
  [prev-prefix | level tokens]. The level-causal mask then becomes *implicit*
  in the cache extent -- no attention bias materialized at all.
- **Static shapes per window** (fixed 64 000-sample chunks, fixed scale
  schedule) so the whole window step jits once; the sliding-window loop is a
  ``lax.scan`` with donated carries (constant memory in clip length).
- Blocks are parameter-stacked and scanned; resizes are constant matmuls.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..ops.resample1d import resize_area, resize_linear
from . import nn
from .bitwise_vae import BitwiseVAE
from .bsq import bits_to_values
from .style_encoder import StyleEncoder
from .wav2vec import Wav2VecEncoder


def topk_topp_mask(logits: jnp.ndarray, top_k: int = 2,
                   top_p: float = 0.95) -> jnp.ndarray:
    """VAR's sampling filter (reference models.py:151-164; shipped unused
    there): keep the top-k logits per distribution, then drop the ascending
    tail whose cumulative probability is <= 1 - top_p (the largest logit is
    always kept). Removed entries go to -inf."""
    v = logits.shape[-1]
    if top_k > 0 and top_k < v:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p > 0:
        sort_idx = jnp.argsort(logits, axis=-1)            # ascending
        sorted_logits = jnp.take_along_axis(logits, sort_idx, axis=-1)
        cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        remove = (cum <= (1.0 - top_p)).at[..., -1:].set(False)
        inv = jnp.argsort(sort_idx, axis=-1)
        remove = jnp.take_along_axis(remove, inv, axis=-1)
        logits = jnp.where(remove, -jnp.inf, logits)
    return logits


def sample_with_top_k_top_p(logits: jnp.ndarray, key: jax.Array,
                            top_k: int = 2, top_p: float = 0.95) -> jnp.ndarray:
    """Categorical sample over the filtered logits (last axis)."""
    return jax.random.categorical(key, topk_topp_mask(logits, top_k, top_p),
                                  axis=-1)


class WindowState(NamedTuple):
    """Sliding-window carry (donated across windows)."""

    prev_bits: jnp.ndarray       # (B, sum(patch_nums), code_dim) int32
    prev_attn_feat: jnp.ndarray  # (B, prev_ratio * (1 + sum(pn[1:]) + ...), embed)


class BitwiseARModel:
    def __init__(self, cfg: ModelConfig = ModelConfig()):
        self.cfg = cfg
        self.vae = BitwiseVAE(cfg.vae)
        self.style_encoder = StyleEncoder(motion_dim=cfg.vae.motion_dim,
                                          feature_dim=cfg.ar.style_dim)
        if cfg.ar.audio_encoder == "wav2vec":
            self.audio_encoder = Wav2VecEncoder(cfg.wav2vec)
        elif cfg.ar.audio_encoder == "mimi":
            from .mimi import MimiEncoder

            self.audio_encoder = MimiEncoder(cfg.mimi)
        else:
            raise ValueError(f"unknown audio encoder {cfg.ar.audio_encoder!r}")
        self.patch_nums = tuple(cfg.vae.patch_nums)
        self.total_tokens = sum(self.patch_nums)       # 181
        self.offsets = [sum(self.patch_nums[:i]) for i in range(len(self.patch_nums))]
        self.embed_dim = cfg.ar.embed_dim
        self.depth = cfg.ar.depth
        self.num_heads = cfg.ar.num_heads
        self.head_dim = self.embed_dim // self.num_heads
        self.prev_ratio = cfg.ar.prev_ratio
        self.prev_len = self.total_tokens * self.prev_ratio
        self.cache_len = self.prev_len + self.total_tokens
        self.window_samples = cfg.window_audio_samples  # 64000
        self.audio_frames = self.audio_encoder.num_output_frames(self.window_samples)

    # ------------------------------------------------------------------ init

    def init(self, key: jax.Array) -> nn.Params:
        cfg = self.cfg
        keys = jax.random.split(key, 16)
        d, cd = self.embed_dim, cfg.ar.audio_feature_dim
        hidden = round(d * cfg.ar.mlp_ratio)
        pe_std = math.sqrt(1 / d / 3)

        def block(k):
            ks = jax.random.split(k, 7)
            return {
                "ada_lin": nn.linear_init(ks[0], cd, 6 * d),
                "q": nn.linear_init(ks[1], d, d, bias=True),
                "k": nn.linear_init(ks[2], d, d, bias=False),
                "v": nn.linear_init(ks[3], d, d, bias=True),
                "proj": nn.linear_init(ks[4], d, d, bias=True),
                # learned per-head log attention scale, init log(4)
                # (transformer.py:53-56)
                "scale_mul": jnp.full((1, self.num_heads, 1, 1), math.log(4.0)),
                "fc1": nn.linear_init(ks[5], d, hidden),
                "fc2": nn.linear_init(ks[6], hidden, d),
            }

        blocks = [block(jax.random.fold_in(keys[0], i)) for i in range(self.depth)]
        return {
            "vae": self.vae.init(keys[1]),
            "style_encoder": self.style_encoder.init(keys[2]),
            "audio_encoder": self.audio_encoder.init(keys[3]),
            "vqfeat_embed": nn.linear_init(keys[4], cfg.vae.code_dim, d),
            "style_cond_embed": nn.linear_init(keys[5], cfg.ar.style_dim, d),
            "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
            "head": {
                "ada_lin": nn.linear_init(keys[6], cd, 2 * d),
                "out": nn.linear_init(keys[7], d, cfg.vae.code_dim * 2),
            },
            "null_style_cond": jax.random.normal(keys[8], (1, 1, d)) * 0.5,
            "pos_embed": nn.trunc_normal(keys[9], (1, self.total_tokens, d), std=pe_std),
            "prev_pos_embed": nn.trunc_normal(keys[10], (1, self.prev_len, d), std=pe_std),
            "lvl_embed": nn.trunc_normal(keys[11], (len(self.patch_nums), d), std=pe_std),
        }

    # -------------------------------------------------------------- embeddings

    def _lvl_idx(self) -> jnp.ndarray:
        return jnp.concatenate([
            jnp.full((pn,), i, jnp.int32) for i, pn in enumerate(self.patch_nums)
        ])

    def lvl_pos_embed(self, params: nn.Params) -> jnp.ndarray:
        """(1, 181, d): level embedding + absolute position embedding
        (models.py:74)."""
        return params["lvl_embed"][self._lvl_idx()][None] + params["pos_embed"]

    def prev_lvl_pos_embed(self, params: nn.Params) -> jnp.ndarray:
        """(1, prev_len, d) for the previous-window prefix (models.py:75)."""
        lvl = params["lvl_embed"][self._lvl_idx()][None]
        return jnp.tile(lvl, (1, self.prev_ratio, 1)) + params["prev_pos_embed"]

    def encode_style(self, params: nn.Params,
                     style_motion: Optional[jnp.ndarray]) -> jnp.ndarray:
        """Style clip -> (B, 1, d) conditioning token with the reference's
        CFG-style extrapolation style*1.1 - null*0.1 (models.py:67-73)."""
        if style_motion is None:
            return params["null_style_cond"]
        style = self.style_encoder(params["style_encoder"], style_motion)
        cond = nn.linear(params["style_cond_embed"], style)[:, None]
        return cond * 1.1 - params["null_style_cond"] * 0.1

    # ---------------------------------------------------------------- attention

    def _block_kv(self, block: nn.Params, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """K/V heads for tokens x (keys L2-normalized for the cache;
        transformer.py:71-74)."""
        k = nn.split_heads(nn.linear(block["k"], x), self.num_heads)
        v = nn.split_heads(nn.linear(block["v"], x), self.num_heads)
        return nn.l2_normalize(k), v

    def init_cache(self, params: nn.Params, prev_feat: jnp.ndarray,
                   blocks: Optional[nn.Params] = None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Per-block K/V caches (depth, B, H, cache_len, hd) with the
        previous-window prefix filled in positions [0, prev_len).

        ``blocks`` overrides ``params["blocks"]`` (the bf16_ar decode path
        passes pre-cast weights; cache dtype follows ``prev_feat``)."""
        if blocks is None:
            blocks = params["blocks"]
        b = prev_feat.shape[0]
        shape = (self.depth, b, self.num_heads, self.cache_len, self.head_dim)
        k_cache = jnp.zeros(shape, prev_feat.dtype)
        v_cache = jnp.zeros(shape, prev_feat.dtype)
        k_prev, v_prev = jax.vmap(self._block_kv, in_axes=(0, None))(blocks, prev_feat)
        k_cache = k_cache.at[:, :, :, : self.prev_len].set(k_prev)
        v_cache = v_cache.at[:, :, :, : self.prev_len].set(v_prev)
        return k_cache, v_cache

    def init_cache_merged(self, params: nn.Params, prev_feat: jnp.ndarray,
                          blocks: Optional[nn.Params] = None
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Merged-head K/V caches (depth, B, cache_len, embed) for the fused
        Pallas decode path (ops/ar_block_stack.py) -- same contents as
        ``init_cache`` but with heads folded into the feature axis, the
        layout the kernel's per-head lane slicing wants."""
        if blocks is None:
            blocks = params["blocks"]
        b = prev_feat.shape[0]

        def merge(t):  # (depth, B, H, L, hd) -> (depth, B, L, H*hd)
            return t.transpose(0, 1, 3, 2, 4).reshape(
                self.depth, b, -1, self.embed_dim)

        k_prev, v_prev = jax.vmap(self._block_kv, in_axes=(0, None))(blocks,
                                                                     prev_feat)
        shape = (self.depth, b, self.cache_len, self.embed_dim)
        k_cache = jnp.zeros(shape, prev_feat.dtype)
        v_cache = jnp.zeros(shape, prev_feat.dtype)
        k_cache = k_cache.at[:, :, : self.prev_len].set(merge(k_prev))
        v_cache = v_cache.at[:, :, : self.prev_len].set(merge(v_prev))
        return k_cache, v_cache

    def pack_fused_decode(self, params: nn.Params) -> nn.Params:
        """Tile-stream weight pack for the fused decode kernel. Engines that
        decode repeatedly should compute this once and store it under
        ``params["fused_pack"]``; ``decode_window`` falls back to packing
        inline (hoisted out of scans by XLA, but re-traced per jit call)."""
        from ..ops.ar_block_stack import pack_block_weights

        dtype = jnp.float32
        if self.cfg.bf16_ar:
            dtype = jnp.bfloat16
        if self.cfg.int8_ar:
            dtype = jnp.int8
        return pack_block_weights(params["blocks"], self.num_heads,
                                  dtype=dtype)

    def pack_fused_audio(self, params: nn.Params) -> Optional[nn.Params]:
        """Tile-stream weight pack for the fused audio-encoder kernel
        (ops/encoder_block_stack.py); None when the configured encoder has
        no fused path (mimi, or a non-stable-LN wav2vec layout). Engines
        should store it under ``params["fused_audio_pack"]``."""
        if (self.cfg.ar.audio_encoder != "wav2vec"
                or not self.cfg.wav2vec.do_stable_layer_norm):
            return None
        dtype = jnp.float32
        if self.cfg.bf16_audio:
            dtype = jnp.bfloat16
        if self.cfg.int8_ar:
            dtype = jnp.int8
        return self.audio_encoder.pack_fused(params["audio_encoder"],
                                             dtype=dtype)

    def _run_level_fused(self, pack: nn.Params, tokens: jnp.ndarray,
                         ada: jnp.ndarray,
                         caches: Tuple[jnp.ndarray, jnp.ndarray], level: int,
                         batch_tile: int | None = None
                         ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
        """Fused-kernel counterpart of ``_run_level``: one pallas_call runs
        the level through all blocks (weights streamed HBM->VMEM, activations
        VMEM-resident; batches beyond 2 rows tile the batch as the outer
        grid dimension). Opt-in via ``cfg.fused_ar``; parity-tested to atol
        against ``_run_level``, not bit-pinned."""
        from ..ops.ar_block_stack import ar_block_stack

        start = self.prev_len + self.offsets[level]
        pn = self.patch_nums[level]
        k_cache, v_cache = caches
        feats, k_new, v_new = ar_block_stack(
            tokens, ada, pack["wtiles"], pack["biases"], k_cache, v_cache,
            pack.get("scales"), start=start, num_heads=self.num_heads,
            interpret=jax.default_backend() != "tpu",
            batch_tile=batch_tile)
        k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, k_new, start,
                                                      axis=2)
        v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, v_new, start,
                                                      axis=2)
        return feats, (k_cache, v_cache)

    def _fused_decode_consts(self, params: nn.Params, audio_cond: jnp.ndarray):
        """Hoist every per-block quantity that does not depend on the level's
        hidden state out of the 5x12 block executions (dispatch-count is the
        decode bottleneck on TPU — each level re-walks all blocks with 1-100
        tokens, so small-op overhead dominates over FLOPs):

        - q/k/v weights fused into one (depth, d, 3d) matmul operand (k has
          no bias in the reference, transformer.py:46-52 — a zero slot keeps
          the add bit-exact),
        - AdaLN for ALL blocks and ALL 181 positions as one einsum (sliced
          per level/block afterwards; row/column-independent, so bit-equal
          to the per-block linears it replaces),
        - the exp'd per-head attention scales,
        - the AdaLN head's scale/shift over all 181 positions.
        """
        blocks = params["blocks"]
        w_qkv = jnp.concatenate(
            [blocks["q"]["w"], blocks["k"]["w"], blocks["v"]["w"]], axis=-1)
        b_qkv = jnp.concatenate(
            [blocks["q"]["b"], jnp.zeros_like(blocks["q"]["b"]),
             blocks["v"]["b"]], axis=-1)
        scale_mul = jnp.exp(jnp.minimum(blocks["scale_mul"], math.log(100.0)))
        silu_cond = nn.silu(audio_cond)
        ada_full = (jnp.einsum("bpc,dce->dbpe", silu_cond,
                               blocks["ada_lin"]["w"])
                    + blocks["ada_lin"]["b"][:, None, None])
        head = params["head"]
        head_ss = jnp.split(
            jnp.einsum("...i,io->...o", silu_cond, head["ada_lin"]["w"])
            + head["ada_lin"]["b"], 2, axis=-1)
        return w_qkv, b_qkv, scale_mul, ada_full, head_ss

    def _run_level(self, blocks: nn.Params, tokens: jnp.ndarray,
                   ada: jnp.ndarray, caches: Tuple[jnp.ndarray, jnp.ndarray],
                   level: int, w_qkv: jnp.ndarray, b_qkv: jnp.ndarray,
                   scale_mul: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
        """Run one scale level's new tokens through all blocks, appending
        their K/V to the caches. Returns (logits-ready features, caches).

        blocks:    stacked per-block params (possibly bf16-cast by the
                   bf16_ar decode path),
        tokens:    (B, pn, d) embedded inputs for this level (pos/lvl added),
        ada:       (depth, B, pn, 6d) per-block AdaLN params at these
                   positions (precomputed by ``_fused_decode_consts``),
        w_qkv/b_qkv/scale_mul: fused projections + exp'd attention scales.
        """
        start = self.prev_len + self.offsets[level]
        end = start + self.patch_nums[level]

        def block_body(x, inp):
            block, ada_d, w_d, b_d, sm_d, k_cache, v_cache = inp
            g1, g2, s1, s2, sh1, sh2 = jnp.split(ada_d, 6, axis=-1)
            xm = nn.layer_norm(x, eps=1e-6) * (s1 + 1.0) + sh1
            qkv = jnp.einsum("...i,io->...o", xm, w_d) + b_d
            q, k_new, v_new = (nn.split_heads(t, self.num_heads)
                               for t in jnp.split(qkv, 3, axis=-1))
            q = nn.l2_normalize(q) * sm_d
            k_new = nn.l2_normalize(k_new)
            k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, k_new, start, axis=2)
            v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, v_new, start, axis=2)
            # level-causal mask is implicit: attend to [prev prefix | levels <= this]
            attn = nn.sdpa(q, k_cache[:, :, :end], v_cache[:, :, :end], scale=1.0)
            x = x + nn.linear(block["proj"], nn.merge_heads(attn)) * g1
            xm2 = nn.layer_norm(x, eps=1e-6) * (s2 + 1.0) + sh2
            x = x + nn.linear(block["fc2"], nn.gelu_tanh(nn.linear(block["fc1"], xm2))) * g2
            return x, (k_cache, v_cache)

        # Only the leaves block_body actually reads ride the scan — the
        # q/k/v/ada_lin weights live in the hoisted fused consts, and keeping
        # them out of the xs makes sure no dead per-block DMA survives DCE.
        hot = {k: blocks[k] for k in ("proj", "fc1", "fc2")}
        feats, caches = jax.lax.scan(
            block_body, tokens,
            (hot, ada, w_qkv, b_qkv, scale_mul) + caches)
        return feats, caches

    def _head_bits(self, params: nn.Params, feats: jnp.ndarray,
                   cond, sample=None) -> jnp.ndarray:
        """AdaLN head + per-bit decision (models.py:103-104, 138-148):
        greedy argmax by default, or top-k/top-p sampling when ``sample =
        (key, top_k, top_p)`` (the reference ships the same sampler unused,
        models.py:151-164).

        ``cond`` is either the (B, pn, audio_dim) condition tensor, or a
        precomputed ``(scale, shift)`` tuple from ``_fused_decode_consts``
        (row-independent linear, so slicing the full-window product is
        bit-equal to projecting the slice)."""
        head = params["head"]
        if isinstance(cond, tuple):
            scale, shift = cond
        else:
            scale, shift = jnp.split(
                nn.linear(head["ada_lin"], nn.silu(cond)), 2, axis=-1)
        feats = nn.layer_norm(feats, eps=1e-6) * (scale + 1.0) + shift
        logits = nn.linear(head["out"], feats).astype(jnp.float32)
        b, l, _ = logits.shape
        logits = logits.reshape(b, l, -1, 2)
        if sample is None:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        key, top_k, top_p = sample
        return sample_with_top_k_top_p(logits, key, top_k, top_p).astype(jnp.int32)

    # ------------------------------------------------------------ window decode

    def audio_condition(self, params: nn.Params, audio_chunk: jnp.ndarray) -> jnp.ndarray:
        """One 4 s audio chunk -> (B, 181, audio_dim) multi-scale condition
        (models.py:93-95): wav2vec features area-resized to each scale.

        With ``cfg.bf16_audio`` the 300M-param encoder runs in bfloat16
        (weights cast at trace time -- XLA folds the casts into constants
        under jit) with f32 norms/softmax; conditioning returns to f32.
        """
        enc_params = params["audio_encoder"]
        if self.cfg.bf16_audio and self.cfg.ar.audio_encoder == "wav2vec":
            enc_params = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, enc_params)
            audio_chunk = audio_chunk.astype(jnp.bfloat16)
        # Fused weight-streaming encoder kernel (ops/encoder_block_stack.py)
        # on the stable-LN wav2vec path. Batch 1 (streaming) runs it
        # directly; the offline batched-windows encode lax.maps the batch-1
        # kernel over windows, which beats the weight-amortizing XLA scan
        # for bf16/int8 packs (encode() falls back to the scan for f32
        # packs and non-stable layouts -- see Wav2VecEncoder.encode).
        fused_pack = None
        if (self.cfg.fused_ar and self.cfg.ar.audio_encoder == "wav2vec"
                and self.cfg.wav2vec.do_stable_layer_norm):
            # f32 packs (the "fusedx" parity mode) only run fused at batch 1
            # (encoder_block_stack.pack_batched_ok); skip the lookup/build
            # entirely at larger batches so the 24-layer tile repack is never
            # traced as dead work the encoder would ignore.
            f32_pack = not (self.cfg.bf16_audio or self.cfg.int8_ar)
            if audio_chunk.shape[0] == 1 or not f32_pack:
                fused_pack = params.get("fused_audio_pack")
                if fused_pack is None:
                    fused_pack = self.pack_fused_audio(params)
        if fused_pack is not None:
            feat = self.audio_encoder(enc_params, audio_chunk,
                                      fused_pack=fused_pack)
        else:
            feat = self.audio_encoder(enc_params, audio_chunk)
        feat = feat.astype(jnp.float32)
        return jnp.concatenate([resize_area(feat, pn) for pn in self.patch_nums], axis=1)

    def decode_window(self, params: nn.Params, audio_cond: jnp.ndarray,
                      style_cond: jnp.ndarray, prev_attn_feat: jnp.ndarray,
                      sample=None) -> jnp.ndarray:
        """Generate one window's code bits (B, 181, code_dim) -- greedy, or
        top-k/top-p sampled when ``sample = (key, top_k, top_p)``.

        Level loop is unrolled at trace time (5 static shapes); each level
        feeds only its *new* tokens, attending to the KV cache.
        """
        if sample is not None:
            s_key, top_k, top_p = sample
            level_keys = jax.random.split(s_key, len(self.patch_nums))
        lvl_pos = self.lvl_pos_embed(params)
        prev_feat = prev_attn_feat + self.prev_lvl_pos_embed(params)
        window = self.patch_nums[-1]
        code_dim = self.cfg.vae.code_dim
        b = audio_cond.shape[0]
        w_qkv, b_qkv, scale_mul, ada_full, (h_scale, h_shift) = \
            self._fused_decode_consts(params, audio_cond)

        blocks = params["blocks"]
        compute_dtype = jnp.float32
        if self.cfg.bf16_ar:
            # Fast mode: bf16 block weights + activations (casts fold into
            # constants under jit). The head consts/logits and the inter-
            # level f_hat/bit arithmetic stay f32; LN/softmax upcast inside
            # the nn helpers. Changes code bits vs f32 -- opt-in only.
            compute_dtype = jnp.bfloat16
            cast = lambda t: jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, t)
            blocks, w_qkv, b_qkv, scale_mul, ada_full = (
                cast(t) for t in (blocks, w_qkv, b_qkv, scale_mul, ada_full))
            prev_feat = prev_feat.astype(jnp.bfloat16)
        # The fused kernel keeps batch_tile*pn_pad activation rows in VMEM
        # scratch; beyond ~2 rows the 100-token level overruns the ~16MB
        # budget, so larger batches (the serving StreamPool) run the SAME
        # kernel tiled over the batch as the outer grid dimension
        # (ops/ar_block_stack.py batch_tile): weights re-stream once per
        # 2-row tile, which measures far below the XLA scan's activation
        # round-trips (tools/bench_streampool.py). f32 packs (the "fusedx"
        # parity mode) stay on the XLA scan at b > 2 -- parity coverage
        # doesn't need large batches and f32 tiles halve to TW=d/2.
        f32_pack = not (self.cfg.bf16_ar or self.cfg.int8_ar)
        use_fused = self.cfg.fused_ar and (b <= 2 or not f32_pack)
        if use_fused:
            pack = params.get("fused_pack")
            if pack is None:
                pack = self.pack_fused_decode(params)
            caches = self.init_cache_merged(params, prev_feat, blocks=blocks)
        else:
            caches = self.init_cache(params, prev_feat, blocks=blocks)

        f_hat = jnp.zeros((b, window, code_dim), jnp.float32)
        tokens = jnp.broadcast_to(style_cond + lvl_pos[:, :1],
                                  (b, 1, self.embed_dim))
        all_bits = []
        for level, pn in enumerate(self.patch_nums):
            off = self.offsets[level]
            if use_fused:
                # Per-level batch tile: scratch scales with batch_tile *
                # pn_pad, so big batches run 2 rows per grid step at the
                # short levels and drop to 1 row at the 100-token level
                # (2 rows there measured 17.3 MB > the 16 MB VMEM budget).
                batch_tile = None if b <= 2 else (2 if pn <= 64 else 1)
                feats, caches = self._run_level_fused(
                    pack, tokens.astype(compute_dtype),
                    ada_full[:, :, off : off + pn], caches, level,
                    batch_tile=batch_tile)
            else:
                feats, caches = self._run_level(
                    blocks, tokens.astype(compute_dtype),
                    ada_full[:, :, off : off + pn], caches, level,
                    w_qkv, b_qkv, scale_mul)
            bits = self._head_bits(
                params, feats.astype(jnp.float32),
                (h_scale[:, off : off + pn], h_shift[:, off : off + pn]),
                None if sample is None else (level_keys[level], top_k, top_p))
            all_bits.append(bits)
            if level < len(self.patch_nums) - 1:
                next_pn = self.patch_nums[level + 1]
                f_hat = f_hat + resize_linear(bits_to_values(bits, code_dim), window)
                nxt = resize_area(f_hat, next_pn)
                tokens = (nn.linear(params["vqfeat_embed"], nxt)
                          + lvl_pos[:, off + pn : off + pn + next_pn])
        return jnp.concatenate(all_bits, axis=1)

    # ---------------------------------------------------------------- training

    def var_attn_bias(self) -> jnp.ndarray:
        """(1, 1, 181, prev_len + 181) additive bias: all-visible prev prefix +
        level-causal VAR mask (reference: models.py:123-135). Used only by the
        teacher-forced training forward; inference needs no mask (the KV cache
        extent encodes it)."""
        lvl = np.concatenate([np.full(pn, i) for i, pn in enumerate(self.patch_nums)])
        mask = np.where(lvl[:, None] >= lvl[None, :], 0.0, -np.inf).astype(np.float32)
        full = np.concatenate(
            [np.zeros((self.total_tokens, self.prev_len), np.float32), mask], axis=1)
        return jnp.asarray(full)[None, None]

    def drop_path_rates(self) -> jnp.ndarray:
        """Per-block stochastic-depth rates, as the reference architecture
        declares them: dpr = linspace(0, 0.1 * depth / 24, depth)
        (models.py:35, consumed by transformer.py:82-96)."""
        return jnp.linspace(0.0, 0.1 * self.depth / 24.0, self.depth)

    def forward_logits(self, params: nn.Params, tokens: jnp.ndarray,
                       audio_cond: jnp.ndarray, prev_attn_feat: jnp.ndarray,
                       drop_path_rng: Optional[jax.Array] = None
                       ) -> jnp.ndarray:
        """Teacher-forced full-sequence forward: all 181 token inputs at once
        -> per-position bit logits (B, 181, code_dim, 2). Differentiable.

        ``drop_path_rng`` enables train-mode DropPath (stochastic depth): each
        residual branch of block i is dropped per-sample with probability
        dpr[i] and rescaled by 1/keep (timm semantics, transformer.py:82-96).
        With ``None`` (eval / inference) both branches are identity, so decode
        bits are untouched by this option.
        """
        bias = self.var_attn_bias()
        prev_feat = prev_attn_feat + self.prev_lvl_pos_embed(params)
        x = tokens + self.lvl_pos_embed(params)

        # Hoist block-state-independent work out of the 12-block scan (same
        # rationale as _fused_decode_consts; q stays separate here because it
        # projects hm while k/v project [prev_feat | hm]).
        blocks = params["blocks"]
        w_kv = jnp.concatenate([blocks["k"]["w"], blocks["v"]["w"]], axis=-1)
        b_kv = jnp.concatenate(
            [jnp.zeros_like(blocks["v"]["b"]), blocks["v"]["b"]], axis=-1)
        scale_mul_all = jnp.exp(jnp.minimum(blocks["scale_mul"],
                                            math.log(100.0)))
        silu_cond = nn.silu(audio_cond)
        ada_full = (jnp.einsum("bpc,dce->dbpe", silu_cond,
                               blocks["ada_lin"]["w"])
                    + blocks["ada_lin"]["b"][:, None, None])

        def block_core(h, block, ada, w_kv_d, b_kv_d, sm_d, drop):
            g1, g2, s1, s2, sh1, sh2 = jnp.split(ada, 6, axis=-1)
            hm = nn.layer_norm(h, eps=1e-6) * (s1 + 1.0) + sh1
            q = nn.split_heads(nn.linear(block["q"], hm), self.num_heads)
            q = nn.l2_normalize(q) * sm_d
            kv_in = jnp.concatenate([prev_feat, hm], axis=1)
            kv = jnp.einsum("...i,io->...o", kv_in, w_kv_d) + b_kv_d
            k, v = (nn.split_heads(t, self.num_heads)
                    for t in jnp.split(kv, 2, axis=-1))
            k = nn.l2_normalize(k)
            attn = nn.sdpa(q, k, v, scale=1.0, bias=bias)
            h = h + drop(0, nn.linear(block["proj"], nn.merge_heads(attn)) * g1)
            hm2 = nn.layer_norm(h, eps=1e-6) * (s2 + 1.0) + sh2
            h = h + drop(1, nn.linear(block["fc2"], nn.gelu_tanh(nn.linear(block["fc1"], hm2))) * g2)
            return h

        # as in _run_level: only the leaves block_core reads ride the scan
        hot = {k: blocks[k] for k in ("q", "proj", "fc1", "fc2")}

        if drop_path_rng is None:
            def block_body(h, inp):
                block, ada, w_kv_d, b_kv_d, sm_d = inp
                return block_core(h, block, ada, w_kv_d, b_kv_d, sm_d,
                                  lambda _i, branch: branch), None

            x, _ = jax.lax.scan(block_body, x,
                                (hot, ada_full, w_kv, b_kv,
                                 scale_mul_all))
        else:
            keys = jax.random.split(drop_path_rng, self.depth * 2)
            # works for both typed keys (n,) and legacy uint32 keys (n, 2)
            branch_keys = keys.reshape((self.depth, 2) + keys.shape[1:])

            def block_body(h, inp):
                block, ada, w_kv_d, b_kv_d, sm_d, rate, keys2 = inp

                def drop(i, branch):
                    keep = 1.0 - rate
                    mask = jax.random.bernoulli(keys2[i], keep,
                                                (branch.shape[0], 1, 1))
                    return branch * mask.astype(branch.dtype) / keep

                return block_core(h, block, ada, w_kv_d, b_kv_d, sm_d,
                                  drop), None

            x, _ = jax.lax.scan(
                block_body, x,
                (hot, ada_full, w_kv, b_kv, scale_mul_all,
                 self.drop_path_rates(), branch_keys))
        head = params["head"]
        scale, shift = jnp.split(
            jnp.einsum("...i,io->...o", silu_cond, head["ada_lin"]["w"])
            + head["ada_lin"]["b"], 2, axis=-1)
        x = nn.layer_norm(x, eps=1e-6) * (scale + 1.0) + shift
        logits = nn.linear(head["out"], x).astype(jnp.float32)
        b, l, _ = logits.shape
        return logits.reshape(b, l, self.cfg.vae.code_dim, 2)

    def teacher_inputs(self, params: nn.Params, bits: jnp.ndarray,
                       style_cond: jnp.ndarray) -> jnp.ndarray:
        """AR input tokens for teacher forcing: [style | embedded multi-scale
        feats of the target bits] (the training-time analogue of models.py:96-100)."""
        ms_feat = self.vae.bits_to_ms_feat(bits)
        b = bits.shape[0]
        style = jnp.broadcast_to(style_cond, (b, 1, self.embed_dim))
        return jnp.concatenate([style, nn.linear(params["vqfeat_embed"], ms_feat)], axis=1)

    # ------------------------------------------------------------ sliding window

    def initial_state(self, params: nn.Params, style_cond: jnp.ndarray,
                      batch_size: int = 1) -> WindowState:
        """Bootstrap carry from a zero-motion window (models.py:86-89)."""
        zero_motion = jnp.zeros((batch_size, self.patch_nums[-1], self.cfg.vae.motion_dim))
        prev_bits, _ = self.vae.encode_to_bits(params["vae"], zero_motion)
        return WindowState(prev_bits, self._prefix_from_bits(params, style_cond, prev_bits,
                                                             tile=True))

    def _prefix_from_bits(self, params: nn.Params, style_cond: jnp.ndarray,
                          bits: jnp.ndarray, tile: bool = False) -> jnp.ndarray:
        """[style token | embedded multi-scale feats] prefix (models.py:89,113)."""
        ms_feat = self.vae.bits_to_ms_feat(bits)
        prefix = jnp.concatenate(
            [jnp.broadcast_to(style_cond, (bits.shape[0],) + style_cond.shape[1:]),
             nn.linear(params["vqfeat_embed"], ms_feat)], axis=1)
        if tile:
            prefix = jnp.tile(prefix, (1, self.prev_ratio, 1))
        return prefix

    def window_step(self, params: nn.Params, state: WindowState,
                    audio_chunk: jnp.ndarray, style_cond: jnp.ndarray,
                    sample=None) -> Tuple[WindowState, jnp.ndarray]:
        """One sliding-window step: 4 s audio -> 100 motion frames + new carry.

        Mirrors the reference's outer loop body (models.py:92-114) with the
        carry (prev bits + rolled prefix) threaded functionally, so it drops
        straight into ``lax.scan`` (offline) or repeated calls (streaming).
        """
        audio_cond = self.audio_condition(params, audio_chunk)
        return self.window_step_cond(params, state, audio_cond, style_cond,
                                     sample)

    def window_step_cond(self, params: nn.Params, state: WindowState,
                         audio_cond: jnp.ndarray, style_cond: jnp.ndarray,
                         sample=None) -> Tuple[WindowState, jnp.ndarray]:
        """Window step with the audio condition already computed -- lets the
        offline path batch the (heavy) audio encoder over all windows and
        scan only the AR decode."""
        bits = self.decode_window(params, audio_cond, style_cond,
                                  state.prev_attn_feat, sample)
        _, this_motion = self.vae.decode_from_bits(params["vae"], state.prev_bits, bits)
        new_prev_bits, _ = self.vae.encode_to_bits(params["vae"], this_motion)
        new_prefix = self._prefix_from_bits(params, style_cond, new_prev_bits)
        rolled = jnp.concatenate(
            [state.prev_attn_feat[:, new_prefix.shape[1]:], new_prefix], axis=1)
        return WindowState(new_prev_bits, rolled), this_motion

    def generate(self, params: nn.Params, audio_chunks: jnp.ndarray,
                 style_cond: jnp.ndarray, sample_key: Optional[jax.Array] = None,
                 top_k: int = 2, top_p: float = 0.95) -> jnp.ndarray:
        """Offline path: scan over (N, B, window_samples) chunks ->
        (B, N*window, motion_dim) motions. Constant memory in N.

        Greedy (reference default) unless ``sample_key`` is given, in which
        case bits are top-k/top-p sampled per window (models.py:151-164).

        Offline-only optimization: the audio encoder (the dominant FLOPs,
        300M params) runs ONE batched pass over all N windows -- far better
        MXU utilization than the reference's per-window encode
        (models.py:92-93) -- and only the sequential AR decode scans. Window
        rows are independent through the encoder, so the bits are unchanged.
        """
        state = self.initial_state(params, style_cond, batch_size=audio_chunks.shape[1])
        n, b = audio_chunks.shape[0], audio_chunks.shape[1]
        cond_all = self.audio_condition(
            params, audio_chunks.reshape(n * b, -1))
        cond_all = cond_all.reshape(n, b, *cond_all.shape[1:])

        if sample_key is None:
            def body(carry, cond):
                return self.window_step_cond(params, carry, cond, style_cond)

            _, motions = jax.lax.scan(body, state, cond_all)
        else:
            keys = jax.random.split(sample_key, n)

            def body(carry, xs):
                cond, k = xs
                return self.window_step_cond(params, carry, cond, style_cond,
                                             sample=(k, top_k, top_p))

            _, motions = jax.lax.scan(body, state, (cond_all, keys))
        # (N, B, window, D) -> (B, N*window, D)
        n, b, w, d = motions.shape
        return motions.transpose(1, 0, 2, 3).reshape(b, n * w, d)
