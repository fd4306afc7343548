"""MS-CLIP model family, TPU-native.

Functional re-design of the reference model zoo's [ON] surface
(``/root/reference/lib/models/clip_openai_pe_res_v1.py``): plain CLIP-ViT
and MS-CLIP-S (shared transformer trunk + EarlyconvRes stem + parallel conv
branch with lateral adapters).

Design stance (SURVEY.md §7): parameter sharing is expressed as *one trunk
param set consumed by both towers* instead of the reference's module
``setattr`` aliasing (``:2786-2830``) — the shared attn/mlp tensors live in
``params['visual']['blocks']`` and text blocks that share them simply omit
those keys; a resolver assembles the effective per-layer text params. Same
math, no aliasing machinery, and optimizer param groups fall out of the
pytree structure.

Layout: batch-first ``[B, L, D]`` activations, NHWC images, fp32 params,
configurable compute dtype (bf16 in production).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import layers as L
from . import resnet as R
from . import stem as S
from .extensions import ExtSpec, ext_spec_from_custom, extended_block, init_block_extensions
from .stem import BNState


# ---------------------------------------------------------------------------
# Spec
# ---------------------------------------------------------------------------

# Mapping from reference SHARE_MODULES names (b32-yfcc-msclips.yaml) to the
# param keys they alias.
_SHARE_NAME_MAP = {
    "attn.in_proj_weight": ("attn.qkv_w",),
    "attn.in_proj_bias": ("attn.qkv_b",),
    "attn.out_proj": ("attn.out_w", "attn.out_b"),
    "mlp": ("mlp",),
}


@dataclass(frozen=True)
class MSClipSpec:
    """Static architecture description (hashable; safe as a jit-static arg)."""

    embed_dim: int = 512
    image_resolution: int = 224
    vision_width: int = 768
    vision_layers: int = 12
    vision_patch_size: int = 32
    vision_heads: int = 12
    # non-empty selects the ModifiedResNet tower (VISION.LAYERS as a list,
    # reference :2748-2756)
    vision_resnet_layers: Tuple[int, ...] = ()

    context_length: int = 77
    vocab_size: int = 49408
    text_width: int = 768
    text_heads: int = 12
    text_layers: int = 12

    pool_type: str = "default"
    skip_cls: bool = False
    gather_tensors: bool = False
    ln_eps: float = 1e-12

    # EarlyconvRes stem (CUSTOM.EARLY_CONV*)
    early_conv: bool = False
    early_conv_res: bool = True      # False: plain 6-conv stem (:2282-2342)
    early_conv_new_implement: bool = True  # False: stem lives outside the
                                     # trunk (legacy path, :2558-2619)
    early_conv_first_k: int = 3
    early_conv_strides: Tuple[int, ...] = (2, 2, 2, 2)
    visual_layer_minus1: bool = False  # CUSTOM.VISUAL_LAYER_MINUS1 (:2509)

    # Parallel branch + lateral adapters (CUSTOM.PARALLEL*)
    parallel: bool = False
    parallel_n_layers: int = 5
    lateral_layers: Tuple[int, ...] = ()
    parallel_kernels: Tuple[int, ...] = (3, 3, 3, 3, 3)
    parallel_paddings: Tuple[int, ...] = (1, 1, 1, 1, 1)
    parallel_strides: Tuple[int, ...] = (2, 2, 2, 2, 2)
    parallel_resnet_layers: Tuple[int, ...] = (0, 1, 1, 1, 1)
    t2b_kernels: Tuple[int, ...] = (18, 10, 6, 4, 3)
    t2b_paddings: Tuple[int, ...] = (1, 1, 1, 1, 1)
    t2b_strides: Tuple[int, ...] = (16, 8, 4, 2, 1)
    t2b_use_cls: bool = False
    t2b_pool_sizes: Tuple[int, ...] = (0, 0, 0, 0, 0)
    t2b_bn_relu: bool = False
    t2b_bn_ln_relu: bool = False
    t2b_noln_add: bool = False

    # bottom2top back-path ([off]; reference :1639-1742, :2182-2203)
    parallel_b2t: bool = False
    b2t_mode: str = "deconv"  # deconv | bilinear | crossattn
    b2t_kernels: Tuple[int, ...] = (18, 10, 6, 4, 3)
    b2t_paddings: Tuple[int, ...] = (1, 1, 1, 1, 1)
    b2t_strides: Tuple[int, ...] = (16, 8, 4, 2, 1)
    b2t_no_lastlayer: bool = False
    b2t_layer_flags: Tuple[bool, ...] = (True, True, True, True, True)

    # windowed t2b lateral fusion ([off]; reference :1187-1536, :2205-2243)
    t2b_windowattn: bool = False
    window_relative_pos: bool = True

    # Perceiver latents ([off]; reference :2105-2124, :2389-2394)
    perceiver_in_v: bool = False
    perceiver_in_t: bool = False
    perceiver_layers: Tuple[int, ...] = ()
    perceiver_n_latents: int = 0

    # Modality sharing (CUSTOM.SHARE_MODULES / N_LAYERS / SHARE_BOTTOM_LAYER)
    share_modules: Tuple[str, ...] = ()
    share_n_layers: int = -1
    share_bottom_layer: bool = False

    compute_dtype: str = "float32"
    remat: bool = False
    use_pallas: bool = False
    # inference-only megakernels: whole half-blocks fused (no VJP)
    use_fused_block: bool = False
    vision_drop_path: float = 0.0
    # activation layout for the conv stem / parallel branch; NCHW wins for
    # low-channel high-res convs on TPU (v5e: branch 5.0 -> 3.9 ms)
    conv_layout: str = "NHWC"

    # Experimental plug-in families ([off] in released configs; SURVEY §2.3)
    ext: ExtSpec = ExtSpec()

    # -- derived -----------------------------------------------------------
    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def grid(self) -> int:
        if self.early_conv:
            if self.early_conv_res:
                stride = 2 * math.prod(self.early_conv_strides)
            else:
                stride = 32  # plain 6-conv stem: five stride-2 convs
        else:
            stride = self.vision_patch_size
        return self.image_resolution // stride

    @property
    def vision_seq_len(self) -> int:
        return self.grid * self.grid + 1

    @property
    def effective_vision_layers(self) -> int:
        """resblock count after VISUAL_LAYER_MINUS1 (:2509-2511)."""
        return self.vision_layers - (1 if self.visual_layer_minus1 else 0)

    @property
    def stem_in_trunk(self) -> bool:
        """EARLY_CONV_NEW_IMPLEMENT: resblocks[0] is the stem."""
        return self.early_conv and self.early_conv_new_implement

    @property
    def n_trunk_blocks(self) -> int:
        """Transformer blocks in the visual tower (resblock 0 is the stem
        when early_conv + new_implement; reference ``:2042-2051``)."""
        return self.effective_vision_layers - (1 if self.stem_in_trunk
                                               else 0)

    def text_layer_is_shared(self, j: int) -> bool:
        """Does text block ``j`` consume the visual trunk's tensors?

        The reference maps text[i + minus1] <- visual resblock i for
        eligible i (``:2808-2830``); eligibility is i >= N_LAYERS (or
        i < N_LAYERS with SHARE_BOTTOM_LAYER; -1 = all)."""
        if not self.share_modules:
            return False
        offset = 1 if self.visual_layer_minus1 else 0
        i = j - offset
        if i < 0 or i >= self.effective_vision_layers:
            return False
        if self.stem_in_trunk and i == 0:
            return False  # resblock 0 is the conv stem
        if self.share_n_layers == -1:
            return True
        if self.share_bottom_layer:
            return i < self.share_n_layers
        return i >= self.share_n_layers

    def b2t_active(self, li: int) -> bool:
        if not self.parallel_b2t:
            return False
        if not self.b2t_layer_flags[li]:
            return False
        is_last = li == len(self.lateral_layers) - 1
        return not (is_last and self.b2t_no_lastlayer)

    def window_geometry(self, li: int) -> dict:
        """Per-stage window-attention config (reference :2206-2220)."""
        W = self.vision_width
        kv_dims = [W // 16, W // 8, W // 4, W // 2, W]
        head_dims = [48, 48, 64, 64, 64]
        window_kvs = [16, 8, 4, 2, 3]
        slide = [False] * 4 + [True]
        return {
            "input_kv_dim": kv_dims[li],
            "output_qk_dim": kv_dims[li],
            "output_v_dim": kv_dims[li],
            "head_qk_dim": head_dims[li],
            "head_v_dim": head_dims[li],
            "num_heads": kv_dims[li] // head_dims[li],
            "window_q": 1,
            "window_kv": window_kvs[li],
            "slide_window": slide[li],
            "slide_kernel": 3 if slide[li] else 0,
            "slide_pad": 1 if slide[li] else 0,
            "slide_stride": 1 if slide[li] else 0,
            "output_dim": W,
        }

    def shared_param_keys(self) -> Tuple[str, ...]:
        keys = []
        for name in self.share_modules:
            keys.extend(_SHARE_NAME_MAP[name])
        return tuple(keys)


def _resolve_use_pallas(value) -> bool:
    """``TPU.USE_PALLAS='auto'``: fused kernels on the TPU backend
    (measured: attention core 1.5x over the XLA einsums at both b32/b16,
    text tower 110 vs 178 ms/1024, train step +18%), XLA path elsewhere
    (Pallas on CPU needs interpret mode, which the kernel tests drive
    explicitly)."""
    if isinstance(value, str):
        if value.lower() == "auto":
            import jax

            # 'axon' is this environment's tunneled-TPU platform name
            return jax.default_backend() in ("tpu", "axon")
        return value.lower() in ("1", "true", "yes")
    return bool(value)


# CUSTOM keys consumed outside spec_from_config/ext_spec_from_custom, or
# accepted-by-construction (the unread-key audit must not warn on these):
#   LR_SHARE / WD_SHARE / GUMBEL_LR — parameter-group LR/WD overrides,
#     read by train/optim.py:build_optimizer.
#   CUSTOM_ATTN — the reference's Attention_CUST vs nn.MultiheadAttention
#     switch (ref :775,:788); both are numerically identical in the plain
#     path, and this repo's attention IS the plain Attention_CUST math
#     (Pallas or XLA), so the flag is accepted with either value.
#   EARLY_CONV_RES_BLOCK / EARLY_CONV_RES_LAYERS — validated (not just
#     read) below: the reference supports exactly basic_v0 x1 per stage
#     (asserts at ref :1968-1970) and this repo hardcodes that shape.
_CUSTOM_KEYS_CONSUMED_ELSEWHERE = frozenset({
    "LR_SHARE", "WD_SHARE", "GUMBEL_LR", "CUSTOM_ATTN",
    "EARLY_CONV_RES_BLOCK", "EARLY_CONV_RES_LAYERS",
})


class _KeyRecorder:
    """Records which keys ``spec_from_config``/``ext_spec_from_custom``
    actually read from ``config.CUSTOM`` so unread keys can be reported
    (a YAML key the spec never looks at is a silent no-op — the failure
    mode VERDICT r4 flagged for TEXT.STYLE)."""

    def __init__(self, node):
        self._node = node
        self.seen: set = set()

    def get(self, key, default=None):
        self.seen.add(key)
        return self._node.get(key, default)


def _validate_spec_config(config) -> None:
    """Reject configuration this implementation does not support, loudly.

    Mirrors the reference's own hard asserts instead of silently ignoring
    the keys: the eval path requires the CLIP text tower and tokenizer
    (``clip_openai_pe_res_v1.py:2994,3011`` assert ``transformer_style ==
    'clip'``; there is NO non-'clip' implementation to mirror — the
    reference imports ``AutoModel`` at ``:20`` and never uses it, and
    constructs ``self.transformer`` only inside the ``== 'clip'`` guards
    ``:2533,:2775``), and the EarlyconvRes stem supports exactly
    ``basic_v0`` blocks, one per stage (ref asserts ``:1968-1970``)."""
    text = config.MODEL.SPEC.TEXT
    style = text.get("STYLE", "clip")
    if style != "clip":
        raise ValueError(
            f"MODEL.SPEC.TEXT.STYLE={style!r} is not supported: only the "
            "CLIP text transformer is implemented. The reference never "
            "implements a non-'clip' tower either — AutoModel is imported "
            "(clip_openai_pe_res_v1.py:20) and never used, no text tower "
            "is constructed outside the == 'clip' guards (:2533,:2775), "
            "its encode_text raises NameError, and its eval path asserts "
            "== 'clip' (:2994,:3011)."
        )
    tok = text.get("TOKENIZER", "clip")
    if tok != "clip":
        raise ValueError(
            f"MODEL.SPEC.TEXT.TOKENIZER={tok!r} is not supported: only the "
            "CLIP BPE tokenizer is implemented (reference "
            "get_clip_model reads it at clip_openai_pe_res_v1.py:3212; "
            "non-'clip' values change vocab/EOT and are untested there)."
        )
    custom = config.CUSTOM
    blk = custom.get("EARLY_CONV_RES_BLOCK", "basic_v0")
    if blk != "basic_v0":
        raise ValueError(
            f"CUSTOM.EARLY_CONV_RES_BLOCK={blk!r}: the reference supports "
            "only 'basic_v0' (any other value silently builds an EMPTY "
            "resnet stage, clip_openai_pe_res_v1.py:1965-1976); this "
            "implementation hardcodes basic_v0 and rejects the rest."
        )
    layers = custom.get("EARLY_CONV_RES_LAYERS", None)
    if layers is not None and any(n != 1 for n in layers):
        raise ValueError(
            f"CUSTOM.EARLY_CONV_RES_LAYERS={list(layers)!r}: the reference "
            "asserts one basic_v0 block per stage "
            "(clip_openai_pe_res_v1.py:1968-1970); stacks deeper than 1 "
            "are not supported there or here."
        )


def spec_from_config(config) -> MSClipSpec:
    """Build an MSClipSpec from a merged config tree, reading the same keys
    as the reference factory (``get_clip_model`` ``:3182-3227``) and
    ``Transformer.__init__`` (``:2126-2180``).

    Unsupported values raise (``_validate_spec_config``); CUSTOM keys the
    spec never reads trigger a ``warnings.warn`` so a typo'd or
    unsupported YAML key cannot become a silent no-op."""
    _validate_spec_config(config)
    spec_cfg = config.MODEL.SPEC
    custom = _KeyRecorder(config.CUSTOM)
    vision = spec_cfg.VISION
    text = spec_cfg.TEXT

    width = vision.get("WIDTH", 768)
    n_parallel = custom.get("PARALLEL_N_LAYERS", 5)
    vision_layers_cfg = vision.get("LAYERS", 12)
    if isinstance(vision_layers_cfg, int):
        resnet_layers, vision_layers, vision_heads = (), vision_layers_cfg, width // 64
    else:
        # ResNet tower: heads = width*32 // 64 (reference :2749)
        resnet_layers = tuple(vision_layers_cfg)
        vision_layers, vision_heads = 0, width * 32 // 64
    spec = MSClipSpec(
        embed_dim=spec_cfg.get("EMBED_DIM", 512),
        # reference reads TRAIN.IMAGE_SIZE even for eval (:3185)
        image_resolution=config.TRAIN.IMAGE_SIZE[0],
        vision_width=width,
        vision_layers=vision_layers,
        vision_resnet_layers=resnet_layers,
        vision_patch_size=vision.get("PATCH_SIZE", 32),
        vision_heads=vision_heads,
        context_length=text.get("CONTEXT_LENGTH", 77),
        vocab_size=text.get("VOCAB_SIZE", 49408),
        text_width=text.get("WIDTH", 512),
        text_heads=text.get("HEADS", 8),
        text_layers=text.get("LAYERS", 12),
        pool_type=spec_cfg.get("POOL_TYPE", "default"),
        skip_cls=spec_cfg.get("SKIP_CLS", False),
        gather_tensors=spec_cfg.get("GATHER_TENSORS", False),
        early_conv=custom.get("EARLY_CONV", False),
        early_conv_res=custom.get("EARLY_CONV_RES", False),
        early_conv_new_implement=custom.get("EARLY_CONV_NEW_IMPLEMENT",
                                            False),
        visual_layer_minus1=custom.get("VISUAL_LAYER_MINUS1", False),
        early_conv_first_k=custom.get("EARLY_CONV_RES_FIRSTCONV_KERNEL", 3),
        early_conv_strides=tuple(
            custom.get("EARLY_CONV_RES_STRIDES", [2, 2, 2, 2])
        ),
        parallel=custom.get("PARALLEL_IN_V", False),
        parallel_n_layers=n_parallel,
        lateral_layers=tuple(custom.get("PARALLEL_LATERAL_LAYER", [])),
        parallel_kernels=tuple(custom.get("PARALLEL_KERNELS", [3] * 5)),
        parallel_paddings=tuple(custom.get("PARALLEL_PADDINGS", [1] * 5)),
        parallel_strides=tuple(custom.get("PARALLEL_STRIDES", [2] * 5)),
        parallel_resnet_layers=tuple(
            custom.get("PARALLEL_RESNET_LAYERS", [0, 1, 1, 1, 1])
        )
        if custom.get("PARALLEL_RESNET", False)
        else (0,) * n_parallel,
        t2b_kernels=tuple(
            custom.get("PRALLEL_T2B_KERNELS", [18, 10, 6, 4, 3])
        ),
        t2b_paddings=tuple(custom.get("PRALLEL_T2B_PADDINGS", [1] * 5)),
        t2b_strides=tuple(custom.get("PRALLEL_T2B_STRIDES", [16, 8, 4, 2, 1])),
        t2b_use_cls=custom.get("PRALLEL_T2B_USECLS", False),
        t2b_pool_sizes=tuple(custom.get("PARALLEL_T2B_POOL_SIZE",
                                        [0, 0, 0, 0, 0]) or [0] * 5),
        t2b_bn_relu=custom.get("PRALLEL_T2B_ADD_BN_RELU", False),
        t2b_bn_ln_relu=custom.get("PRALLEL_T2B_ADD_BN_LN_RELU", False),
        t2b_noln_add=custom.get("PRALLEL_T2B_NOLN_ADD", False),
        parallel_b2t=custom.get("PARALLEL_B2T", False),
        b2t_mode=(
            "bilinear" if custom.get("PARALLEL_B2T_BILINEAR", False)
            else "crossattn" if custom.get("PARALLEL_B2T_CROSSATTN", False)
            else "deconv"
        ),
        b2t_no_lastlayer=custom.get("PARALLEL_B2T_NO_LASTLAYER", False),
        b2t_layer_flags=tuple(custom.get("PARALLEL_B2T_LAYER", [True] * 5)),
        t2b_windowattn=custom.get("PARALLEL_T2B_WINDOWATTN", False),
        window_relative_pos=custom.get("T2B_WINDOWATTN_RELATIVE_POS", True),
        perceiver_in_v=custom.get("PERCEIVER_IN_V", False),
        perceiver_in_t=custom.get("PERCEIVER_IN_T", False),
        perceiver_layers=tuple(custom.get("PERCEIVER_LAYER", [])),
        perceiver_n_latents=custom.get("PERCEIVER_N_LATENT", 0),
        share_modules=tuple(custom.get("SHARE_MODULES", []) or []),
        share_n_layers=custom.get("N_LAYERS", -1),
        share_bottom_layer=custom.get("SHARE_BOTTOM_LAYER", False),
        compute_dtype=config.TPU.COMPUTE_DTYPE,
        remat=config.TPU.REMAT,
        use_pallas=_resolve_use_pallas(config.TPU.USE_PALLAS),
        use_fused_block=config.TPU.get("USE_FUSED_BLOCK", False),
        conv_layout=config.TPU.get("CONV_LAYOUT", "NHWC"),
        vision_drop_path=vision.get("DROP_PATH", 0.0),
        ext=ext_spec_from_custom(custom),
    )
    unread = (set(config.CUSTOM.keys()) - custom.seen
              - _CUSTOM_KEYS_CONSUMED_ELSEWHERE)
    if unread:
        import warnings

        warnings.warn(
            f"CUSTOM keys set but never read by the model spec: "
            f"{sorted(unread)} — they have NO effect (unknown or "
            "unsupported; check spelling against config/defaults.py and "
            "the reference CUSTOM namespace).",
            stacklevel=2,
        )
    return spec


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_params(key, spec: MSClipSpec):
    """Initialize the full parameter pytree.

    Init distributions follow the reference's construction order exactly
    (SURVEY.md §3.4): attention qkv xavier-uniform (raw Parameter escapes
    ``_init_weights``), all Linear/Conv trunc-normal(0.02) with zero bias,
    LN/BN ones/zeros, class/positional/proj embeddings ``width**-0.5 *
    randn`` on the vision side, trunc-normal(0.02) text positional embedding
    and projection, N(0,1) token embedding (torch ``nn.Embedding`` default),
    ``logit_scale = 1.0`` (reference ``:2850``).
    """
    keys = jax.random.split(key, 16)
    W, E = spec.vision_width, spec.embed_dim
    TW = spec.text_width
    vis_scale = W ** -0.5

    if spec.vision_resnet_layers:
        visual = {
            "resnet": R.init_modified_resnet(
                keys[0], spec.vision_resnet_layers, E, width=W,
                input_resolution=spec.image_resolution,
            )
        }
        return {
            "visual": visual,
            "text": _init_text(spec, keys),
            "logit_scale": jnp.ones((), jnp.float32),
        }

    visual = {
        "class_embedding": vis_scale
        * jax.random.normal(keys[0], (W,), jnp.float32),
        "positional_embedding": vis_scale
        * jax.random.normal(keys[1], (spec.vision_seq_len, W), jnp.float32),
        "ln_pre": L.init_layer_norm(W),
        "ln_post": L.init_layer_norm(W),
        "proj": vis_scale * jax.random.normal(keys[2], (W, E), jnp.float32),
        "blocks": [],
    }
    if spec.early_conv:
        if spec.early_conv_res:
            visual["stem"] = S.init_earlyconv_res(
                keys[3], W, spec.early_conv_first_k,
                len(spec.early_conv_strides),
            )
        else:
            visual["stem"] = S.init_plain_conv_stem(keys[3], W)
    else:
        visual["conv1"] = L.init_conv(
            keys[3], spec.vision_patch_size, 3, W
        )

    bkeys = jax.random.split(keys[4], spec.n_trunk_blocks)
    for i in range(spec.n_trunk_blocks):
        visual["blocks"].append(_init_block_xavier_qkv(bkeys[i], W))

    if spec.ext.any_active:
        start = 1 if spec.stem_in_trunk else 0
        ekeys = jax.random.split(jax.random.fold_in(key, 55),
                                 spec.n_trunk_blocks)
        visual["ext_blocks"] = [
            init_block_extensions(
                ekeys[i], spec.ext, W, spec.vision_heads, "visual",
                i + start,
            )
            for i in range(spec.n_trunk_blocks)
        ]

    if spec.parallel:
        visual["parallel_stages"] = S.init_parallel_branch(
            keys[5], W, spec.parallel_n_layers, spec.parallel_resnet_layers,
            spec.parallel_kernels,
        )
        akeys = jax.random.split(keys[6], len(spec.lateral_layers))
        out_dims = [W // 16, W // 8, W // 4, W // 2, W]
        adapters = []
        for i in range(len(spec.lateral_layers)):
            if spec.t2b_windowattn:
                from .crossattn import (
                    init_window_cross_attention,
                    relative_position_index,
                )

                geo = spec.window_geometry(i)
                a = init_window_cross_attention(
                    akeys[i], W, geo["input_kv_dim"], geo["output_qk_dim"],
                    geo["output_v_dim"], geo["window_q"], geo["window_kv"],
                    geo["num_heads"], dwconv_kv=True, add_linear=True,
                    output_dim=geo["output_dim"],
                    relative_pos=spec.window_relative_pos,
                )
            else:
                a = S.init_lateral_adapter(
                    akeys[i], out_dims[i], W, spec.t2b_kernels[i],
                    bn_relu=spec.t2b_bn_relu,
                    bn_ln_relu=spec.t2b_bn_ln_relu,
                    noln_add=spec.t2b_noln_add,
                )
                if spec.b2t_active(i):
                    a.update(S.init_lateral_adapter_b2t(
                        jax.random.fold_in(akeys[i], 9), out_dims[i], W,
                        spec.b2t_kernels[i], mode=spec.b2t_mode,
                    ))
            adapters.append(a)
        visual["lateral_adapters"] = adapters

    if spec.perceiver_in_v:
        from .crossattn import init_residual_cross_block

        pkeys = jax.random.split(jax.random.fold_in(key, 66),
                                 len(spec.perceiver_layers))
        visual["perceiver_latent"] = jax.random.normal(
            jax.random.fold_in(key, 67),
            (spec.perceiver_n_latents, W), jnp.float32,
        )
        visual["perceiver_blocks"] = [
            init_residual_cross_block(pkeys[i], W)
            for i in range(len(spec.perceiver_layers))
        ]

    if spec.pool_type == "linear":
        visual["conv_pool"] = _init_conv_pool(
            keys[11], W,
            spec.vision_seq_len - (1 if spec.skip_cls else 0),
        )

    out = {
        "visual": visual,
        "text": _init_text(spec, keys),
        "logit_scale": jnp.ones((), jnp.float32),
    }
    if spec.ext.gumbel_select:
        # reference: 1e-3 * randn(vision_layers, 2) (:2745)
        out["gumbel_logit"] = 1e-3 * jax.random.normal(
            jax.random.fold_in(key, 77), (spec.vision_layers, 2), jnp.float32
        )
    return out


def _init_conv_pool(key, width, length):
    """Grouped conv1d pooling head (pool_type='linear'; reference
    ``:2516-2522``): one learned weight per (channel, position)."""
    return {"w": L.trunc_normal(key, (length, width), 0.02),
            "b": jnp.zeros((width,), jnp.float32)}


def _init_text(spec: MSClipSpec, keys):
    TW, E = spec.text_width, spec.embed_dim
    shared_keys = set(spec.shared_param_keys())
    text_blocks = []
    tkeys = jax.random.split(keys[7], spec.text_layers)
    for i in range(spec.text_layers):
        blk = _init_block_xavier_qkv(tkeys[i], TW)
        if spec.text_layer_is_shared(i) and not spec.vision_resnet_layers:
            blk = _strip_shared(blk, shared_keys)
        text_blocks.append(blk)

    text = {
        "token_embedding": jax.random.normal(
            keys[8], (spec.vocab_size, TW), jnp.float32
        ),
        "positional_embedding": L.trunc_normal(
            keys[9], (spec.context_length, TW), 0.02
        ),
        "blocks": text_blocks,
        "ln_final": L.init_layer_norm(TW),
        "text_projection": L.trunc_normal(keys[10], (TW, E), 0.02),
    }
    if spec.pool_type == "linear":
        text["conv_pool"] = _init_conv_pool(
            jax.random.fold_in(keys[10], 1), TW, spec.context_length
        )
    if spec.perceiver_in_t:
        from .crossattn import init_residual_cross_block

        pkeys = jax.random.split(jax.random.fold_in(keys[8], 66),
                                 len(spec.perceiver_layers))
        text["perceiver_latent"] = jax.random.normal(
            jax.random.fold_in(keys[8], 67),
            (spec.perceiver_n_latents, TW), jnp.float32,
        )
        text["perceiver_blocks"] = [
            init_residual_cross_block(pkeys[i], TW)
            for i in range(len(spec.perceiver_layers))
        ]
    if spec.ext.any_active:
        ekeys = jax.random.split(jax.random.fold_in(keys[8], 56),
                                 spec.text_layers)
        text["ext_blocks"] = [
            init_block_extensions(
                ekeys[i], spec.ext, TW, spec.text_heads, "text", i
            )
            for i in range(spec.text_layers)
        ]
    return text


def _init_block_xavier_qkv(key, dim):
    """Transformer block whose qkv weight is xavier-uniform (matching
    ``Attention_CUST._reset_parameters``; the out_proj and MLP Linears get
    trunc-normal(0.02) from ``_init_weights``)."""
    blk = L.init_block(key, dim)
    kq = jax.random.fold_in(key, 7)
    limit = math.sqrt(6.0 / (dim + 3 * dim))
    blk["attn"]["qkv_w"] = jax.random.uniform(
        kq, (dim, 3 * dim), jnp.float32, -limit, limit
    )
    return blk


def _strip_shared(blk, shared_keys):
    out = {"ln_1": blk["ln_1"], "ln_2": blk["ln_2"]}
    if "mlp" not in shared_keys:
        out["mlp"] = blk["mlp"]
    attn = {
        k: v
        for k, v in blk["attn"].items()
        if f"attn.{k}" not in shared_keys
    }
    if attn:
        out["attn"] = attn
    return out


def resolve_text_block(params, spec: MSClipSpec, i: int):
    """Assemble effective params for text block ``i``: module-wise merge of
    its own params with the visual trunk's shared tensors (the functional
    equivalent of the reference's setattr aliasing, ``:2786-2830``)."""
    own = params["text"]["blocks"][i]
    if not spec.text_layer_is_shared(i) or spec.vision_resnet_layers:
        return own
    offset = (1 if spec.visual_layer_minus1 else 0) \
        + (1 if spec.stem_in_trunk else 0)
    vis = params["visual"]["blocks"][i - offset]
    shared = set(spec.shared_param_keys())
    attn = {}
    for k in ("qkv_w", "qkv_b", "out_w", "out_b"):
        src = vis["attn"] if f"attn.{k}" in shared else own["attn"]
        if k in src:
            attn[k] = src[k]
        else:  # int8-quantized eval weights (models/quantize.py)
            attn[k + "_int8"] = src[k + "_int8"]
            attn[k + "_scale"] = src[k + "_scale"]
    return {
        "ln_1": own["ln_1"],
        "ln_2": own["ln_2"],
        "attn": attn,
        "mlp": vis["mlp"] if "mlp" in shared else own["mlp"],
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _block_fn(spec: MSClipSpec, drop_path_rate=0.0):
    if spec.use_fused_block and drop_path_rate == 0.0:
        from ..ops.block_fused import fused_block

        return lambda p, x, heads, mask, rng=None: fused_block(
            x, p, heads, mask, eps=spec.ln_eps
        )
    fn = lambda p, x, heads, mask, rng=None: L.transformer_block(
        p, x, heads, mask, eps=spec.ln_eps, use_pallas=spec.use_pallas,
        drop_path_rate=drop_path_rate, rng=rng,
    )
    if spec.remat:
        fn = jax.checkpoint(fn, static_argnums=(2,))
    return fn


def encode_image(params, spec: MSClipSpec, images, *, normalize=True,
                 bn: Optional[BNState] = None, action=None, rng=None):
    """images: ``[B, H, W, 3]`` (preprocessed) -> ``[B, embed_dim]``.

    Implements the visual call stack of SURVEY.md §3.2: stem -> tokens ->
    +CLS/+pos/ln_pre -> 11 trunk blocks with the parallel branch fused at
    the lateral layers -> CLS pool -> ln_post -> proj -> L2 norm.
    """
    if bn is None:
        bn = BNState(training=False)
    # NCHW fast path applies only to the conv stem/branch; token-space ops
    # stay NHWC. b2t/window variants keep NHWC for simplicity.
    conv_layout = spec.conv_layout
    if spec.parallel_b2t or spec.t2b_windowattn or spec.vision_resnet_layers:
        conv_layout = "NHWC"
    bn.layout = conv_layout
    v = params["visual"]
    x = images.astype(spec.dtype)
    B = x.shape[0]
    W = spec.vision_width
    g = spec.grid

    if spec.vision_resnet_layers:
        feats = R.apply_modified_resnet(
            v["resnet"], x, spec.vision_resnet_layers, spec.vision_heads,
            bn, path="visual/resnet",
        )
        if normalize:
            feats = L.l2_normalize(feats)
        return feats

    if conv_layout == "NCHW":
        x = x.transpose(0, 3, 1, 2)
    if spec.early_conv:
        if spec.early_conv_res:
            fmap = S.apply_earlyconv_res(
                v["stem"], x, spec.early_conv_strides, bn,
                first_conv_k=spec.early_conv_first_k, path="visual/stem",
            )
        else:
            fmap = S.apply_plain_conv_stem(v["stem"], x, bn,
                                           path="visual/stem")
    else:
        fmap = L.conv2d(v["conv1"], x, stride=spec.vision_patch_size,
                        padding=0, layout=conv_layout)
    if conv_layout == "NCHW":
        fmap = fmap.transpose(0, 2, 3, 1)
    tokens = fmap.reshape(B, g * g, W)
    cls_tok = jnp.broadcast_to(
        v["class_embedding"].astype(spec.dtype), (B, 1, W)
    )
    tokens = jnp.concatenate([cls_tok, tokens], axis=1)
    tokens = tokens + v["positional_embedding"].astype(spec.dtype)
    tokens = L.layer_norm(v["ln_pre"], tokens, eps=spec.ln_eps)

    block = _block_fn(spec, spec.vision_drop_path if rng is not None else 0.0)
    parallel_x = None
    block_idx = 0
    start = 1 if spec.stem_in_trunk else 0
    for idx in range(start, spec.effective_vision_layers):
        if spec.perceiver_in_v and idx in spec.perceiver_layers:
            from .crossattn import residual_cross_block

            pi = spec.perceiver_layers.index(idx)
            latent = jnp.broadcast_to(
                v["perceiver_latent"].astype(spec.dtype),
                (B, spec.perceiver_n_latents, W),
            )
            tokens = residual_cross_block(
                v["perceiver_blocks"][pi], tokens, latent,
                spec.vision_heads, eps=spec.ln_eps,
            )
        if spec.parallel and idx in spec.lateral_layers:
            li = spec.lateral_layers.index(idx)
            stage_in = x if li == 0 else parallel_x
            parallel_x = S.apply_parallel_stage(
                v["parallel_stages"][li], stage_in,
                spec.parallel_kernels[li], spec.parallel_strides[li],
                spec.parallel_paddings[li], bn, f"visual/parallel_stages/{li}",
            )
            adapter_path = f"visual/lateral_adapters/{li}"
            if spec.t2b_windowattn:
                from .crossattn import (
                    relative_position_index,
                    window_cross_attention,
                )

                geo = spec.window_geometry(li)
                ad = v["lateral_adapters"][li]
                rel_idx = None
                if spec.window_relative_pos:
                    rel_idx = jnp.asarray(relative_position_index(
                        geo["window_q"], geo["window_kv"]))
                parallel_x, tokens = window_cross_attention(
                    ad, parallel_x, tokens, (g, g),
                    num_heads=geo["num_heads"],
                    head_qk_dim=geo["head_qk_dim"],
                    head_v_dim=geo["head_v_dim"],
                    window_q=geo["window_q"], window_kv=geo["window_kv"],
                    dwconv_kv=True,
                    slide_window=geo["slide_window"],
                    slide_kernel=geo["slide_kernel"],
                    slide_pad=geo["slide_pad"],
                    slide_stride=geo["slide_stride"],
                    rel_pos_table=ad.get("rel_pos_table"),
                    rel_pos_index=rel_idx,
                    bn=bn, path=adapter_path, eps=spec.ln_eps,
                )
            else:
                pre_fusion_cls = tokens[:, :1, :]
                pre_fusion_grid = tokens[:, 1:, :].reshape(
                    B, g, g, W
                )
                new_top, tokens = S.apply_lateral_adapter(
                    v["lateral_adapters"][li], parallel_x, tokens, (g, g),
                    spec.t2b_kernels[li], spec.t2b_strides[li],
                    spec.t2b_paddings[li], bn, adapter_path,
                    use_cls=spec.t2b_use_cls,
                    pool_kernel=spec.t2b_pool_sizes[li],
                    bn_relu=spec.t2b_bn_relu,
                    bn_ln_relu=spec.t2b_bn_ln_relu,
                    noln_add=spec.t2b_noln_add,
                    eps=spec.ln_eps,
                    top_layout=conv_layout,
                )
                if spec.b2t_active(li):
                    new_top = S.apply_lateral_adapter_b2t(
                        v["lateral_adapters"][li], parallel_x,
                        pre_fusion_grid, pre_fusion_cls, (g, g),
                        spec.b2t_mode, spec.b2t_kernels[li],
                        spec.b2t_strides[li], spec.b2t_paddings[li], bn,
                        adapter_path, eps=spec.ln_eps,
                    )
                parallel_x = new_top
        if spec.ext.any_active:
            tokens = extended_block(
                v["blocks"][block_idx], v["ext_blocks"][block_idx], tokens,
                spec.vision_heads, spec.ext, "visual", idx, (g, g),
                mask=None, eps=spec.ln_eps, bn=bn,
                path=f"visual/ext_blocks/{block_idx}",
                action=None if action is None else action[idx],
            )
        else:
            blk_rng = None if rng is None else jax.random.fold_in(rng, idx)
            tokens = block(v["blocks"][block_idx], tokens,
                           spec.vision_heads, None, rng=blk_rng)
        block_idx += 1

    pooled = _pool(tokens, spec, conv_pool=v.get("conv_pool"))
    pooled = L.layer_norm(v["ln_post"], pooled, eps=spec.ln_eps)
    feats = jnp.dot(pooled, v["proj"].astype(spec.dtype),
                    precision=jax.lax.Precision.HIGHEST)
    if normalize:
        feats = L.l2_normalize(feats)
    return feats


def encode_text(params, spec: MSClipSpec, tokens, *, normalize=True,
                action=None):
    """tokens: ``[B, 77]`` int32 -> ``[B, embed_dim]``.

    Text stack (SURVEY.md §3.2): embedding + positional, causal-masked
    blocks (layers >= N_LAYERS consume the visual trunk's shared attn/mlp),
    eot-argmax pooling, ln_final, text projection, L2 norm.
    """
    t = params["text"]
    x = t["token_embedding"][tokens].astype(spec.dtype)
    x = x + t["positional_embedding"].astype(spec.dtype)
    mask = L.build_causal_mask(spec.context_length)

    block = _block_fn(spec)
    for i in range(spec.text_layers):
        if spec.perceiver_in_t and i in spec.perceiver_layers:
            from .crossattn import residual_cross_block

            pi = spec.perceiver_layers.index(i)
            latent = jnp.broadcast_to(
                t["perceiver_latent"].astype(spec.dtype),
                (x.shape[0], spec.perceiver_n_latents, x.shape[-1]),
            )
            x = residual_cross_block(
                t["perceiver_blocks"][pi], x, latent, spec.text_heads,
                eps=spec.ln_eps,
            )
        if spec.ext.any_active:
            x = extended_block(
                resolve_text_block(params, spec, i),
                t["ext_blocks"][i], x, spec.text_heads, spec.ext, "text",
                i, None, mask=mask, eps=spec.ln_eps,
                path=f"text/ext_blocks/{i}",
                action=None if action is None else action[i],
            )
        else:
            x = block(resolve_text_block(params, spec, i), x,
                      spec.text_heads, mask)

    if spec.pool_type == "linear":
        w = t["conv_pool"]["w"].astype(x.dtype)
        pooled = jnp.einsum("blc,lc->bc", x, w) \
            + t["conv_pool"]["b"].astype(x.dtype)
    elif spec.pool_type != "default":
        pooled = jnp.mean(x, axis=1)
    else:
        # EOT pooling: the eot token has the highest id in each row; argmax
        # picks its (first) position (reference ``:3055-3060``).
        eot_idx = jnp.argmax(tokens, axis=-1)
        pooled = jnp.take_along_axis(x, eot_idx[:, None, None], axis=1)[:, 0]
    pooled = L.layer_norm(t["ln_final"], pooled, eps=spec.ln_eps)
    feats = jnp.dot(pooled, t["text_projection"].astype(spec.dtype),
                    precision=jax.lax.Precision.HIGHEST)
    if normalize:
        feats = L.l2_normalize(feats)
    return feats


def _pool(tokens, spec: MSClipSpec, conv_pool=None):
    if spec.pool_type == "average":
        if spec.skip_cls:
            tokens = tokens[:, 1:, :]
        return jnp.mean(tokens, axis=1)
    if spec.pool_type == "linear":
        # grouped conv1d over the sequence (reference :2678-2683):
        # out[b, c] = sum_l tokens[b, l, c] * w[l, c] + b[c]
        if spec.skip_cls:
            tokens = tokens[:, 1:, :]
        w = conv_pool["w"].astype(tokens.dtype)
        return jnp.einsum("blc,lc->bc", tokens, w) \
            + conv_pool["b"].astype(tokens.dtype)
    # 'default': CLS token
    return tokens[:, 0, :]


def forward(params, spec: MSClipSpec, images, tokens, *, axis_name=None,
            bn: Optional[BNState] = None, action=None, rng=None):
    """Training forward: global-batch contrastive logits.

    With ``axis_name`` set (inside shard_map/pjit over a mesh), embeddings
    are all-gathered with ``jax.lax.all_gather`` — natively differentiable,
    replacing the reference's grad-preserving gather hack
    (``lib/utils/comm.py:140-154``).
    """
    if spec.ext.gumbel_select and action is None:
        action = gumbel_action(params["gumbel_logit"], rng)
    feats_i = encode_image(params, spec, images, bn=bn, action=action)
    feats_t = encode_text(params, spec, tokens, action=action)
    T = jnp.exp(params["logit_scale"]).astype(feats_i.dtype)
    if spec.gather_tensors and axis_name is not None:
        feats_i = jax.lax.all_gather(feats_i, axis_name, tiled=True)
        feats_t = jax.lax.all_gather(feats_t, axis_name, tiled=True)
    return T * feats_i @ feats_t.T


def gumbel_action(logits, rng=None, tau: float = 5.0):
    """Hard one-hot action per layer via straight-through Gumbel-softmax
    (reference ``CLIP.gumbel_softmax`` ``:2892-2935``); deterministic argmax
    when ``rng`` is None (eval)."""
    logits = logits.astype(jnp.float32)
    if rng is not None:
        gumbel = -jnp.log(-jnp.log(
            jax.random.uniform(rng, logits.shape) + 1e-20) + 1e-20)
        y = jax.nn.softmax((logits + gumbel) / tau, axis=-1)
    else:
        y = jax.nn.softmax(logits / tau, axis=-1)
    hard = jax.nn.one_hot(jnp.argmax(y, axis=-1), y.shape[-1], dtype=y.dtype)
    return jax.lax.stop_gradient(hard - y) + y


# ---------------------------------------------------------------------------
# Factory
# ---------------------------------------------------------------------------

class MSClipModel:
    """Thin convenience wrapper bundling a spec with its apply functions.

    The public construction API mirrors the reference factory
    (``get_clip_model(config)``): ``build_model(config)``.
    """

    def __init__(self, spec: MSClipSpec):
        self.spec = spec

    def init(self, key):
        return init_params(key, self.spec)

    def encode_image(self, params, images, **kw):
        return encode_image(params, self.spec, images, **kw)

    def encode_text(self, params, tokens, **kw):
        return encode_text(params, self.spec, tokens, **kw)

    def __call__(self, params, images, tokens, **kw):
        return forward(params, self.spec, images, tokens, **kw)


def build_model(config) -> MSClipModel:
    return MSClipModel(spec_from_config(config))


def param_count(params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))


def cast_params(params, dtype=jnp.bfloat16, keep_fp32=("mean", "var")):
    """Cast weights to a lower precision, keeping BN running stats fp32 —
    the TPU analogue of the reference's fp16 ``convert_weights``
    (``:3158-3179``). Note the production path instead keeps fp32 params
    and casts at use (the compute-dtype policy); this is for memory-bound
    serving."""

    def cast(path, leaf):
        key = str(path[-1].key) if hasattr(path[-1], "key") else ""
        if key in keep_fp32:
            return leaf
        return leaf.astype(dtype)

    return jax.tree_util.tree_map_with_path(cast, params)
