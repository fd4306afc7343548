"""Torch-checkpoint -> JAX-pytree converter.

Maps the reference's ``state_dict`` layout (release checkpoints are bare
state_dicts, loaded at ``tools/zero_shot.py:223-224``) onto the
``msclip_tpu`` parameter tree.

Key insights handled (SURVEY.md §5 checkpoint notes):
* **Aliased shared params appear once per alias name** — for shared text
  layers both ``visual.transformer.resblocks.N.attn.*`` and
  ``transformer.resblocks.N.attn.*`` name the same tensor; the converter
  stores the visual copy and verifies the text copy matches.
* Weight layout: torch Linear ``[out, in]`` -> JAX ``[in, out]``; torch conv
  OIHW -> JAX HWIO (valid for grouped/depthwise convs too, since I is
  ``in_ch / groups`` in both).
* BatchNorm running stats are carried (eval uses frozen stats);
  ``num_batches_tracked`` is dropped.
* An exhaustive coverage assertion mirrors the reference's matched /
  non-matched logging (``lib/utils/utils.py:267-271``): every torch key must
  be consumed and every JAX leaf filled, or conversion fails loudly.
"""

from __future__ import annotations

import logging
from typing import Dict, Tuple

import jax
import numpy as np

from ..models.msclip import MSClipSpec


def _t(x):  # torch tensor / numpy -> numpy
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _linear_w(x):
    return _t(x).T


def _conv_w(x):
    return _t(x).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _identity(x):
    return _t(x)


def build_key_map(spec: MSClipSpec) -> Dict[str, Tuple[tuple, callable]]:
    """torch state_dict key -> (params path, transform)."""
    m: Dict[str, Tuple[tuple, callable]] = {}

    def ln(torch_prefix, path):
        m[f"{torch_prefix}.weight"] = (path + ("scale",), _identity)
        m[f"{torch_prefix}.bias"] = (path + ("bias",), _identity)

    def bnorm(torch_prefix, path):
        m[f"{torch_prefix}.weight"] = (path + ("scale",), _identity)
        m[f"{torch_prefix}.bias"] = (path + ("bias",), _identity)
        m[f"{torch_prefix}.running_mean"] = (path + ("mean",), _identity)
        m[f"{torch_prefix}.running_var"] = (path + ("var",), _identity)

    def conv(torch_key, path):
        m[torch_key] = (path + ("w",), _conv_w)

    def block(torch_prefix, path, shared_absent=(), alias_base=None):
        """A ResidualAttentionBlock; ``shared_absent`` lists param keys that
        are not stored at this path (they alias the visual trunk).
        ``alias_base``: params path of the visual block those keys alias —
        recorded so the converter can verify the duplicate copies match."""
        entries = {
            "attn.qkv_w": (f"{torch_prefix}.attn.in_proj_weight",
                           path + ("attn", "qkv_w"), _linear_w),
            "attn.qkv_b": (f"{torch_prefix}.attn.in_proj_bias",
                           path + ("attn", "qkv_b"), _identity),
            "attn.out_w": (f"{torch_prefix}.attn.out_proj.weight",
                           path + ("attn", "out_w"), _linear_w),
            "attn.out_b": (f"{torch_prefix}.attn.out_proj.bias",
                           path + ("attn", "out_b"), _identity),
            "mlp.c_fc.w": (f"{torch_prefix}.mlp.c_fc.weight",
                           path + ("mlp", "c_fc", "w"), _linear_w),
            "mlp.c_fc.b": (f"{torch_prefix}.mlp.c_fc.bias",
                           path + ("mlp", "c_fc", "b"), _identity),
            "mlp.c_proj.w": (f"{torch_prefix}.mlp.c_proj.weight",
                             path + ("mlp", "c_proj", "w"), _linear_w),
            "mlp.c_proj.b": (f"{torch_prefix}.mlp.c_proj.bias",
                             path + ("mlp", "c_proj", "b"), _identity),
        }
        for name, (tk, pth, fn) in entries.items():
            if name in shared_absent:
                # consumed + verified against the visual copy, not stored
                suffix = pth[len(path):]
                target = alias_base + suffix if alias_base else None
                m[tk] = (None, fn, target)
            else:
                m[tk] = (pth, fn)
        ln(f"{torch_prefix}.ln_1", path + ("ln_1",))
        ln(f"{torch_prefix}.ln_2", path + ("ln_2",))

    def map_block_extensions(torch_prefix, ext_path, modality, layer_idx):
        """Keys for the experimental plug-ins of one block (SURVEY §2.3
        [off] families)."""
        ext = spec.ext
        if ext.layer_has("adapter", modality, layer_idx):
            for name in ("adapter_attn", "adapter_ffn"):
                for proj in ("down_proj", "up_proj"):
                    lin(f"{torch_prefix}.{name}.{proj}",
                        ext_path + (name, proj))
        if ext.layer_has("cvt", modality, layer_idx) and not ext.cvt_inside:
            for i in range(ext.cvt_n_dwc):
                suffix = f"_{i + 1}" if ext.cvt_n_dwc > 1 else ""
                conv(f"{torch_prefix}.cvt_dw.conv{suffix}.weight",
                     ext_path + ("cvt_dw", f"conv{suffix}"))
                bnorm(f"{torch_prefix}.cvt_dw.bn{suffix}",
                      ext_path + ("cvt_dw", f"bn{suffix}"))
            if ext.cvt_res:
                ln(f"{torch_prefix}.ln_cvt", ext_path + ("ln_cvt",))
        if ext.layer_has("cvt", modality, layer_idx) and ext.cvt_inside:
            for name, on in (("q", ext.cvt_inside_q),
                             ("k", ext.cvt_inside_k),
                             ("v", ext.cvt_inside_v)):
                if on:
                    conv(f"{torch_prefix}.attn.cvt_{name}.conv.weight",
                         ext_path + ("cvt_inside", name, "conv"))
                    bnorm(f"{torch_prefix}.attn.cvt_{name}.bn",
                          ext_path + ("cvt_inside", name, "bn"))
        if ext.layer_has("convit", modality, layer_idx):
            m[f"{torch_prefix}.attn.convit_pos_proj.weight"] = (
                ext_path + ("convit", "pos_proj", "w"), _linear_w)
            m[f"{torch_prefix}.attn.convit_pos_proj.bias"] = (
                ext_path + ("convit", "pos_proj", "b"), _identity)
            m[f"{torch_prefix}.attn.convit_gating_param"] = (
                ext_path + ("convit", "gating"), _identity)
        if ext.layer_has("container", modality, layer_idx):
            conv(f"{torch_prefix}.attn.container_conv.conv.weight",
                 ext_path + ("container", "conv"))
            bnorm(f"{torch_prefix}.attn.container_conv.bn",
                  ext_path + ("container", "bn"))
            m[f"{torch_prefix}.attn.container_gating"] = (
                ext_path + ("container", "gating"), _identity)
        if ext.layer_has("lora", modality, layer_idx):
            names = ["q", "v"]
            if ext.lora_add_where in ("v1", "v2"):
                names.append("k")
            if ext.lora_add_where == "v2":
                names.append("fc")
            for n in names:
                m[f"{torch_prefix}.attn.{n}_proj_adapter1.weight"] = (
                    ext_path + ("lora", n, "a"), _linear_w)
                m[f"{torch_prefix}.attn.{n}_proj_adapter2.weight"] = (
                    ext_path + ("lora", n, "b"), _linear_w)
            if ext.lora_moe == 1:
                for n in ("q", "v"):
                    m[f"{torch_prefix}.attn.{n}_moe_adapter1.weight"] = (
                        ext_path + ("lora", f"{n}_moe"), _linear_w)
        if ext.gumbel_select:
            sp = ext_path + ("specific",)
            m[f"{torch_prefix}.specific_attn.in_proj_weight"] = (
                sp + ("attn", "qkv_w"), _linear_w)
            m[f"{torch_prefix}.specific_attn.in_proj_bias"] = (
                sp + ("attn", "qkv_b"), _identity)
            m[f"{torch_prefix}.specific_attn.out_proj.weight"] = (
                sp + ("attn", "out_w"), _linear_w)
            m[f"{torch_prefix}.specific_attn.out_proj.bias"] = (
                sp + ("attn", "out_b"), _identity)
            lin(f"{torch_prefix}.specific_mlp.c_fc", sp + ("mlp", "c_fc"))
            lin(f"{torch_prefix}.specific_mlp.c_proj",
                sp + ("mlp", "c_proj"))
            ln(f"{torch_prefix}.specific_ln_1", sp + ("ln_1",))
            ln(f"{torch_prefix}.specific_ln_2", sp + ("ln_2",))

    # ---- top level ----
    m["logit_scale"] = (("logit_scale",), _identity)
    if spec.ext.gumbel_select:
        m["gumbel_logit"] = (("gumbel_logit",), _identity)

    def lin(torch_prefix, path):
        m[f"{torch_prefix}.weight"] = (path + ("w",), _linear_w)
        m[f"{torch_prefix}.bias"] = (path + ("b",), _identity)

    def conv_pool(torch_key_prefix, path):
        # torch grouped Conv1d weight [C, 1, L] -> [L, C]
        m[f"{torch_key_prefix}.weight"] = (
            path + ("w",), lambda x: _t(x)[:, 0, :].T)
        m[f"{torch_key_prefix}.bias"] = (path + ("b",), _identity)

    # ---- visual tower ----
    V = ("visual",)

    if spec.vision_resnet_layers:
        # ModifiedResNet (reference :120-201)
        rn = V + ("resnet",)
        for i in (1, 2, 3):
            conv(f"visual.conv{i}.weight", rn + (f"conv{i}",))
            bnorm(f"visual.bn{i}", rn + (f"bn{i}",))
        inplanes_has_down = True
        for stage, n_blocks in enumerate(spec.vision_resnet_layers):
            for j in range(n_blocks):
                bt = f"visual.layer{stage + 1}.{j}"
                bp = rn + (f"layer{stage + 1}", j)
                conv(f"{bt}.conv1.weight", bp + ("conv1",))
                bnorm(f"{bt}.bn1", bp + ("bn1",))
                conv(f"{bt}.conv2.weight", bp + ("conv2",))
                bnorm(f"{bt}.bn2", bp + ("bn2",))
                conv(f"{bt}.conv3.weight", bp + ("conv3",))
                bnorm(f"{bt}.bn3", bp + ("bn3",))
                if j == 0:  # first block of each stage has the projection
                    conv(f"{bt}.downsample.0.weight", bp + ("down_conv",))
                    bnorm(f"{bt}.downsample.1", bp + ("down_bn",))
        ap = rn + ("attnpool",)
        m["visual.attnpool.positional_embedding"] = (
            ap + ("positional_embedding",), _identity)
        for proj in ("q_proj", "k_proj", "v_proj", "c_proj"):
            lin(f"visual.attnpool.{proj}", ap + (proj,))
        _map_text(m, spec, ln, lin, conv_pool, block,
                  sharing_active=False,
                  map_ext=map_block_extensions)
        return m

    m["visual.class_embedding"] = (V + ("class_embedding",), _identity)
    m["visual.positional_embedding"] = (
        V + ("positional_embedding",), _identity)
    m["visual.proj"] = (V + ("proj",), _identity)
    ln("visual.ln_pre", V + ("ln_pre",))
    ln("visual.ln_post", V + ("ln_post",))
    if spec.pool_type == "linear":
        conv_pool("visual.conv_pool", V + ("conv_pool",))

    if spec.early_conv:
        # stem location: resblocks.0 (EARLY_CONV_NEW_IMPLEMENT,
        # reference :2042-2051) or visual.conv1 (legacy path :2500)
        stem_t = ("visual.transformer.resblocks.0" if spec.stem_in_trunk
                  else "visual.conv1")
        stem_p = V + ("stem",)
        if spec.early_conv_res:
            conv(f"{stem_t}.conv1.weight", stem_p + ("conv1",))
            bnorm(f"{stem_t}.bn1", stem_p + ("bn1",))
            for i in range(len(spec.early_conv_strides)):
                st = f"{stem_t}.resnet_stage.conv_{i}"
                sp = stem_p + ("stages", i)
                conv(f"{st}.conv1.weight", sp + ("conv1",))
                bnorm(f"{st}.bn1", sp + ("bn1",))
                conv(f"{st}.downsample.0.weight", sp + ("down_conv",))
                bnorm(f"{st}.downsample.1", sp + ("down_bn",))
            conv(f"{stem_t}.last_conv.weight", stem_p + ("last_conv",))
        else:  # plain 6-conv stem (:2282-2342)
            for i in range(1, 6):
                conv(f"{stem_t}.conv_{i}.weight", stem_p + (f"conv_{i}",))
                bnorm(f"{stem_t}.bn_{i}", stem_p + (f"bn_{i}",))
            conv(f"{stem_t}.conv_6.weight", stem_p + ("conv_6",))
        first_block = 1 if spec.stem_in_trunk else 0
    else:
        conv("visual.conv1.weight", V + ("conv1",))
        first_block = 0

    for i in range(first_block, spec.effective_vision_layers):
        block(f"visual.transformer.resblocks.{i}",
              V + ("blocks", i - first_block))
        if spec.ext.any_active:
            map_block_extensions(
                f"visual.transformer.resblocks.{i}",
                V + ("ext_blocks", i - first_block), "visual", i,
            )

    def map_window_adapter(at, ap):
        m[f"{at}.q_proj_weight"] = (ap + ("q_w",), _linear_w)
        m[f"{at}.q_in_proj_bias"] = (ap + ("q_b",), _identity)
        conv(f"{at}.k_dwconv.conv.weight", ap + ("k_dwconv",))
        bnorm(f"{at}.k_dwconv.bn", ap + ("k_dwbn",))
        conv(f"{at}.v_dwconv.conv.weight", ap + ("v_dwconv",))
        bnorm(f"{at}.v_dwconv.bn", ap + ("v_dwbn",))
        lin(f"{at}.out_proj", ap + ("out",))
        conv(f"{at}.bottom_dw_conv.conv.weight", ap + ("bottom_dw_conv",))
        bnorm(f"{at}.bottom_dw_conv.bn", ap + ("bottom_dw_bn",))
        ln(f"{at}.ln_adapt", ap + ("ln_adapt",))
        if spec.window_relative_pos:
            m[f"{at}.relative_position_bias_table"] = (
                ap + ("rel_pos_table",), _identity)
            # index buffer is derived, not a parameter
            m[f"{at}.relative_position_index"] = (None, _identity)

    def map_b2t(at, ap):
        conv(f"{at}.top_dw_conv.conv.weight", ap + ("top_dw_conv",))
        bnorm(f"{at}.top_dw_conv.bn", ap + ("top_dw_bn",))
        if spec.b2t_mode == "deconv":
            conv(f"{at}.bottom2top_dw_deconv.conv.weight",
                 ap + ("b2t_dw_deconv",))
            bnorm(f"{at}.bottom2top_dw_deconv.bn", ap + ("b2t_dw_bn",))
            conv(f"{at}.bottom2top_pw_deconv.conv.weight",
                 ap + ("b2t_pw_conv",))
            bnorm(f"{at}.bottom2top_pw_deconv.bn", ap + ("b2t_pw_bn",))
        elif spec.b2t_mode == "bilinear":
            conv(f"{at}.bottom2top_dw_conv.conv.weight",
                 ap + ("b2t_dw_conv",))
            bnorm(f"{at}.bottom2top_dw_conv.bn", ap + ("b2t_dw_bn",))
            conv(f"{at}.bottom2top_pw_conv.conv.weight",
                 ap + ("b2t_pw_conv",))
            bnorm(f"{at}.bottom2top_pw_conv.bn", ap + ("b2t_pw_bn",))
        else:  # crossattn
            conv(f"{at}.bottom2top_dw_conv.conv.weight",
                 ap + ("b2t_dw_conv",))
            bnorm(f"{at}.bottom2top_dw_conv.bn", ap + ("b2t_dw_bn",))
            ca = ap + ("crossattn",)
            for n in ("q", "k", "v"):
                m[f"{at}.bottom2top_crossattn.{n}_proj_weight"] = (
                    ca + (f"{n}_w",), _linear_w)
                m[f"{at}.bottom2top_crossattn.{n}_in_proj_bias"] = (
                    ca + (f"{n}_b",), _identity)
            ln(f"{at}.bottom2top_ln", ap + ("b2t_ln",))

    def map_perceiver(torch_trunk, path):
        m[f"{torch_trunk}.perceiver_latent"] = (
            path + ("perceiver_latent",), _identity)
        for i in range(len(spec.perceiver_layers)):
            bt = f"{torch_trunk}.perceiver_latent2ori_blocks.{i}"
            bp = path + ("perceiver_blocks", i)
            m[f"{bt}.attn.in_proj_weight"] = (bp + ("attn", "qkv_w"),
                                              _linear_w)
            m[f"{bt}.attn.in_proj_bias"] = (bp + ("attn", "qkv_b"),
                                            _identity)
            m[f"{bt}.attn.out_proj.weight"] = (bp + ("attn", "out_w"),
                                               _linear_w)
            m[f"{bt}.attn.out_proj.bias"] = (bp + ("attn", "out_b"),
                                             _identity)
            lin(f"{bt}.mlp.c_fc", bp + ("mlp", "c_fc"))
            lin(f"{bt}.mlp.c_proj", bp + ("mlp", "c_proj"))
            ln(f"{bt}.ln_1", bp + ("ln_1",))
            ln(f"{bt}.ln_2", bp + ("ln_2",))
            ln(f"{bt}.norm_context", bp + ("norm_context",))

    if spec.perceiver_in_v:
        map_perceiver("visual.transformer", V)

    if spec.parallel:
        for i in range(spec.parallel_n_layers):
            bt = f"visual.transformer.parallel_branch_v.{i}"
            bp = V + ("parallel_stages", i)
            if i == 0 or spec.parallel_resnet_layers[i] == 0:
                conv(f"{bt}.conv.weight", bp + ("conv",))
                bnorm(f"{bt}.bn", bp + ("bn",))
            else:
                for j in range(spec.parallel_resnet_layers[i]):
                    ct = f"{bt}.resnet_stage.conv_{j}"
                    cp = bp + ("blocks", j)
                    conv(f"{ct}.conv1.weight", cp + ("conv1",))
                    bnorm(f"{ct}.bn1", cp + ("bn1",))
                    conv(f"{ct}.conv2.weight", cp + ("conv2",))
                    bnorm(f"{ct}.bn2", cp + ("bn2",))
                    conv(f"{ct}.conv3.weight", cp + ("conv3",))
                    bnorm(f"{ct}.bn3", cp + ("bn3",))
                    if j == 0:
                        conv(f"{ct}.residual_conv.weight",
                             cp + ("residual_conv",))
                        bnorm(f"{ct}.residual_bn", cp + ("residual_bn",))
        for i in range(len(spec.lateral_layers)):
            at = f"visual.transformer.parallel_lateral_adapter.{i}"
            ap = V + ("lateral_adapters", i)
            if spec.t2b_windowattn:
                map_window_adapter(at, ap)
                continue
            conv(f"{at}.top2bottom_dw_conv.conv.weight",
                 ap + ("t2b_dw_conv",))
            bnorm(f"{at}.top2bottom_dw_conv.bn", ap + ("t2b_dw_bn",))
            conv(f"{at}.top2bottom_pw_conv.conv.weight",
                 ap + ("t2b_pw_conv",))
            if spec.t2b_bn_relu:
                bnorm(f"{at}.top2bottom_pw_conv.bn", ap + ("t2b_pw_bn",))
            if spec.t2b_bn_ln_relu:
                ln(f"{at}.top2bottom_pw_conv.ln", ap + ("t2b_pw_ln",))
            conv(f"{at}.bottom_dw_conv.conv.weight",
                 ap + ("bottom_dw_conv",))
            bnorm(f"{at}.bottom_dw_conv.bn", ap + ("bottom_dw_bn",))
            if not spec.t2b_noln_add:
                ln(f"{at}.ln_adapt", ap + ("ln_adapt",))
            if spec.b2t_active(i):
                map_b2t(at, ap)

    if spec.perceiver_in_t:
        map_perceiver("transformer", ("text",))
    _map_text(m, spec, ln, lin, conv_pool, block, sharing_active=True,
              map_ext=map_block_extensions)
    return m


def _map_text(m, spec, ln, lin, conv_pool, block, sharing_active,
              map_ext=None):
    T = ("text",)
    m["token_embedding.weight"] = (T + ("token_embedding",), _identity)
    m["positional_embedding"] = (T + ("positional_embedding",), _identity)
    m["text_projection"] = (T + ("text_projection",), _identity)
    ln("ln_final", T + ("ln_final",))
    if spec.pool_type == "linear":
        conv_pool("conv_pool", T + ("conv_pool",))

    shared_keys = set(spec.shared_param_keys())
    # text block i consumes visual params-block i - offset
    # (resolve_text_block's inverse mapping)
    offset = (1 if spec.visual_layer_minus1 else 0) \
        + (1 if spec.stem_in_trunk else 0)
    for i in range(spec.text_layers):
        absent, alias_base = (), None
        if sharing_active and spec.text_layer_is_shared(i):
            absent = tuple(
                n for n in ("attn.qkv_w", "attn.qkv_b", "attn.out_w",
                            "attn.out_b")
                if n in shared_keys
            )
            if "mlp" in shared_keys:
                absent = absent + ("mlp.c_fc.w", "mlp.c_fc.b",
                                   "mlp.c_proj.w", "mlp.c_proj.b")
            alias_base = ("visual", "blocks", i - offset)
        block(f"transformer.resblocks.{i}", T + ("blocks", i),
              shared_absent=absent, alias_base=alias_base)
        if spec.ext.any_active and map_ext is not None:
            map_ext(f"transformer.resblocks.{i}",
                    T + ("ext_blocks", i), "text", i)


def _set_path(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def _get_path(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def convert_torch_state_dict(state_dict, spec: MSClipSpec, template=None,
                             strict: bool = True):
    """Convert a torch ``state_dict`` (tensors or numpy) to a params pytree.

    ``template``: an initialized params tree used for structure and shape
    validation; if None, one is created with ``init_params``.
    """
    import jax.numpy as jnp

    from ..models.msclip import init_params

    if template is None:
        template = init_params(jax.random.PRNGKey(0), spec)
    params = jax.tree.map(lambda x: x, template)  # shallow-copy leaves
    # deep-copy container structure so we can mutate
    params = _deep_copy_containers(template)

    key_map = build_key_map(spec)
    consumed = set()
    filled = set()
    pending_alias = []  # (torch key, transformed value, visual path)
    for key, value in state_dict.items():
        if key.endswith("num_batches_tracked"):
            consumed.add(key)
            continue
        if key not in key_map:
            if strict:
                raise KeyError(f"Unmapped torch key: {key}")
            continue
        entry = key_map[key]
        path, fn = entry[0], entry[1]
        arr = fn(value)
        if path is None:
            consumed.add(key)  # aliased duplicate; verified below
            if len(entry) > 2 and entry[2] is not None:
                pending_alias.append((key, arr, entry[2]))
            continue
        expected = _get_path(template, path)
        if tuple(arr.shape) != tuple(expected.shape):
            # tolerate rank-only differences (e.g. logit_scale stored as
            # shape (1,) vs scalar)
            if arr.size == expected.size:
                arr = arr.reshape(expected.shape)
            else:
                raise ValueError(
                    f"Shape mismatch for {key} -> {path}: torch {arr.shape} "
                    f"vs params {expected.shape}"
                )
        _set_path(params, path, jnp.asarray(arr, dtype=jnp.float32))
        consumed.add(key)
        filled.add(path)

    # Verify every aliased text-side copy against the stored visual copy.
    # A checkpoint whose duplicates diverge was never actually
    # weight-shared and must fail loudly, not evaluate wrong. Under
    # strict=False a partial checkpoint may carry the text-side key
    # without its visual source; there the stored value is the template's
    # random init, so comparing would spuriously fail — skip those.
    for key, arr, alias_path in pending_alias:
        if not strict and alias_path not in filled:
            continue
        stored = np.asarray(_get_path(params, alias_path), np.float32)
        ok = tuple(arr.shape) == tuple(stored.shape) and np.allclose(
            arr.astype(np.float32), stored, rtol=1e-5, atol=1e-6
        )
        if not ok:
            diff = (np.abs(arr.astype(np.float32) - stored).max()
                    if arr.shape == stored.shape else "shape mismatch")
            raise ValueError(
                f"Aliased shared key {key!r} diverges from its visual copy "
                f"at {'/'.join(map(str, alias_path))} (max |diff| = {diff}); "
                "this checkpoint is not weight-shared as the spec claims"
            )

    if strict:
        missing_torch = [
            k for k, entry in key_map.items()
            if entry[0] is not None and entry[0] not in filled
        ]
        if missing_torch:
            raise KeyError(
                f"{len(missing_torch)} params not found in the state_dict, "
                f"e.g. {missing_torch[:5]}"
            )
        unconsumed = set(state_dict.keys()) - consumed
        if unconsumed:
            raise KeyError(
                f"{len(unconsumed)} torch keys not consumed, e.g. "
                f"{sorted(unconsumed)[:5]}"
            )
    # matched / non-matched accounting, mirroring the reference's partial-
    # load logging (lib/utils/utils.py:267-271). The four counts
    # partition the state_dict exactly: stored + aliased + ignored
    # (num_batches_tracked bookkeeping) + unmapped == len(state_dict).
    n_stored = len(filled)
    n_aliased = len(pending_alias)
    n_ignored = len(consumed) - n_stored - n_aliased
    logging.info(
        "=> converted %d/%d torch keys: %d stored, %d aliased-and-verified,"
        " %d ignored, %d unmapped", len(consumed), len(state_dict),
        n_stored, n_aliased, n_ignored, len(state_dict) - len(consumed),
    )
    return params


def _deep_copy_containers(tree):
    if isinstance(tree, dict):
        return {k: _deep_copy_containers(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_deep_copy_containers(v) for v in tree]
    return tree


def export_torch_state_dict(params, spec: MSClipSpec):
    """Inverse conversion: params pytree -> reference-layout state_dict
    (numpy values). Shared text-layer keys are emitted under both alias
    names, matching what ``model.state_dict()`` produces for aliased
    modules in the reference."""
    from ..models.msclip import resolve_text_block

    key_map = build_key_map(spec)
    out = {}
    inverse = {
        _linear_w: lambda a: np.asarray(a).T,
        _conv_w: lambda a: np.asarray(a).transpose(3, 2, 0, 1),
        _identity: lambda a: np.asarray(a),
    }
    for key, entry in key_map.items():
        path, fn = entry[0], entry[1]
        if path is not None:
            out[key] = inverse[fn](_get_path(params, path))
    # aliased duplicates for shared text layers
    for i in range(spec.text_layers):
        if not spec.text_layer_is_shared(i):
            continue
        blk = resolve_text_block(params, spec, i)
        prefix = f"transformer.resblocks.{i}"
        out[f"{prefix}.attn.in_proj_weight"] = np.asarray(
            blk["attn"]["qkv_w"]).T
        out[f"{prefix}.attn.in_proj_bias"] = np.asarray(blk["attn"]["qkv_b"])
        out[f"{prefix}.attn.out_proj.weight"] = np.asarray(
            blk["attn"]["out_w"]).T
        out[f"{prefix}.attn.out_proj.bias"] = np.asarray(blk["attn"]["out_b"])
        out[f"{prefix}.mlp.c_fc.weight"] = np.asarray(
            blk["mlp"]["c_fc"]["w"]).T
        out[f"{prefix}.mlp.c_fc.bias"] = np.asarray(blk["mlp"]["c_fc"]["b"])
        out[f"{prefix}.mlp.c_proj.weight"] = np.asarray(
            blk["mlp"]["c_proj"]["w"]).T
        out[f"{prefix}.mlp.c_proj.bias"] = np.asarray(
            blk["mlp"]["c_proj"]["b"])
    return out
