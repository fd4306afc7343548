"""Auxiliary subsystem tests: comm helpers, model summary, introspection
taps."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msclip_tpu.models import MSClipModel
from msclip_tpu.utils.comm import comm, reduce_dict, all_gather_object
from msclip_tpu.utils.summary import model_summary, param_tree_summary


def _spec():
    from test_train import tiny_msclips_spec

    return tiny_msclips_spec()


def test_comm_single_process():
    assert comm.world_size == 1
    assert comm.is_main_process()
    comm.synchronize()  # no-op
    assert all_gather_object({"a": 1}) == [{"a": 1}]
    assert reduce_dict({"x": 2.0}) == {"x": 2.0}


def test_param_tree_summary():
    model = MSClipModel(_spec())
    params = model.init(jax.random.PRNGKey(0))
    counts = param_tree_summary(params)
    assert counts["TOTAL"] == sum(
        x.size for x in jax.tree.leaves(params)
    )
    assert any(k.startswith("visual") for k in counts)


def test_model_summary_string():
    model = MSClipModel(_spec())
    params = model.init(jax.random.PRNGKey(0))
    s = model_summary(model, params, image_size=32, context_length=16)
    assert "TOTAL" in s


def test_introspection_taps():
    from msclip_tpu.models.introspect import (
        encode_image_with_taps,
        encode_text_with_taps,
    )
    from msclip_tpu.models import encode_image, encode_text

    spec = _spec()
    model = MSClipModel(spec)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    )
    feats, taps = encode_image_with_taps(params, spec, images)
    # features identical to the production path
    np.testing.assert_allclose(
        np.asarray(feats),
        np.asarray(encode_image(params, spec, images)),
        atol=1e-6,
    )
    n_blocks = spec.n_trunk_blocks
    Lq = spec.vision_seq_len
    assert taps["layer_features"].shape == (n_blocks, 2, Lq, 64)
    assert taps["attn_maps"].shape == (n_blocks, 2, spec.vision_heads,
                                       Lq, Lq)
    # attention rows sum to 1
    np.testing.assert_allclose(
        np.asarray(taps["attn_maps"].sum(-1)), 1.0, atol=1e-5
    )

    tokens = np.zeros((2, spec.context_length), np.int32)
    tokens[:, 0] = spec.vocab_size - 2
    tokens[:, 1] = 5
    tokens[:, 2] = spec.vocab_size - 1
    tfeats, ttaps = encode_text_with_taps(params, spec,
                                          jnp.asarray(tokens))
    np.testing.assert_allclose(
        np.asarray(tfeats),
        np.asarray(encode_text(params, spec, jnp.asarray(tokens))),
        atol=1e-6,
    )
    assert ttaps["attn_maps"].shape[0] == spec.text_layers


def test_tokenize_with_idx():
    from msclip_tpu.data import ClipTokenizer

    tok = ClipTokenizer()
    ids, idxs = tok.tokenize_with_idx(["a photograph of a dog"],
                                      input_idxs=[1, 4])
    assert ids.shape == (1, 77)
    assert ids[0, 0] == tok.sot_token
    # "photograph" may split into several BPE tokens; indices point into
    # the token sequence (offset by SOT)
    assert all(i >= 1 for i in idxs)
    assert len(idxs) == 2


def test_run_name_builders():
    from msclip_tpu.config import get_default_config, update_config
    from msclip_tpu.config.names import get_config_name

    cfg = get_default_config()
    update_config(cfg, "experiments/model/b32-yfcc-msclips.yaml")
    name = get_config_name(cfg, world_size=8)
    assert "clip_openai_pe_res_v1" in name
    assert "224x224" in name
    assert "X8" in name


def test_cast_params_keeps_bn_stats():
    import jax.numpy as jnp

    from msclip_tpu.models import cast_params

    params = {
        "w": jnp.ones((4, 4), jnp.float32),
        "bn": {"scale": jnp.ones(4), "mean": jnp.zeros(4),
               "var": jnp.ones(4)},
    }
    out = cast_params(params)
    assert out["w"].dtype == jnp.bfloat16
    assert out["bn"]["scale"].dtype == jnp.bfloat16
    assert out["bn"]["mean"].dtype == jnp.float32
    assert out["bn"]["var"].dtype == jnp.float32


def test_partial_load_gpt2():
    """GPT-2-style block weights land in the shared trunk blocks for the
    N_LAYERS-implied range, and flow to the text tower via sharing."""
    import jax.numpy as jnp

    from msclip_tpu.models import encode_text, init_params
    from msclip_tpu.models.msclip import resolve_text_block
    from msclip_tpu.utils.partial_load import load_layer_range, partial_load_gpt2
    from test_train import tiny_msclips_spec

    spec = tiny_msclips_spec()  # share_n_layers=1, 3 text layers
    assert load_layer_range(spec) == [1, 2]
    params = init_params(jax.random.PRNGKey(0), spec)
    E = spec.text_width
    rng = np.random.default_rng(0)
    sd = {}
    for l in (1, 2):
        sd[f"h.{l}.attn.c_attn.weight"] = rng.standard_normal(
            (E, 3 * E)).astype(np.float32)
        sd[f"h.{l}.ln_1.weight"] = np.full(E, 2.0, np.float32)
    loaded = partial_load_gpt2(params, spec, sd)
    # landed in visual trunk block 0 (= trunk layer 1)
    np.testing.assert_array_equal(
        np.asarray(loaded["visual"]["blocks"][0]["attn"]["qkv_w"]),
        sd["h.1.attn.c_attn.weight"],
    )
    np.testing.assert_array_equal(
        np.asarray(loaded["visual"]["blocks"][0]["ln_1"]["scale"]), 2.0
    )
    # and the text tower consumes it through sharing
    blk = resolve_text_block(loaded, spec, 1)
    np.testing.assert_array_equal(
        np.asarray(blk["attn"]["qkv_w"]), sd["h.1.attn.c_attn.weight"]
    )


def test_compile_cache_persists_across_processes(tmp_path):
    """MSCLIP_COMPILE_CACHE: apply_platform_override enables JAX's
    persistent compilation cache, entries land on disk, and a second
    process reuses them (same keys, no rewrite) instead of recompiling."""
    import os
    import subprocess
    import sys

    code = """
from msclip_tpu.utils.platform import apply_platform_override
apply_platform_override()
import jax, jax.numpy as jnp
f = jax.jit(lambda x: (x @ x).sum() * 3)
print(float(f(jnp.eye(64))))
"""
    env = dict(os.environ, MSCLIP_PLATFORM="cpu",
               MSCLIP_COMPILE_CACHE=str(tmp_path / "jit_cache"))
    r1 = subprocess.run([sys.executable, "-c", code], env=env,
                        capture_output=True, text=True, timeout=300)
    assert r1.returncode == 0, r1.stderr[-1500:]
    entries = list((tmp_path / "jit_cache").iterdir())
    assert entries, "no persistent cache entries written"
    mtimes = {p: p.stat().st_mtime_ns for p in entries}

    r2 = subprocess.run([sys.executable, "-c", code], env=env,
                        capture_output=True, text=True, timeout=300)
    assert r2.returncode == 0, r2.stderr[-1500:]
    # same program -> same keys: no new entries, none rewritten
    after = list((tmp_path / "jit_cache").iterdir())
    assert {p.name for p in after} == {p.name for p in entries}
    for p in after:
        assert p.stat().st_mtime_ns == mtimes[p], "cache entry rewritten"


def test_detect_anomaly_knobs(monkeypatch):
    """TRAIN.DETECT_ANOMALY / MSCLIP_DEBUG_NANS=1 must actually flip
    jax_debug_nans (the key was silently inert in r3 — VERDICT #3), and
    the enabled sanitizer must raise on a NaN inside jit."""
    from msclip_tpu.utils.platform import apply_platform_override
    from msclip_tpu.utils.summary import debug_nans

    assert not jax.config.jax_debug_nans
    monkeypatch.setenv("MSCLIP_DEBUG_NANS", "1")
    try:
        apply_platform_override()  # the shared CLI startup path
        assert jax.config.jax_debug_nans
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x) * 0.0 + jnp.sqrt(x))(
                jnp.float32(-1.0)
            ).block_until_ready()
    finally:
        debug_nans(False)
    assert not jax.config.jax_debug_nans


def test_xla_compiler_options_backend_guard(monkeypatch):
    """xla_compiler_options must return None on non-TPU backends (the CPU
    compiler rejects unknown TPU flags) and honor MSCLIP_XLA_VMEM_KIB,
    including the =0 kill switch."""
    from msclip_tpu.utils import platform as plat

    # tests run on the forced-CPU backend: always None, even when asked
    assert plat.xla_compiler_options(32768) is None
    monkeypatch.setenv("MSCLIP_XLA_VMEM_KIB", "32768")
    assert plat.xla_compiler_options() is None

    # pretend-TPU backend: the dict comes through, env wins over the arg
    import jax as _jax

    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    assert plat.xla_compiler_options() == {
        "xla_tpu_scoped_vmem_limit_kib": "32768"
    }
    monkeypatch.setenv("MSCLIP_XLA_VMEM_KIB", "0")
    assert plat.xla_compiler_options(32768) is None
    monkeypatch.delenv("MSCLIP_XLA_VMEM_KIB")
    assert plat.xla_compiler_options(24576) == {
        "xla_tpu_scoped_vmem_limit_kib": "24576"
    }

    # 'axon' (this environment's tunneled-TPU platform name) must pass
    # the gate too — regression for the option silently dying on the
    # exact hardware the sweep measured it on
    monkeypatch.setattr(_jax, "default_backend", lambda: "axon")
    assert plat.xla_compiler_options(24576) == {
        "xla_tpu_scoped_vmem_limit_kib": "24576"
    }
