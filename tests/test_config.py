"""Config-system tests: BASE inheritance, open/closed nodes, CLI merges,
and that the released MS-CLIP YAMLs parse to the expected values."""

import pytest

from msclip_tpu.config import CfgNode, get_default_config, update_config


def test_defaults_basic():
    c = get_default_config()
    assert c.TRAIN.LR == 0.001
    assert c.INPUT.MEAN == [0.485, 0.456, 0.406]
    assert c.CUSTOM.LR_SHARE == 0.0


def test_attribute_and_item_access():
    c = CfgNode({"A": {"B": 1}})
    assert c.A.B == 1
    c.A.B = 2
    assert c["A"]["B"] == 2


def test_closed_node_rejects_unknown():
    c = get_default_config()
    with pytest.raises(KeyError):
        c.merge_from_dict({"TRAIN": {"NOT_A_KEY": 1}})


def test_open_node_accepts_unknown():
    c = get_default_config()
    c.merge_from_dict({"CUSTOM": {"BRAND_NEW_KEY": [1, 2]}})
    assert c.CUSTOM.BRAND_NEW_KEY == [1, 2]


def test_merge_from_list_coercion():
    c = get_default_config()
    c.merge_from_list(["TRAIN.LR", "0.01", "AMP.ENABLED", "True"])
    assert c.TRAIN.LR == 0.01
    assert c.AMP.ENABLED is True


def test_type_mismatch_raises():
    c = get_default_config()
    with pytest.raises(TypeError):
        c.merge_from_dict({"TRAIN": {"LR": "fast"}})


def test_b32_msclips_yaml_parses(repo_root):
    c = get_default_config()
    update_config(c, str(repo_root / "experiments/model/b32-yfcc-msclips.yaml"))
    # BASE inheritance from b32.yaml
    assert c.MODEL.SPEC.EMBED_DIM == 512
    assert c.MODEL.SPEC.VISION.PATCH_SIZE == 32
    # overridden by msclips yaml
    assert c.MODEL.SPEC.TEXT.WIDTH == 768
    assert c.MODEL.SPEC.TEXT.HEADS == 12
    assert c.MODEL.SPEC.GATHER_TENSORS is True
    assert c.CUSTOM.SHARE_MODULES == [
        "attn.in_proj_weight",
        "attn.in_proj_bias",
        "attn.out_proj",
        "mlp",
    ]
    assert c.CUSTOM.PARALLEL_LATERAL_LAYER == [2, 4, 6, 8, 10]
    assert c.CUSTOM.PRALLEL_T2B_STRIDES == [16, 8, 4, 2, 1]
    assert c.NAME == "b32-yfcc-msclips"


def test_b16_yaml_overrides(repo_root):
    c = get_default_config()
    update_config(c, str(repo_root / "experiments/model/b16-yfcc-msclips.yaml"))
    assert c.MODEL.SPEC.VISION.PATCH_SIZE == 16
    assert c.CUSTOM.PARALLEL_STRIDES == [2, 2, 2, 2, 1]
    assert c.CUSTOM.EARLY_CONV_RES_STRIDES == [2, 2, 2, 1]
    assert c.CUSTOM.PRALLEL_T2B_KERNELS == [8, 4, 2, 1, 1]


def test_lr_world_size_scaling(repo_root):
    c = get_default_config()
    update_config(
        c,
        str(repo_root / "experiments/model/b32-yfcc-msclips.yaml"),
        world_size=8,
    )
    assert c.TRAIN.LR == pytest.approx(8 * 0.0001)
    assert c.CUSTOM.LR_SHARE == pytest.approx(8 * 0.0001)


def test_dataset_then_model_merge(repo_root):
    # The eval driver merges dataset yaml first, then model yaml
    # (reference tools/zero_shot.py:185-188).
    c = get_default_config()
    update_config(c, str(repo_root / "experiments/dataset/imagenet.yaml"))
    update_config(c, str(repo_root / "experiments/model/b32-yfcc-msclips.yaml"))
    assert c.DATASET.DATASET == "imagenet"
    assert c.TEST.METRIC == "accuracy"
    assert c.MODEL.NAME == "clip_openai_pe_res_v1"


def test_dump_roundtrip():
    c = get_default_config()
    d = c.dump()
    import yaml

    parsed = yaml.safe_load(d)
    assert parsed["TRAIN"]["LR"] == 0.001
    assert "__is_open__" not in d


def test_use_pallas_auto_resolution(repo_root):
    """TPU.USE_PALLAS='auto' (the default) resolves by backend: False on
    the CPU test mesh, and explicit values pass through."""
    from msclip_tpu.models import spec_from_config

    c = get_default_config()
    update_config(c, str(repo_root / "experiments/model/b32-yfcc-msclips.yaml"))
    assert c.TPU.USE_PALLAS == "auto"
    assert spec_from_config(c).use_pallas is False  # cpu backend here

    c.TPU.USE_PALLAS = True
    assert spec_from_config(c).use_pallas is True
    c.TPU.USE_PALLAS = False
    assert spec_from_config(c).use_pallas is False


def test_unsupported_text_style_raises(repo_root):
    """A YAML requesting the reference's HF text-tower branch must fail
    loudly, not be silently ignored (reference asserts STYLE == 'clip' in
    its eval path, clip_openai_pe_res_v1.py:2994,3011)."""
    from msclip_tpu.models import spec_from_config

    c = get_default_config()
    update_config(c, str(repo_root / "experiments/model/b32-yfcc-msclips.yaml"))
    c.MODEL.SPEC.TEXT["STYLE"] = "hf"
    with pytest.raises(ValueError, match="STYLE"):
        spec_from_config(c)


def test_unsupported_tokenizer_raises(repo_root):
    from msclip_tpu.models import spec_from_config

    c = get_default_config()
    update_config(c, str(repo_root / "experiments/model/b32-yfcc-msclips.yaml"))
    c.MODEL.SPEC.TEXT["TOKENIZER"] = "bert"
    with pytest.raises(ValueError, match="TOKENIZER"):
        spec_from_config(c)


def test_clip_style_accepted(repo_root):
    """Explicit STYLE/TOKENIZER 'clip' (as in the released b32.yaml) must
    still build."""
    from msclip_tpu.models import spec_from_config

    c = get_default_config()
    update_config(c, str(repo_root / "experiments/model/b32-yfcc-msclips.yaml"))
    c.MODEL.SPEC.TEXT["STYLE"] = "clip"
    c.MODEL.SPEC.TEXT["TOKENIZER"] = "clip"
    spec_from_config(c)  # no raise


def test_unsupported_earlyconv_res_block_raises(repo_root):
    from msclip_tpu.models import spec_from_config

    c = get_default_config()
    update_config(c, str(repo_root / "experiments/model/b32-yfcc-msclips.yaml"))
    c.CUSTOM["EARLY_CONV_RES_BLOCK"] = "bottleneck"
    with pytest.raises(ValueError, match="EARLY_CONV_RES_BLOCK"):
        spec_from_config(c)
    c.CUSTOM["EARLY_CONV_RES_BLOCK"] = "basic_v0"
    c.CUSTOM["EARLY_CONV_RES_LAYERS"] = [2, 1, 1, 1]
    with pytest.raises(ValueError, match="EARLY_CONV_RES_LAYERS"):
        spec_from_config(c)


def test_unread_custom_key_warns(repo_root):
    """A CUSTOM key the spec never reads (typo or unsupported feature)
    must produce a warning naming the key — never a silent no-op."""
    import warnings

    from msclip_tpu.models import spec_from_config

    c = get_default_config()
    update_config(c, str(repo_root / "experiments/model/b32-yfcc-msclips.yaml"))
    c.CUSTOM["PERCIEVER_IN_V"] = True  # typo'd PERCEIVER_IN_V
    with pytest.warns(UserWarning, match="PERCIEVER_IN_V"):
        spec_from_config(c)


def test_released_yamls_warn_free(repo_root):
    """Every released model YAML must build without unread-key warnings
    (their whole CUSTOM namespace is consumed or validated)."""
    import warnings

    from msclip_tpu.models import spec_from_config

    for name in ("b32.yaml", "b32-yfcc-msclips.yaml", "b16-yfcc-msclips.yaml",
                 "b32-laion-msclips.yaml"):
        c = get_default_config()
        update_config(c, str(repo_root / f"experiments/model/{name}"))
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            spec_from_config(c)


def test_save_config_roundtrip(tmp_path, repo_root):
    """`save_config` (reference `lib/config/default.py:330-333`) must dump
    a YAML that parses back to the identical tree via the BASE machinery."""
    from msclip_tpu.config.io import save_config

    c = get_default_config()
    update_config(c, str(repo_root / "experiments/model/b32-yfcc-msclips.yaml"))
    path = tmp_path / "dumped.yaml"
    save_config(c, str(path))
    assert path.exists() and path.stat().st_size > 0

    c2 = get_default_config()
    update_config(c2, str(path))
    # NAME composes the config-file stem (reference default.py:316-317),
    # so it legitimately differs; every other key must round-trip.
    d1, d2 = c.to_dict(), c2.to_dict()
    d1.pop("NAME"), d2.pop("NAME")
    assert d2 == d1
