"""Config system tests: flattening, attribute access, override semantics."""

import os
import textwrap

import pytest

from semseg_tpu import config as cfgmod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def yaml_file(tmp_path):
    p = tmp_path / "exp.yaml"
    p.write_text(
        textwrap.dedent(
            """\
            DATA:
              data_root: dataset/ade20k
              classes: 150
            TRAIN:
              arch: psp
              base_lr: 0.01
              scales_probe: [1.0, 2.0]
              manual_seed:
              sync_bn: True
            TEST:
              scales: [1.0]
              test_gpu: [0]
            """
        )
    )
    return str(p)


def test_flattens_sections(yaml_file):
    cfg = cfgmod.load_cfg(yaml_file)
    assert cfg.classes == 150
    assert cfg.arch == "psp"
    assert cfg.scales == [1.0]
    assert cfg.manual_seed is None
    assert cfg.sync_bn is True


def test_attribute_error_on_missing(yaml_file):
    cfg = cfgmod.load_cfg(yaml_file)
    with pytest.raises(AttributeError):
        _ = cfg.nonexistent


def test_merge_overrides_last_dotted_component(yaml_file):
    cfg = cfgmod.load_cfg(yaml_file)
    merged = cfgmod.merge_cfg_from_list(cfg, ["TEST.scales", "[0.5, 1.0]"])
    assert merged.scales == [0.5, 1.0]
    # original untouched
    assert cfg.scales == [1.0]


def test_merge_literal_eval_decoding(yaml_file):
    cfg = cfgmod.load_cfg(yaml_file)
    merged = cfgmod.merge_cfg_from_list(
        cfg, ["base_lr", "0.02", "arch", "psa", "sync_bn", "False"]
    )
    assert merged.base_lr == 0.02
    assert merged.arch == "psa"
    assert merged.sync_bn is False


def test_merge_rejects_unknown_key(yaml_file):
    cfg = cfgmod.load_cfg(yaml_file)
    with pytest.raises(KeyError):
        cfgmod.merge_cfg_from_list(cfg, ["TRAIN.not_a_key", "1"])


def test_merge_coerces_tuple_to_list(yaml_file):
    cfg = cfgmod.load_cfg(yaml_file)
    merged = cfgmod.merge_cfg_from_list(cfg, ["scales", "(0.5, 1.5)"])
    assert merged.scales == [0.5, 1.5]
    assert isinstance(merged.scales, list)


def test_merge_type_mismatch_raises(yaml_file):
    cfg = cfgmod.load_cfg(yaml_file)
    with pytest.raises(ValueError):
        cfgmod.merge_cfg_from_list(cfg, ["classes", "'many'"])


def test_merge_none_original_accepts_any(yaml_file):
    cfg = cfgmod.load_cfg(yaml_file)
    merged = cfgmod.merge_cfg_from_list(cfg, ["manual_seed", "123"])
    assert merged.manual_seed == 123


def test_int_to_float_widening(yaml_file):
    cfg = cfgmod.load_cfg(yaml_file)
    merged = cfgmod.merge_cfg_from_list(cfg, ["base_lr", "1"])
    assert merged.base_lr == 1.0
    assert isinstance(merged.base_lr, float)


ALL_CONFIGS = [
    os.path.join(REPO, "config", d, f)
    for d in ("ade20k", "voc2012", "cityscapes")
    for f in os.listdir(os.path.join(REPO, "config", d))
    if f.endswith(".yaml")
]


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=lambda p: os.path.basename(p))
def test_shipped_configs_load(path):
    cfg = cfgmod.load_cfg(path)
    # Required keys for every experiment.
    for key in (
        "data_root", "classes", "arch", "layers", "train_h", "train_w",
        "zoom_factor", "ignore_label", "aux_weight", "batch_size", "base_lr",
        "epochs", "power", "momentum", "weight_decay", "scales", "base_size",
        "test_h", "test_w", "model_path", "colors_path", "names_path",
    ):
        assert key in cfg, f"{path} missing {key}"
    assert cfg.arch in ("psp", "psa")
    assert (cfg.train_h - 1) % 8 == 0 and (cfg.train_w - 1) % 8 == 0
    if cfg.arch == "psa":
        for key in ("psa_type", "compact", "shrink_factor", "mask_h",
                    "mask_w", "normalization_factor", "psa_softmax"):
            assert key in cfg


def test_all_twelve_configs_present():
    assert len(ALL_CONFIGS) == 12


def test_override_edge_cases(yaml_file):
    cfg = cfgmod.load_cfg(yaml_file)
    # paths with slashes stay strings (SyntaxError path in literal_eval)
    merged = cfgmod.merge_cfg_from_list(cfg, ["data_root", "exp/a/b.c"])
    assert merged.data_root == "exp/a/b.c"
    # 'None' resets an option
    merged = cfgmod.merge_cfg_from_list(cfg, ["manual_seed", "None"])
    assert merged.manual_seed is None
    # negative numbers decode
    merged = cfgmod.merge_cfg_from_list(cfg, ["classes", "-1"])
    assert merged.classes == -1
    # booleans by name
    merged = cfgmod.merge_cfg_from_list(cfg, ["sync_bn", "True"])
    assert merged.sync_bn is True
    # dotted key: only last component matters, even nonsense prefixes
    merged = cfgmod.merge_cfg_from_list(cfg, ["X.Y.Z.arch", "psa"])
    assert merged.arch == "psa"


def test_extension_keys_accepted_unknown_rejected(yaml_file):
    """Framework extension keys (README "Configuration extensions") are
    valid CLI overrides even though the reference YAML schema lacks them;
    arbitrary unknown keys still error (reference util/config.py:117)."""
    cfg = cfgmod.load_cfg(yaml_file)
    merged = cfgmod.merge_cfg_from_list(
        cfg, ["native_loader", "True", "model_parallel", "2",
              "compute_dtype", "bfloat16", "pretrained", "False",
              "image_wire_dtype", "float16", "eval_bucket", "64"]
    )
    assert merged.native_loader is True
    assert merged.model_parallel == 2
    assert merged.compute_dtype == "bfloat16"
    assert merged.pretrained is False
    assert merged.image_wire_dtype == "float16"
    assert merged.eval_bucket == 64
    with pytest.raises(KeyError):
        cfgmod.merge_cfg_from_list(cfg, ["definitely_not_a_key", "1"])
