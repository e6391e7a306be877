"""Config-system unit tests: CfgNode override parser, args->config mapping
quirks, and the config.json round trip used by the inference CLI
(reference behavior: src/utils.py:15-92, main.py:310-449, infer.py:58-73)."""

import pytest

from jolineedle_tpu.config import (
    CfgNode,
    args_to_config,
    config_from_file,
    get_args,
    save_config,
)


def _cli(*extra):
    return get_args(
        ["--dataset-dir", "/nonexistent", *extra]
    )


def test_cfgnode_merge_from_args_nested_and_literals():
    cfg = CfgNode(a=1, sub=CfgNode(b="x", c=2.0), flag=False)
    cfg.merge_from_args(["--a=5", "--sub.b='hello'", "--sub.c=0.25", "--flag=True"])
    assert cfg.a == 5
    assert cfg.sub.b == "hello"
    assert cfg.sub.c == 0.25
    assert cfg.flag is True


def test_cfgnode_merge_from_args_rejects_unknown_key():
    cfg = CfgNode(a=1)
    with pytest.raises(AssertionError):
        cfg.merge_from_args(["--nope=2"])


def test_cfgnode_merge_from_args_keeps_uneval_strings():
    cfg = CfgNode(name="old")
    cfg.merge_from_args(["--name=plain-string"])
    assert cfg.name == "plain-string"


def test_image_cols_quirk_sizes_positional_table():
    # image_cols = ceil(2064 / patch) (reference: main.py:364-366) and
    # pos_emb_size = image_cols**2 (reference: main.py:378).
    train_config, model_config = args_to_config(_cli("--patch-size", "448"))
    assert train_config.image_cols == 5
    assert model_config.pos_emb_size == 25


def test_test_max_seq_len_defaults_to_max_seq_len():
    train_config, _ = args_to_config(_cli("--max-seq-len", "12"))
    assert train_config.test_max_seq_len == 12
    train_config, _ = args_to_config(
        _cli("--max-seq-len", "12", "--test-max-seq-len", "30")
    )
    assert train_config.test_max_seq_len == 30


def test_model_size_table_applied():
    _, model_config = args_to_config(_cli("--model-type", "gpt-nano"))
    assert (model_config.n_layer, model_config.n_head, model_config.n_embd) == (
        3, 3, 48,
    )


def test_filter_classes_parsed_as_int_set():
    train_config, _ = args_to_config(
        _cli("--filter-classes", "3", "--filter-classes", "1")
    )
    assert train_config.filter_classes == {1, 3}


def test_best_metric_flag_flows_to_train_config():
    # Default: unset — trainers fall back to their mode's hardcoded
    # criterion (map / prop_patches_found).
    train_config, _ = args_to_config(_cli())
    assert train_config.best_metric is None
    train_config, _ = args_to_config(_cli("--best-metric", "map"))
    assert train_config.best_metric == "map"


def test_config_json_round_trip(tmp_path):
    train_config, model_config = args_to_config(
        _cli(
            "--patch-size", "64",
            "--model-type", "gpt-pico",
            "--enable-stop",
            "--filter-classes", "2",
            "--work-dir", str(tmp_path),
            "--env-name", "rt",
        )
    )
    save_config(model_config, train_config)
    path = tmp_path / "rt" / "config.json"
    assert path.is_file()

    train2, model2 = config_from_file(path)
    # Sets/Paths serialize to lists/strings; everything else round-trips.
    d1, d2 = train_config.to_dict(), train2.to_dict()
    d1["filter_classes"] = sorted(d1["filter_classes"])
    d1["betas"] = list(d1["betas"])
    assert d2 == d1
    assert model2.to_dict() == model_config.to_dict()
