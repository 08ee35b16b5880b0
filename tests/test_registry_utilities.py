"""Plugin registry + utilities parity (reference config/config.py:11-24,
utilities/utilities.py)."""

import json

import pytest

from powerdatapipeline_spark import model_registry
from powerdatapipeline_spark.registry import get_model, register_model
from powerdatapipeline_spark.utilities import (
    check_if_file_exists,
    checkpoints_compatible,
    find_files,
    parse_checkpoint_name,
    validation_errors_to_rows,
    write_json_file,
)


def test_register_and_get():
    @register_model("test_builder")
    def build(spark):
        return None
    assert get_model("test_builder") is build
    model_registry.pop("test_builder")


def test_reregistration_warns():
    @register_model("dup_id")
    def one():
        pass
    with pytest.warns(UserWarning):
        @register_model("dup_id")
        def two():
            pass
    assert get_model("dup_id") is two
    model_registry.pop("dup_id")


def test_register_rejects_non_callable():
    with pytest.raises(TypeError):
        register_model("bad")(object())


def test_get_unknown_raises():
    with pytest.raises(KeyError):
        get_model("nope")


def test_find_files_and_existence(tmp_path):
    (tmp_path / "a_model.json").write_text("{}")
    (tmp_path / "b_model.json").write_text("{}")
    found = find_files(str(tmp_path / "*_model.json"))
    assert len(found) == 2
    check_if_file_exists(found[0], "model")
    with pytest.raises(ValueError):
        check_if_file_exists(found[0], "checkpoint")
    with pytest.raises(FileNotFoundError):
        check_if_file_exists(str(tmp_path / "missing.json"), "model")


def test_write_json_file(tmp_path):
    p = str(tmp_path / "out.json")
    write_json_file({"a": 1}, p)
    assert json.load(open(p)) == {"a": 1}


def test_checkpoint_name_reference_grammar():
    # a literal reference-style name, incl. underscore-bearing model type
    name = "w-8_f-3_o-1_n-45000_stacked_lstm_model.epoch12-loss0.0342.keras"
    d = parse_checkpoint_name(name)
    assert d == {"window_size": 8, "n_input_features": 3,
                 "n_target_features": 1, "n_rows": 45000,
                 "model_type": "stacked_lstm"}
    # full paths parse via basename, like the reference
    assert parse_checkpoint_name("/ckpts/run1/" + name) == d
    with pytest.raises(ValueError):
        parse_checkpoint_name("nonsense")
    with pytest.raises(ValueError):  # anchored: prefix junk does not parse
        parse_checkpoint_name("ckpt_" + name)


def test_checkpoints_compatible_all_five_dimensions_gate():
    def nm(w=8, f=3, o=1, n=45000, t="lstm"):
        return f"w-{w}_f-{f}_o-{o}_n-{n}_{t}_model.epoch1-loss0.5.keras"
    assert checkpoints_compatible(nm(), "/elsewhere/" + nm())
    # every one of the five dimensions raises on mismatch (the reference
    # compares all keys and raises with details — utilities.py:119-125)
    for variant, key in [
        (nm(w=9), "window_size"), (nm(f=4), "n_input_features"),
        (nm(o=2), "n_target_features"), (nm(n=1), "n_rows"),
        (nm(t="gru"), "model_type"),
    ]:
        with pytest.raises(ValueError, match=key):
            checkpoints_compatible(nm(), variant)


def test_validation_errors_to_rows():
    rows = validation_errors_to_rows(
        [{"loc": ("datapipeline", "extraction"), "msg": "bad", "type": "value_error"}])
    assert rows == [{"location": "datapipeline/extraction", "message": "bad",
                     "type": "value_error"}]
