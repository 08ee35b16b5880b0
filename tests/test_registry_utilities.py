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


def test_checkpoint_name_roundtrip():
    name = "ckpt_window10_features5_targets1_rows2000_LSTM.keras"
    d = parse_checkpoint_name(name)
    assert d == {"window_size": 10, "n_features": 5, "n_targets": 1,
                 "n_rows": 2000, "model_type": "LSTM"}
    other = "ckpt_window10_features5_targets1_rows9999_GRU.keras"
    assert checkpoints_compatible(name, other)  # n_rows doesn't gate compat
    assert not checkpoints_compatible(
        name, "ckpt_window11_features5_targets1_rows2000_LSTM.keras")
    with pytest.raises(ValueError):
        parse_checkpoint_name("nonsense")


def test_validation_errors_to_rows():
    rows = validation_errors_to_rows(
        [{"loc": ("datapipeline", "extraction"), "msg": "bad", "type": "value_error"}])
    assert rows == [{"location": "datapipeline/extraction", "message": "bad",
                     "type": "value_error"}]
