"""Small utilities mirroring the reference's utilities/utilities.py surface:
file checks, globs, JSON write, checkpoint-name parsing, validation-error
tables.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import re


def find_files(filepattern: str) -> list[str]:
    """Glob → sorted file list (reference utilities.py:58-61). Spark readers
    accept globs natively; this exists for pre-flight checks."""
    return sorted(_glob.glob(filepattern))


def check_if_file_exists(file: str, file_type: str) -> None:
    """Raise unless ``file`` exists and its name contains ``file_type``
    (reference utilities.py:51-56)."""
    if not os.path.exists(file):
        raise FileNotFoundError(file)
    if file_type not in os.path.basename(file):
        raise ValueError(f"{file} is not a {file_type} file")


def write_json_file(json_object: str | dict, json_file_name: str) -> None:
    """Write a JSON payload (reference utilities.py:47-49)."""
    with open(json_file_name, "w") as f:
        if isinstance(json_object, str):
            f.write(json_object)
        else:
            json.dump(json_object, f, indent=2)


# the reference's exact grammar (utilities/utilities.py:96-99):
#   w-<window>_f-<inputs>_o-<targets>_n-<rows>_<model_type>_model.epoch<N>-loss<F>.keras
# model_type may itself contain underscores ([a-zA-Z_]+, e.g. "stacked_lstm");
# the trailing literal "_model." disambiguates where it ends. Anchored match,
# like the reference's re.match.
_CKPT_RE = re.compile(
    r"w-(?P<window_size>\d+)_f-(?P<n_input_features>\d+)_"
    r"o-(?P<n_target_features>\d+)_n-(?P<n_rows>\d+)_"
    r"(?P<model_type>[a-zA-Z_]+)_model\.epoch\d+-loss\d+\.\d+\.keras")


def parse_checkpoint_name(name: str) -> dict:
    """Extract (window_size, n_input_features, n_target_features, n_rows,
    model_type) from a checkpoint filename — the reference's
    ``extract_checkpoint_info`` (utilities/utilities.py:96-110), same grammar
    and key names. Numeric dimensions are returned as ints (the reference
    keeps them as strings; equality semantics are identical for the
    zero-padding-free names the reference itself emits)."""
    m = _CKPT_RE.match(os.path.basename(name))
    if not m:
        raise ValueError(
            f"Filename {name!r} does not match the expected format.")
    d = m.groupdict()
    return {k: (v if k == "model_type" else int(v)) for k, v in d.items()}


def checkpoints_compatible(a: str, b: str) -> bool:
    """Compare two checkpoint paths on ALL five parsed dimensions, raising
    ``ValueError`` naming the first mismatching key — the reference's
    ``compare_checkpoint_paths`` (utilities/utilities.py:112-126: basenames,
    every key gates, mismatch raises with details). Returns True when
    everything agrees."""
    fa, fb = os.path.basename(a), os.path.basename(b)
    pa, pb = parse_checkpoint_name(fa), parse_checkpoint_name(fb)
    for key in pa:
        if pa[key] != pb[key]:
            raise ValueError(
                f"Mismatch in {key!r}: {pa[key]!r} (from {fa!r}) != "
                f"{pb[key]!r} (from {fb!r})")
    return True


def validation_errors_to_rows(errors: list[dict]) -> list[dict]:
    """Pydantic validation errors → row dicts ready for a DataFrame/CSV dump
    (the reference's version is broken — it uses pandas without importing it,
    utilities.py:63-94, SURVEY.md Appendix A.6; fixed by construction here)."""
    return [{
        "location": "/".join(str(p) for p in e.get("loc", ())),
        "message": e.get("msg", ""),
        "type": e.get("type", ""),
    } for e in errors]
