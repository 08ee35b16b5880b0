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


_CKPT_RE = re.compile(
    r"window(?P<window_size>\d+)_features(?P<n_features>\d+)_"
    r"targets(?P<n_targets>\d+)_rows(?P<n_rows>\d+)_(?P<model_type>[A-Za-z0-9]+)")


def parse_checkpoint_name(name: str) -> dict:
    """Extract (window_size, n_features, n_targets, n_rows, model_type) from
    a checkpoint filename (reference utilities.py:96-110)."""
    m = _CKPT_RE.search(name)
    if not m:
        raise ValueError(f"unparseable checkpoint name: {name!r}")
    d = m.groupdict()
    return {k: (v if k == "model_type" else int(v)) for k, v in d.items()}


def checkpoints_compatible(a: str, b: str) -> bool:
    """Compare two checkpoint names on their parsed dimensions (reference
    utilities.py:112-126)."""
    pa, pb = parse_checkpoint_name(a), parse_checkpoint_name(b)
    return all(pa[k] == pb[k] for k in ("window_size", "n_features", "n_targets"))


def validation_errors_to_rows(errors: list[dict]) -> list[dict]:
    """Pydantic validation errors → row dicts ready for a DataFrame/CSV dump
    (the reference's version is broken — it uses pandas without importing it,
    utilities.py:63-94, SURVEY.md Appendix A.6; fixed by construction here)."""
    return [{
        "location": "/".join(str(p) for p in e.get("loc", ())),
        "message": e.get("msg", ""),
        "type": e.get("type", ""),
    } for e in errors]
