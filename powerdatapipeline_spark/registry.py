"""Plugin registry (reference ``@register_model`` + ``model_registry``,
config/config.py:11-24, powerdatapipeline/__init__.py:1): string-id →
class/builder registry with duck-type checks, minus any Keras dependency.

The reference checks for ``compile``/``fit``/``call`` methods; here the
registered object must expose ``build`` (returns a DataFrame plan) or be a
plain callable — the engine's unit of pluggability is a query/transform
builder, not a Keras model.
"""

from __future__ import annotations

import warnings
from typing import Callable

from powerdatapipeline_spark import model_registry


def register_model(model_id: str) -> Callable:
    """Class/function decorator registering a builder under ``model_id``.

    Mirrors the reference's semantics: re-registration warns and overwrites
    (reference config/config.py:14-16); duck-type validation rejects objects
    with neither a ``build`` method nor plain callability.
    """
    def deco(obj):
        if model_id in model_registry:
            warnings.warn(f"model id {model_id!r} already registered; overwriting")
        if not (callable(obj) or hasattr(obj, "build")):
            raise TypeError(
                f"{obj!r} is not registrable: needs to be callable or define build()")
        model_registry[model_id] = obj
        return obj
    return deco


def get_model(model_id: str):
    if model_id not in model_registry:
        raise KeyError(f"unknown model id {model_id!r}; "
                       f"registered: {sorted(model_registry)}")
    return model_registry[model_id]
