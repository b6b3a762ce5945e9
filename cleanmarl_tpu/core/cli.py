"""Tiny tyro-compatible CLI: build argparse from a flat ``@dataclass``.

The reference parses every algorithm's flat Args dataclass with
``tyro.cli(Args)`` (/root/reference/cleanmarl/vdn.py:186). tyro is not
available in this environment, so this module provides the same calling
convention for flat dataclasses: ``args = cli(Args)`` exposes each field
as ``--field_name`` (and tyro-style ``--field-name``), typed from the
annotation, with the dataclass default.
"""
from __future__ import annotations

import argparse
import dataclasses
from typing import Optional, Sequence, Type, TypeVar

T = TypeVar("T")


def _str2bool(v: str) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "1"):
        return True
    if v.lower() in ("no", "false", "f", "0"):
        return False
    raise argparse.ArgumentTypeError(f"boolean value expected, got {v!r}")


def cli(cls: Type[T], args: Optional[Sequence[str]] = None, description: str = "") -> T:
    assert dataclasses.is_dataclass(cls), "cli() expects a dataclass"
    parser = argparse.ArgumentParser(
        description=description or (cls.__doc__ or ""),
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    for field in dataclasses.fields(cls):
        if not field.init:
            continue
        default = (
            field.default
            if field.default is not dataclasses.MISSING
            else field.default_factory()  # type: ignore[misc]
            if field.default_factory is not dataclasses.MISSING
            else None
        )
        names = [f"--{field.name}"]
        if "_" in field.name:
            names.append(f"--{field.name.replace('_', '-')}")
        ftype = field.type if callable(field.type) else str
        if ftype is bool or field.type in ("bool",):
            parser.add_argument(*names, type=_str2bool, default=default, help=" ")
        else:
            if isinstance(field.type, str):  # from __future__ annotations
                ftype = {"int": int, "float": float, "str": str}.get(field.type, str)
            parser.add_argument(*names, type=ftype, default=default, help=" ")
    ns = parser.parse_args(args)
    kwargs = {f.name: getattr(ns, f.name) for f in dataclasses.fields(cls) if f.init}
    cfg = cls(**kwargs)
    # multi-host bootstrap must precede every other JAX call in the
    # process (no-op without --coordinator_address)
    from cleanmarl_tpu.distributed.multihost import maybe_initialize

    maybe_initialize(cfg)
    return cfg
