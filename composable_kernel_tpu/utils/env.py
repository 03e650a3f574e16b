"""Typed env-var flag registry.

Reference: CK's ``utility/env.hpp:106-127`` — ``CK_DECLARE_ENV_VAR_BOOL``
registry used for runtime debug toggles like ``CK_LOGGING``
(``host_utility/kernel_launch.hpp:23-35``).
"""

from __future__ import annotations

import os

_REGISTRY: dict[str, tuple[type, object]] = {}


def declare(name: str, typ: type = bool, default=False):
    _REGISTRY[name] = (typ, default)
    return name


def get(name: str):
    typ, default = _REGISTRY[name]
    raw = os.environ.get(name)
    if raw is None:
        return default
    if typ is bool:
        return raw.strip().lower() in ("1", "true", "yes", "on")
    return typ(raw)


# Runtime flags (CKT_ prefix, analog of CK_LOGGING etc.)
CKT_LOGGING = declare("CKT_LOGGING", bool, False)
CKT_INTERPRET = declare("CKT_INTERPRET", bool, False)  # force pallas interpret mode
CKT_DISABLE_AUTOTUNE = declare("CKT_DISABLE_AUTOTUNE", bool, False)
CKT_TUNE_CACHE = declare("CKT_TUNE_CACHE", str, "")


def log(msg: str):
    if get("CKT_LOGGING"):
        print(f"[ckt] {msg}", flush=True)
