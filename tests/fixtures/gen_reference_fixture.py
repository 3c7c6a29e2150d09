"""One-time generator for ``reference_golden.npz``: runs the REFERENCE
decoder (``/root/reference/src/sea_ingest/seamf.py``) on the six golden
``example_v*.sigmf`` files and dumps every trace table's values, axes and
key levels, so ``test_sigmf_decode.py`` can diff this engine's decode
cell-for-cell against reference-produced numbers (SURVEY §5 — the one
parity check shape/axis invariants can't give).

The reference's third-party deps (msgspec / frozendict / methodtools) are
not installed in this container, so minimal in-process shims are injected
into ``sys.modules`` first; the reference package ``__init__`` (which pulls
dask via ziparchive) is bypassed by registering a bare package spec and
importing only ``sea_ingest.util`` / ``.schemas`` / ``.seamf``.

Run:  python tests/fixtures/gen_reference_fixture.py
"""

from __future__ import annotations

import functools
import json as _stdjson
import sys
import types
import typing

import numpy as np

OUT = "tests/fixtures/reference_golden.npz"
DATA = "/root/reference/demos/data"
SRC = "/root/reference/src"
TZ = "America/New_York"  # pin: removes tz-inference differences from the diff


# ---------------------------------------------------------------------------
# shims
# ---------------------------------------------------------------------------

def _install_shims() -> None:
    # frozendict: immutable-enough dict (hashable, blocks mutation)
    fz = types.ModuleType("frozendict")

    class frozendict(dict):
        def __hash__(self):
            return hash(tuple(sorted(self.items(), key=repr)))

        def _blocked(self, *a, **k):
            raise TypeError("frozendict is immutable")

        __setitem__ = __delitem__ = _blocked
        update = pop = popitem = clear = setdefault = _blocked

    fz.frozendict = frozendict
    sys.modules["frozendict"] = fz

    # methodtools: lru_cache usable on methods (instances are hashable)
    mt = types.ModuleType("methodtools")
    mt.lru_cache = lambda *a, **k: functools.lru_cache(maxsize=None)
    sys.modules["methodtools"] = mt

    # msgspec: just enough typed-JSON decoding for sea_ingest.schemas —
    # Struct subclasses with (kw_only, frozen, rename, tag) class kwargs,
    # msgspec.field(name=...), Union / Optional / Tuple annotations, and
    # json.decode(raw, type=cls, dec_hook=...)
    ms = types.ModuleType("msgspec")
    MISSING = object()

    class _Field:
        def __init__(self, name=None, default=MISSING):
            self.name, self.default = name, default

    class Struct:
        def __init_subclass__(cls, kw_only=False, frozen=False, rename=None,
                              tag=None, tag_field=None, **kw):
            super().__init_subclass__()
            if rename is not None:
                cls.__shim_rename__ = rename
            if tag is not None:
                cls.__shim_tag__ = tag
                cls.__shim_tag_field__ = tag_field or "type"

    def _fields(cls):
        out: dict = {}
        for k in reversed(cls.__mro__):
            out.update(getattr(k, "__annotations__", {}) or {})
        return out

    def _convert(tp, v, dec_hook):
        origin = typing.get_origin(tp)
        if tp is typing.Any or tp is None or tp is type(None):
            return v
        if origin is typing.Union:
            arms = typing.get_args(tp)
            if v is None and type(None) in arms:
                return None
            last_err = None
            for arm in arms:
                if arm is type(None):
                    continue
                try:
                    return _convert(arm, v, dec_hook)
                except Exception as e:  # try next arm, msgspec-style
                    last_err = e
            raise last_err or TypeError(f"no union arm matched {tp}")
        if origin is tuple:
            args = typing.get_args(tp)
            elem = args[0] if args else typing.Any
            return tuple(_convert(elem, x, dec_hook) for x in v)
        if isinstance(tp, type) and issubclass(tp, Struct):
            if not isinstance(v, dict):
                raise TypeError(f"{tp.__name__} needs an object")
            tag = getattr(tp, "__shim_tag__", None)
            if tag is not None and v.get(tp.__shim_tag_field__) != tag:
                raise TypeError("tag mismatch")
            rename = getattr(tp, "__shim_rename__", None) or {}
            inst = tp.__new__(tp)
            for name, ftp in _fields(tp).items():
                default = getattr(tp, name, MISSING)
                key = rename.get(name, name)
                if isinstance(default, _Field):
                    key = default.name or key
                    default = default.default
                if key in v:
                    val = _convert(ftp, v[key], dec_hook)
                elif default is MISSING:
                    raise TypeError(f"{tp.__name__}: missing field {name!r}")
                else:
                    val = default
                object.__setattr__(inst, name, val)
            return inst
        if tp in (str, bool, int, dict, list):
            if not isinstance(v, tp):
                raise TypeError(f"expected {tp}, got {type(v)}")
            return v
        if tp is float:
            if not isinstance(v, (int, float)) or isinstance(v, bool):
                raise TypeError("expected number")
            return float(v)
        if dec_hook is not None:
            return dec_hook(tp, v)
        raise TypeError(f"unsupported type {tp}")

    jsonmod = types.ModuleType("msgspec.json")

    def decode(raw, *, type=None, dec_hook=None):  # noqa: A002
        obj = _stdjson.loads(raw)
        return obj if type is None else _convert(type, obj, dec_hook)

    jsonmod.decode = decode
    ms.Struct = Struct
    ms.field = lambda *, name=None, default=MISSING: _Field(name, default)
    ms.json = jsonmod
    sys.modules["msgspec"] = ms
    sys.modules["msgspec.json"] = jsonmod


def _import_reference_seamf():
    pkg = types.ModuleType("sea_ingest")
    pkg.__path__ = [f"{SRC}/sea_ingest"]  # bare pkg: skip __init__ (dask)
    sys.modules["sea_ingest"] = pkg
    import importlib
    return importlib.import_module("sea_ingest.seamf")


# ---------------------------------------------------------------------------
# dump
# ---------------------------------------------------------------------------

def main() -> None:
    _install_shims()
    seamf = _import_reference_seamf()
    arrays: dict[str, np.ndarray] = {}
    for v in range(1, 7):
        out = seamf.read_seamf(f"{DATA}/example_v{v}.sigmf", tz=TZ)
        for name, obj in out.items():
            kb = f"v{v}__{name}"
            if not hasattr(obj, "index"):  # dicts (sensor_metadata etc.)
                continue
            if name in ("channel_metadata", "sweep_metadata"):
                continue  # parity covered by decode invariants tests
            import pandas as pd  # noqa: F401
            df = obj
            arrays[f"{kb}__values"] = df.to_numpy(dtype=np.float32)
            arrays[f"{kb}__columns"] = np.asarray(df.columns, dtype=np.float64)
            idx = df.index
            levels = idx.names if hasattr(idx, "names") else [idx.name]
            arrays[f"{kb}__levels"] = np.asarray(
                [str(x) for x in levels], dtype=object)
            for li, lname in enumerate(levels):
                vals = idx.get_level_values(li)
                if str(vals.dtype).startswith("datetime64"):
                    a = vals.tz_localize(None).asi8 \
                        if getattr(vals, "tz", None) is not None else vals.asi8
                    arrays[f"{kb}__idx{li}"] = np.asarray(a, dtype=np.int64)
                elif vals.dtype.kind in "if":
                    arrays[f"{kb}__idx{li}"] = np.asarray(vals, dtype=np.float64)
                else:
                    arrays[f"{kb}__idx{li}"] = np.asarray(
                        [str(x) for x in vals], dtype=object)
        print(f"v{v}: dumped {[k for k in out if f'v{v}__{k}__values' in arrays]}")
    np.savez_compressed(OUT, **arrays)
    print(f"wrote {OUT}: {len(arrays)} arrays")


if __name__ == "__main__":
    main()
