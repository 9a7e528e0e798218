"""AOT executable cache: persist *compiled* fused-solve programs.

JAX's persistent compilation cache (enabled in __init__) removes the XLA
compile from a fresh process, but the trace+lower of a deep fused V-cycle
still costs seconds. This layer pickles the serialized executable itself
(`jax.experimental.serialize_executable`), keyed by

  - the level-shape signature (every device-state leaf's path/shape/dtype
    — level sizes, color counts, kernel layouts all land here),
  - the solver-config fingerprint,
  - jax version + backend + device kind,
  - a source salt over amgx_tpu's .py files (a code edit invalidates
    everything — a stale executable would silently compute old math).

Reference analog: AMGX's ~1 ms setup means a time-stepping run restarting
its process pays nothing; this is the TPU-native equivalent
(README.md:109-112).
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile
from typing import Any, Optional

import jax

_SRC_SALT: Optional[str] = None


def cache_dir() -> Optional[str]:
    flag = os.environ.get("AMGX_TPU_COMPILE_CACHE", "1").lower()
    if flag in ("0", "off", "false"):
        return None
    d = os.environ.get(
        "AMGX_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "amgx_tpu", "xla"))
    try:
        os.makedirs(d, exist_ok=True)
        return d
    except OSError:
        return None


def _source_salt() -> str:
    global _SRC_SALT
    if _SRC_SALT is None:
        h = hashlib.sha256()
        pkg = os.path.dirname(os.path.abspath(__file__))
        for root, _, files in sorted(os.walk(pkg)):
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    st = os.stat(p)
                    h.update(f"{p}:{st.st_mtime_ns}:{st.st_size};"
                             .encode())
        _SRC_SALT = h.hexdigest()[:16]
    return _SRC_SALT


def signature(*parts: Any) -> str:
    d = jax.devices()[0]
    ident = (jax.__version__, d.platform,
             getattr(d, "device_kind", str(d)), _source_salt(), parts)
    return hashlib.sha256(repr(ident).encode()).hexdigest()[:32]


def abstract_sig(tree: Any) -> str:
    """Stable string of a pytree's structure + leaf shapes/dtypes."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    parts = [str(treedef)]
    for leaf in leaves:
        parts.append(f"{getattr(leaf, 'shape', ())}/"
                     f"{getattr(leaf, 'dtype', type(leaf).__name__)}")
    return "|".join(parts)


def load(key: str):
    """Return a loaded Compiled for `key`, or None."""
    d = cache_dir()
    if d is None:
        return None
    path = os.path.join(d, f"aot-{key}.pkl")
    if not os.path.exists(path):
        return None
    try:
        from jax.experimental import serialize_executable as se
        with open(path, "rb") as f:
            payload, in_tree, out_tree = pickle.load(f)
        return se.deserialize_and_load(payload, in_tree, out_tree)
    except Exception:                     # noqa: BLE001 — cache is advisory
        try:
            os.unlink(path)
        except OSError:
            pass
        return None


def store(key: str, compiled) -> None:
    d = cache_dir()
    if d is None:
        return
    try:
        from jax.experimental import serialize_executable as se
        payload, in_tree, out_tree = se.serialize(compiled)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        os.replace(tmp, os.path.join(d, f"aot-{key}.pkl"))
    except Exception:                     # noqa: BLE001 — cache is advisory
        pass


def load_or_compile(key: str, fn, *example_args):
    """AOT-load `fn` compiled for `example_args`, else trace+compile and
    persist. Returns a callable Compiled."""
    compiled = load(key)
    if compiled is None:
        compiled = jax.jit(fn).trace(*example_args).lower().compile()
        store(key, compiled)
    return compiled
