"""Versioned binary serialization + mid-run checkpointing.

Equivalent of the reference's Serialization/ (BinarySerializer.h:17-50:
versioned binary container formats for frames/calibration) and an upgrade
over its checkpoint story: the reference has NO mid-run checkpointing
(SURVEY.md §5 — only the final Fossilize snapshot); here the whole engine
state is flat arrays, so checkpoint/resume is a single npz round trip.
"""

from __future__ import annotations

import json
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

FORMAT_VERSION = 2  # v2 (r4): MapState gained mp_octave / mp_max_dist;
#                     loading older checkpoints fills template defaults


def _flatten_named(prefix: str, obj: Any, out: dict):
    """NamedTuple pytree -> flat {path: array} dict."""
    if hasattr(obj, "_fields"):
        for name in obj._fields:
            _flatten_named(f"{prefix}{name}/", getattr(obj, name), out)
    else:
        out[prefix.rstrip("/")] = np.asarray(obj)


def _unflatten_named(template: Any, prefix: str, data) -> Any:
    if hasattr(template, "_fields"):
        vals = {}
        for name in template._fields:
            vals[name] = _unflatten_named(getattr(template, name),
                                          f"{prefix}{name}/", data)
        return type(template)(**vals)
    key = prefix.rstrip("/")
    t = jnp.asarray(template)
    if key not in getattr(data, "files", data):
        # field added in a newer FORMAT_VERSION: old checkpoints load
        # with the template's default (e.g. mp_octave=0 / mp_max_dist=0
        # which downstream treats as "no scale info")
        return t
    arr = data[key]
    if str(t.dtype).startswith("key"):
        # PRNG keys round-trip through key_data
        return jax.random.wrap_key_data(jnp.asarray(arr))
    return jnp.asarray(arr, t.dtype)


def save_state(path: str, state: Any, metadata: dict | None = None):
    """Save any NamedTuple pytree of arrays (MapState, EngineState, ...)."""
    flat: dict = {}
    st = state
    if hasattr(st, "key"):
        st = st._replace(key=jax.random.key_data(st.key))
    _flatten_named("", st, flat)
    meta = {"format_version": FORMAT_VERSION,
            "type": type(state).__name__}
    if metadata:
        meta.update(metadata)
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **flat)


def load_state(path: str, template: Any) -> Any:
    """Load into the shape/dtype structure of `template`."""
    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode())
    if meta["format_version"] > FORMAT_VERSION:
        raise ValueError(
            f"checkpoint format {meta['format_version']} is newer than "
            f"supported {FORMAT_VERSION}")
    tpl = template
    if hasattr(tpl, "key"):
        tpl = tpl._replace(key=jax.random.key_data(tpl.key))
    out = _unflatten_named(tpl, "", data)
    if hasattr(template, "key"):
        out = out._replace(key=jax.random.wrap_key_data(
            jnp.asarray(data["key"])))
    return out
