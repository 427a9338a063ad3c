"""VARIANT (JSON) scalar functions.

Reference: the jsonb-backed variant function family
(src/query/functions/src/scalars/variant.rs): parse_json, get (`->`),
get_string (`->>`), json_typeof, json_array_length, etc. Values are
canonical JSON text in StringData payloads (host-side; never on device).
"""

from __future__ import annotations

import json

import numpy as np

from ...errors import BadDataValueType, SemanticError
from ...types import Int64, String, Variant, VariantType
from ..column import StringData
from .registry import scalar_function


def _texts(payload):
    if isinstance(payload, StringData):
        return payload.to_pylist()
    from ..column import Column as _Col
    if isinstance(payload, tuple) and len(payload) == 2 \
            and isinstance(payload[1], _Col):
        # typed ARRAY column (CSR: offsets + values): rebuild rows as JSON
        offs = np.asarray(payload[0])
        vals = payload[1].to_pylist()
        return [json.dumps(vals[offs[i]:offs[i + 1]], default=str, separators=(",", ":"))
                for i in range(len(offs) - 1)]
    if isinstance(payload, np.ndarray) and payload.dtype == object:
        return [json.dumps(v, default=str, separators=(",", ":"))
                if isinstance(v, (list, tuple, dict)) else str(v)
                for v in payload]
    return [str(v) for v in payload.tolist()]


def _variant_resolver(name, n, ret):
    def resolve(arg_types):
        if len(arg_types) != n:
            raise SemanticError(f"{name} expects {n} args")
        return ret.wrap_nullable()
    return resolve


@scalar_function("parse_json", _variant_resolver("parse_json", 1, Variant),
                 null_policy="custom")
def _parse_json(payloads, validities, arg_types, n_rows):
    texts = _texts(payloads[0])
    v0 = validities[0]
    out, valid = [], np.ones(n_rows, np.bool_)
    for i, t in enumerate(texts):
        if t is None or (v0 is not None and not v0[i]):
            out.append("")
            valid[i] = False
            continue
        try:
            out.append(json.dumps(json.loads(t), separators=(",", ":")))
        except (ValueError, TypeError):
            raise BadDataValueType(f"parse_json: invalid JSON {t[:60]!r}")
    return StringData.from_pylist(out), (None if valid.all() else valid)


@scalar_function("try_parse_json",
                 _variant_resolver("try_parse_json", 1, Variant),
                 null_policy="custom")
def _try_parse_json(payloads, validities, arg_types, n_rows):
    texts = _texts(payloads[0])
    v0 = validities[0]
    out, valid = [], np.ones(n_rows, np.bool_)
    for i, t in enumerate(texts):
        ok = t is not None and (v0 is None or v0[i])
        if ok:
            try:
                out.append(json.dumps(json.loads(t), separators=(",", ":")))
                continue
            except (ValueError, TypeError):
                pass
        out.append("")
        valid[i] = False
    return StringData.from_pylist(out), (None if valid.all() else valid)


def _get_impl(payloads, validities, n_rows, as_text: bool):
    docs = _texts(payloads[0])
    keys = payloads[1]
    key_list = (_texts(keys) if isinstance(keys, StringData)
                else keys.tolist())
    v0, v1 = validities
    out, valid = [], np.ones(n_rows, np.bool_)
    for i in range(n_rows):
        if (v0 is not None and not v0[i]) or (v1 is not None and not v1[i]):
            out.append("")
            valid[i] = False
            continue
        try:
            doc = json.loads(docs[i])
        except (ValueError, TypeError):
            out.append("")
            valid[i] = False
            continue
        k = key_list[i]
        val = None
        if isinstance(doc, dict) and isinstance(k, str):
            val = doc.get(k)
            found = k in doc
        elif isinstance(doc, list) and not isinstance(k, str):
            ki = int(k)
            found = -len(doc) <= ki < len(doc)
            val = doc[ki] if found else None
        else:
            found = False
        if not found:
            out.append("")
            valid[i] = False
            continue
        if as_text:
            out.append(val if isinstance(val, str) else json.dumps(val, separators=(",", ":")))
        else:
            out.append(json.dumps(val, separators=(",", ":")))
    return StringData.from_pylist(out), (None if valid.all() else valid)


@scalar_function("json_get", _variant_resolver("json_get", 2, Variant),
                 null_policy="custom", aliases=["get"])
def _json_get(payloads, validities, arg_types, n_rows):
    return _get_impl(payloads, validities, n_rows, as_text=False)


@scalar_function("json_get_text",
                 _variant_resolver("json_get_text", 2, String),
                 null_policy="custom", aliases=["get_string"])
def _json_get_text(payloads, validities, arg_types, n_rows):
    return _get_impl(payloads, validities, n_rows, as_text=True)


@scalar_function("json_typeof", _variant_resolver("json_typeof", 1, String),
                 null_policy="custom")
def _json_typeof(payloads, validities, arg_types, n_rows):
    texts = _texts(payloads[0])
    v0 = validities[0]
    names = {dict: "object", list: "array", str: "string", bool: "boolean",
             int: "number", float: "number", type(None): "null"}
    out, valid = [], np.ones(n_rows, np.bool_)
    for i, t in enumerate(texts):
        if t is None or (v0 is not None and not v0[i]):
            out.append("")
            valid[i] = False
            continue
        try:
            out.append(names[type(json.loads(t))])
        except (ValueError, TypeError, KeyError):
            out.append("")
            valid[i] = False
    return StringData.from_pylist(out), (None if valid.all() else valid)


@scalar_function("json_array_length",
                 _variant_resolver("json_array_length", 1, Int64),
                 null_policy="custom")
def _json_array_length(payloads, validities, arg_types, n_rows):
    texts = _texts(payloads[0])
    v0 = validities[0]
    out = np.zeros(n_rows, np.int64)
    valid = np.ones(n_rows, np.bool_)
    for i, t in enumerate(texts):
        ok = t is not None and (v0 is None or v0[i])
        doc = None
        if ok:
            try:
                doc = json.loads(t)
            except (ValueError, TypeError):
                doc = None
        if isinstance(doc, list):
            out[i] = len(doc)
        else:
            valid[i] = False
    return out, (None if valid.all() else valid)
