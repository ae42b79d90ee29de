"""Scene description parsing.

Replaces the reference's JSON import stack (`/root/reference/src/base/import/
{node_desc,parameter_set,json_util}.h`): JSONC (``//`` comments allowed, as
the reference scene files use them) -> plain dicts, plus ParameterSet-style
typed access with defaults and the ShaderNode slot schema
(`node_desc.h:146-231`): a slot is either a raw number/array (constant), or
``{"channels": swizzle, "node": <constant | {type, param}>}``.
"""
from __future__ import annotations

import json
import re


def _strip_jsonc(text):
    """Remove // line comments (outside strings) and trailing commas."""
    out = []
    in_str = False
    esc = False
    i = 0
    n = len(text)
    while i < n:
        c = text[i]
        if in_str:
            out.append(c)
            if esc:
                esc = False
            elif c == "\\":
                esc = True
            elif c == '"':
                in_str = False
            i += 1
            continue
        if c == '"':
            in_str = True
            out.append(c)
            i += 1
            continue
        if c == "/" and i + 1 < n and text[i + 1] == "/":
            while i < n and text[i] != "\n":
                i += 1
            continue
        if c == "/" and i + 1 < n and text[i + 1] == "*":
            i += 2
            while i + 1 < n and not (text[i] == "*" and text[i + 1] == "/"):
                i += 1
            i += 2
            continue
        out.append(c)
        i += 1
    s = "".join(out)
    s = re.sub(r",(\s*[}\]])", r"\1", s)  # trailing commas
    return s


def load_jsonc(path):
    with open(path, "r", encoding="utf-8", errors="ignore") as f:
        return json.loads(_strip_jsonc(f.read()))


def loads_jsonc(text):
    return json.loads(_strip_jsonc(text))


class ParameterSet:
    """Typed access with defaults over a JSON dict (parameter_set.h)."""

    def __init__(self, data):
        self.data = data if data is not None else {}

    def __contains__(self, key):
        return key in self.data

    def raw(self, key, default=None):
        return self.data.get(key, default)

    def child(self, key):
        return ParameterSet(self.data.get(key, {}))

    def as_float(self, key, default=0.0):
        v = self.data.get(key, default)
        if isinstance(v, list):
            v = v[0]
        return float(v)

    def as_int(self, key, default=0):
        v = self.data.get(key, default)
        if isinstance(v, list):
            v = v[0]
        return int(v)

    def as_bool(self, key, default=False):
        return bool(self.data.get(key, default))

    def as_str(self, key, default=""):
        return str(self.data.get(key, default))

    def as_float2(self, key, default=(0.0, 0.0)):
        v = self.data.get(key, default)
        if not isinstance(v, (list, tuple)):
            v = [v, v]
        v = list(v) + [v[-1]] * (2 - len(v))
        return [float(v[0]), float(v[1])]

    def as_float3(self, key, default=(0.0, 0.0, 0.0)):
        v = self.data.get(key, default)
        if not isinstance(v, (list, tuple)):
            v = [v, v, v]
        v = list(v) + [v[-1]] * (3 - len(v))
        return [float(v[0]), float(v[1]), float(v[2])]


def node_type(desc, default=""):
    if not isinstance(desc, dict):
        return default
    return desc.get("type", default)


def node_param(desc):
    if not isinstance(desc, dict):
        return ParameterSet({})
    return ParameterSet(desc.get("param", {}))


def parse_slot(value):
    """Normalize a ShaderNode slot description into
    (kind, payload, channels) where kind in {const, image, number, ...}.

    Accepted spellings (all appear in the reference scenes):
      3.0                              -> const scalar
      [r, g, b]                        -> const vector
      {"channels": "xyz", "node": [..]}                 -> const w/ swizzle
      {"channels": "x", "node": {"type": "number", "param": {...}}}
      {"type": "number"/"image", "param": {...}}        -> direct node
      {"fn": "x.jpg", "color_space": "srgb"}            -> implicit image node
    """
    channels = None
    node = value
    if isinstance(node, dict) and "node" in node:
        channels = node.get("channels")
        node = node["node"]
    if isinstance(node, (int, float)):
        return "const", [float(node)], channels
    if isinstance(node, list):
        return "const", [float(x) for x in node], channels
    if isinstance(node, dict):
        if "fn" in node and "type" not in node:
            return "image", node, channels
        ntype = node.get("type", "number")
        param = node.get("param", {})
        if ntype == "number":
            v = param.get("value", 0.0)
            if isinstance(v, (int, float)):
                v = [float(v)]
            return "const", [float(x) for x in v], channels
        if ntype == "image":
            return "image", param, channels
        # calculation nodes (multiply/add/...) — payload keeps sub-slots
        return ntype, param, channels
    raise ValueError(f"cannot parse slot: {value!r}")
