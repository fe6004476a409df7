"""Minimal OpenColorIO config reader.

The reference delegates arbitrary colour spaces to OIIO's OCIO
integration: when the ``$OCIO`` environment variable points at a
config, facet/output colour space names are resolved through it
(envutil_main.cc:396-437, README.md:322-399). PyOpenColorIO is not
installable in this image, so this module parses the (YAML) config
directly and implements the algebraic transform subset that covers
matrix/primaries-based configs:

- ``MatrixTransform`` (matrix + offset, with direction=inverse)
- ``ExponentTransform``
- ``ExponentWithLinearTransform`` (the sRGB-style piecewise curve)
- ``RangeTransform`` (scale + offset form)
- ``CDLTransform`` (slope / offset / power; saturation unsupported)
- ``GroupTransform`` (children applied in order)
- ``ColorSpaceTransform`` (src -> dst through the reference)
- ``BuiltinTransform`` for the common named styles, resolved through
  the built-in spaces of io/colour.py where a mapping is known

``FileTransform`` (LUT files) and ``LogCameraTransform`` raise a
specific error naming the colour space, so the failure mode is loud
and actionable rather than a silent fallback.

Conversion model (OCIO v1 and v2 dialects): every colour space
declares ``to_reference``/``from_reference`` (v1) or
``to_scene_reference``/``from_scene_reference`` (v2) - one of the two
suffices, the other is the inverse. ``roles:`` and ``aliases`` are
resolved to canonical names.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional

import numpy as np

_F = Callable[[np.ndarray], np.ndarray]


class OcioError(ValueError):
    pass


def _chain(fns: List[_F]) -> _F:
    def f(a):
        for fn in fns:
            a = fn(a)
        return a
    return f


def _matrix_fn(spec: dict, invert: bool) -> _F:
    m = np.asarray(spec.get("matrix",
                            np.eye(4).ravel().tolist()),
                   np.float64).reshape(4, 4)
    off = np.asarray(spec.get("offset", [0, 0, 0, 0]),
                     np.float64)
    m3 = m[:3, :3]
    o3 = off[:3]
    if invert:
        mi = np.linalg.inv(m3)

        def f(a):
            return ((a - o3.astype(np.float32))
                    @ mi.T.astype(np.float32)).astype(np.float32)
        return f

    def f(a):
        return (a @ m3.T.astype(np.float32)
                + o3.astype(np.float32)).astype(np.float32)
    return f


def _exponent_fn(spec: dict, invert: bool) -> _F:
    g = np.asarray(spec.get("value", [1, 1, 1, 1]),
                   np.float64)[:3].astype(np.float32)
    e = (1.0 / g) if invert else g

    def f(a):
        return np.sign(a) * np.abs(a) ** e
    return f


def _exponent_linear_fn(spec: dict, invert: bool) -> _F:
    """ExponentWithLinearTransform (monCurve): linear segment below
    the break, power above - the sRGB/rec709 curve family. The spec's
    gamma/offset define the *decoding* (encoded -> linear) when the
    style is the usual 'curve forward' (OCIO's mirrored variants are
    not distinguished here)."""
    g = float(np.asarray(spec.get("gamma", [2.4] * 4),
                         np.float64).ravel()[0])
    o = float(np.asarray(spec.get("offset", [0.0] * 4),
                         np.float64).ravel()[0])
    # monCurve per OCIO: y = (x + o)/(1 + o)) ** g for x >= break,
    # y = x * s below, with break xb = o / (g - 1),
    # s = ((g - 1) / o) * ((o * g) / ((g - 1) * (1 + o))) ** g
    if o <= 0.0:
        return _exponent_fn({"value": [g] * 4}, invert)
    xb = o / (g - 1.0)
    s = (((g - 1.0) / o)
         * ((o * g) / ((g - 1.0) * (1.0 + o))) ** g)
    yb = xb * s

    def fwd(x):
        x = np.asarray(x, np.float32)
        hi = ((np.clip(x, xb, None) + o) / (1.0 + o)) ** g
        return np.where(x < xb, x * s, hi).astype(np.float32)

    def inv(y):
        y = np.asarray(y, np.float32)
        hi = (np.clip(y, yb, None) ** (1.0 / g)) * (1.0 + o) - o
        return np.where(y < yb, y / s, hi).astype(np.float32)

    return inv if invert else fwd


def _range_fn(spec: dict, invert: bool) -> _F:
    lo_in = float(spec.get("min_in_value", 0.0))
    hi_in = float(spec.get("max_in_value", 1.0))
    lo_out = float(spec.get("min_out_value", 0.0))
    hi_out = float(spec.get("max_out_value", 1.0))
    scale = (hi_out - lo_out) / (hi_in - lo_in)
    if invert:
        def f(a):
            return ((a - lo_out) / scale + lo_in).astype(np.float32)
        return f

    def f(a):
        return ((a - lo_in) * scale + lo_out).astype(np.float32)
    return f


def _cdl_fn(spec: dict, invert: bool) -> _F:
    sl = np.asarray(spec.get("slope", [1, 1, 1]), np.float32)
    of = np.asarray(spec.get("offset", [0, 0, 0]), np.float32)
    pw = np.asarray(spec.get("power", [1, 1, 1]), np.float32)
    if float(spec.get("sat", spec.get("saturation", 1.0))) != 1.0:
        raise OcioError("CDL saturation is not supported")
    if invert:
        def f(a):
            return ((np.clip(a, 0, None) ** (1.0 / pw) - of)
                    / sl).astype(np.float32)
        return f

    def f(a):
        return (np.clip(a * sl + of, 0, None) ** pw).astype(np.float32)
    return f


# BuiltinTransform styles -> (decode-to-linear-rec709-ish handled via
# io/colour.py built-in space names)
_BUILTIN_STYLES = {
    "UTILITY - sRGB - TEXTURE": "sRGB",
    "SRGB - TEXTURE": "sRGB",
    "DISPLAY - SRGB": "sRGB",
    "CURVE - SRGB": "sRGB",
}


class OcioConfig:
    """Parsed subset of an OCIO YAML config."""

    def __init__(self, doc: dict, path: str = "<config>"):
        self.path = path
        self.roles: Dict[str, str] = {
            str(k).lower(): str(v)
            for k, v in (doc.get("roles") or {}).items()}
        self.spaces: Dict[str, dict] = {}
        self.aliases: Dict[str, str] = {}
        for cs in doc.get("colorspaces") or []:
            if isinstance(cs, dict) and "!<ColorSpace>" in cs:
                cs = cs["!<ColorSpace>"] or {}
            name = str(cs.get("name", ""))
            if not name:
                continue
            self.spaces[name] = cs
            self.aliases[name.lower()] = name
            for al in cs.get("aliases") or []:
                self.aliases[str(al).lower()] = name

    # -- name resolution ------------------------------------------
    def resolve(self, name: str) -> Optional[str]:
        if name in self.spaces:
            return name
        low = name.lower()
        if low in self.aliases:
            return self.aliases[low]
        if low in self.roles:
            return self.resolve(self.roles[low])
        return None

    # -- transform compilation ------------------------------------
    def _compile(self, spec, invert: bool, name: str) -> _F:
        if spec is None:
            return lambda a: a
        if isinstance(spec, list):
            fns = [self._compile(s, invert, name) for s in spec]
            if invert:
                fns = fns[::-1]
            return _chain(fns)
        if not isinstance(spec, dict):
            raise OcioError(f"{name}: unsupported transform {spec!r}")
        if len(spec) == 1 and next(iter(spec)).startswith("!<"):
            tag = next(iter(spec))
            body = spec[tag] or {}
            kind = tag[2:-1]
        else:
            kind = str(spec.get("transform", ""))
            body = spec
        body = dict(body)
        dir_inv = str(body.get("direction", "forward")) == "inverse"
        inv = invert != dir_inv
        if kind == "GroupTransform":
            children = body.get("children") or []
            fns = [self._compile(c, invert, name) for c in children]
            if invert:
                fns = fns[::-1]
            return _chain(fns)
        if kind == "MatrixTransform":
            return _matrix_fn(body, inv)
        if kind == "ExponentTransform":
            return _exponent_fn(body, inv)
        if kind == "ExponentWithLinearTransform":
            return _exponent_linear_fn(body, inv)
        if kind == "RangeTransform":
            return _range_fn(body, inv)
        if kind == "CDLTransform":
            return _cdl_fn(body, inv)
        if kind == "ColorSpaceTransform":
            src = self.resolve(str(body.get("src", "")))
            dst = self.resolve(str(body.get("dst", "")))
            if src is None or dst is None:
                raise OcioError(f"{name}: ColorSpaceTransform with "
                                f"unknown spaces {body!r}")
            if inv:
                src, dst = dst, src
            return lambda a: self.apply(a, src, dst)
        if kind == "BuiltinTransform":
            style = str(body.get("style", "")).upper()
            builtin = _BUILTIN_STYLES.get(style)
            if builtin is None:
                raise OcioError(
                    f"{name}: BuiltinTransform style {style!r} is not "
                    "supported by the built-in OCIO subset")
            from . import imgio
            if inv:
                return lambda a: imgio.linear_to_srgb(a)
            return lambda a: imgio.srgb_to_linear(a)
        raise OcioError(
            f"{name}: transform {kind!r} is not supported by the "
            "built-in OCIO subset (FileTransform LUTs need "
            "PyOpenColorIO)")

    def to_reference(self, name: str) -> _F:
        cs = self.spaces[name]
        spec = (cs.get("to_reference")
                or cs.get("to_scene_reference"))
        if spec is not None:
            return self._compile(spec, False, name)
        spec = (cs.get("from_reference")
                or cs.get("from_scene_reference"))
        if spec is not None:
            return self._compile(spec, True, name)
        return lambda a: a  # the reference space itself

    def from_reference(self, name: str) -> _F:
        cs = self.spaces[name]
        spec = (cs.get("from_reference")
                or cs.get("from_scene_reference"))
        if spec is not None:
            return self._compile(spec, False, name)
        spec = (cs.get("to_reference")
                or cs.get("to_scene_reference"))
        if spec is not None:
            return self._compile(spec, True, name)
        return lambda a: a

    def apply(self, arr: np.ndarray, src: str, dst: str) -> np.ndarray:
        out = np.asarray(arr, np.float32)
        if src != dst:
            out = self.to_reference(src)(out)
            out = self.from_reference(dst)(out)
        return np.asarray(out, np.float32)


def _load_yaml(text: str) -> dict:
    """PyYAML with OCIO's custom ``!<Type>`` tags mapped to
    ``{"!<Type>": value}`` wrappers (safe_load rejects unknown
    tags)."""
    import yaml

    class _Loader(yaml.SafeLoader):
        pass

    def _tagged(loader, tag_suffix, node):
        # ``!<Name>`` is YAML verbatim-tag syntax: the parsed tag is
        # the bare Name; re-wrap it in the OCIO spelling
        if isinstance(node, yaml.MappingNode):
            val = loader.construct_mapping(node, deep=True)
        elif isinstance(node, yaml.SequenceNode):
            val = loader.construct_sequence(node, deep=True)
        else:
            val = loader.construct_scalar(node)
            if val == "":
                val = {}
        tag = tag_suffix.lstrip("!")
        return {f"!<{tag}>": val}

    yaml.add_multi_constructor(None, _tagged, Loader=_Loader)
    return yaml.load(text, Loader=_Loader)


_CACHE: Dict[str, Optional[OcioConfig]] = {}


def active_config() -> Optional[OcioConfig]:
    """The config named by $OCIO, parsed once (None if unset/bad)."""
    path = os.environ.get("OCIO", "")
    if not path:
        return None
    if path not in _CACHE:
        try:
            with open(path) as f:
                doc = _load_yaml(f.read())
            _CACHE[path] = OcioConfig(doc, path)
        except Exception as e:  # bad config: remember the failure
            import sys
            print(f"warning: cannot parse OCIO config {path}: {e}",
                  file=sys.stderr)
            _CACHE[path] = None
    return _CACHE[path]


def convert(arr: np.ndarray, src: str, dst: str
            ) -> Optional[np.ndarray]:
    """Convert through the active $OCIO config; None if there is no
    config or it does not know both spaces. Raises OcioError when the
    spaces are known but use unsupported transform kinds."""
    cfg = active_config()
    if cfg is None:
        return None
    s = cfg.resolve(src)
    d = cfg.resolve(dst)
    if s is None or d is None:
        return None
    return cfg.apply(arr, s, d)
