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
- ``CDLTransform`` (slope / offset / power / saturation)
- ``LogTransform`` / ``LogAffineTransform`` / ``LogCameraTransform``
  (the camera-log family: lin-side affine + log-side affine, with the
  linear segment below linSideBreak)
- ``GroupTransform`` (children applied in order)
- ``ColorSpaceTransform`` (src -> dst through the reference)
- ``BuiltinTransform`` for the common named styles, resolved through
  the built-in spaces of io/colour.py where a mapping is known
- ``FileTransform`` LUT files: .cube (1D and 3D), .spi1d, .spi3d -
  resolved against the config's ``search_path``; 1D inverse via the
  monotone table, 3D forward-only (trilinear)

Unsupported kinds raise a specific error naming the colour space, so
the failure mode is loud and actionable rather than a silent
fallback.

Conversion model (OCIO v1 and v2 dialects): every colour space
declares ``to_reference``/``from_reference`` (v1) or
``to_scene_reference``/``from_scene_reference`` (v2) - one of the two
suffices, the other is the inverse. ``roles:`` and ``aliases`` are
resolved to canonical names.
"""

from __future__ import annotations

import math
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


_CDL_LUMA = np.asarray([0.2126, 0.7152, 0.0722], np.float32)


def _saturate(a: np.ndarray, sat: float) -> np.ndarray:
    luma = (a[..., :3] * _CDL_LUMA).sum(axis=-1, keepdims=True)
    return (luma + sat * (a - luma)).astype(np.float32)


def _cdl_fn(spec: dict, invert: bool) -> _F:
    sl = np.asarray(spec.get("slope", [1, 1, 1]), np.float32)
    of = np.asarray(spec.get("offset", [0, 0, 0]), np.float32)
    pw = np.asarray(spec.get("power", [1, 1, 1]), np.float32)
    sat = float(spec.get("sat", spec.get("saturation", 1.0)))
    if invert:
        def f(a):
            # ASC CDL inverse: un-saturate (Rec709 luma weights per
            # the CDL spec), then invert power / offset / slope
            if sat != 1.0:
                a = _saturate(a, 1.0 / sat)
            return ((np.clip(a, 0, None) ** (1.0 / pw) - of)
                    / sl).astype(np.float32)
        return f

    def f(a):
        out = (np.clip(a * sl + of, 0, None) ** pw).astype(np.float32)
        return _saturate(out, sat) if sat != 1.0 else out
    return f


def _log_affine_params(spec: dict):
    base = float(spec.get("base", 2.0))
    ls = np.asarray(spec.get("log_side_slope",
                             spec.get("logSideSlope", [1, 1, 1])),
                    np.float32)[:3]
    lo = np.asarray(spec.get("log_side_offset",
                             spec.get("logSideOffset", [0, 0, 0])),
                    np.float32)[:3]
    ns = np.asarray(spec.get("lin_side_slope",
                             spec.get("linSideSlope", [1, 1, 1])),
                    np.float32)[:3]
    no = np.asarray(spec.get("lin_side_offset",
                             spec.get("linSideOffset", [0, 0, 0])),
                    np.float32)[:3]
    return base, ls, lo, ns, no


def _log_affine_fn(spec: dict, invert: bool) -> _F:
    """LogAffineTransform: log = logSideSlope * log_base(linSideSlope
    * lin + linSideOffset) + logSideOffset (OCIO v2)."""
    base, ls, lo, ns, no = _log_affine_params(spec)
    lb = math.log(base)

    def lin_to_log(a):
        lin = np.maximum(a * ns + no, 1e-10)
        return (ls * (np.log(lin) / lb) + lo).astype(np.float32)

    def log_to_lin(a):
        return ((base ** ((a - lo) / ls) - no) / ns).astype(np.float32)

    # to_reference direction of a log space is log->lin ("forward"
    # per OCIO applies lin->log)
    return log_to_lin if invert else lin_to_log


def _log_camera_fn(spec: dict, invert: bool) -> _F:
    """LogCameraTransform: LogAffine plus a linear segment below
    linSideBreak with slope/intercept continuous at the break (the
    camera-log family: LogC, S-Log, etc., OCIO v2)."""
    base, ls, lo, ns, no = _log_affine_params(spec)
    lb = math.log(base)
    br = np.asarray(spec.get("lin_side_break",
                             spec.get("linSideBreak", [0, 0, 0])),
                    np.float32)[:3]
    # log value and derivative at the break
    log_br = ls * (np.log(np.maximum(ns * br + no, 1e-10)) / lb) + lo
    lslope = spec.get("linear_slope", spec.get("linearSlope"))
    if lslope is None:
        # continuous derivative at the break
        lin_slope = ls * ns / ((ns * br + no) * lb)
    else:
        lin_slope = np.asarray(lslope, np.float32)[:3] * np.ones(
            3, np.float32)
    lin_off = log_br - lin_slope * br

    def lin_to_log(a):
        lin = np.maximum(a * ns + no, 1e-10)
        logv = ls * (np.log(lin) / lb) + lo
        return np.where(a <= br, lin_slope * a + lin_off,
                        logv).astype(np.float32)

    def log_to_lin(a):
        lin = (base ** ((a - lo) / ls) - no) / ns
        seg = (a - lin_off) / lin_slope
        return np.where(a <= log_br, seg, lin).astype(np.float32)

    return log_to_lin if invert else lin_to_log


# BuiltinTransform styles -> (decode-to-linear-rec709-ish handled via
# io/colour.py built-in space names)
_BUILTIN_STYLES = {
    "UTILITY - sRGB - TEXTURE": "sRGB",
    "SRGB - TEXTURE": "sRGB",
    "DISPLAY - SRGB": "sRGB",
    "CURVE - SRGB": "sRGB",
}


def _read_lut_file(path: str):
    """Parse a LUT file into ``("1d", domain, (N, C) table)`` or
    ``("3d", domain, (N, N, N, 3) table)``. Supports .cube
    (LUT_1D_SIZE / LUT_3D_SIZE, DOMAIN_MIN/MAX; red fastest),
    .spi1d (From/Length/Components) and .spi3d (SPILUT; explicit
    i j k indices)."""
    ext = os.path.splitext(path)[1].lower()
    with open(path) as f:
        lines = [ln.strip() for ln in f.readlines()]
    lines = [ln for ln in lines if ln and not ln.startswith("#")]
    if ext == ".cube":
        n1 = n3 = 0
        dmin = np.zeros(3, np.float32)
        dmax = np.ones(3, np.float32)
        rows = []
        for ln in lines:
            u = ln.split()
            key = u[0].upper()
            if key == "LUT_1D_SIZE":
                n1 = int(u[1])
            elif key == "LUT_3D_SIZE":
                n3 = int(u[1])
            elif key == "DOMAIN_MIN":
                dmin = np.asarray([float(v) for v in u[1:4]],
                                  np.float32)
            elif key == "DOMAIN_MAX":
                dmax = np.asarray([float(v) for v in u[1:4]],
                                  np.float32)
            elif key in ("TITLE", "LUT_1D_INPUT_RANGE",
                         "LUT_3D_INPUT_RANGE"):
                if key.endswith("INPUT_RANGE"):
                    dmin = np.full(3, float(u[1]), np.float32)
                    dmax = np.full(3, float(u[2]), np.float32)
            else:
                rows.append([float(v) for v in u[:3]])
        tbl = np.asarray(rows, np.float32)
        if n3:
            if tbl.shape[0] != n3 ** 3:
                raise OcioError(f"{path}: expected {n3 ** 3} rows")
            # .cube stores red fastest: index order (b, g, r)
            return ("3d", (dmin, dmax),
                    tbl.reshape(n3, n3, n3, 3))
        if not n1:
            raise OcioError(f"{path}: no LUT_1D_SIZE/LUT_3D_SIZE")
        if tbl.shape[0] != n1:
            raise OcioError(f"{path}: expected {n1} rows")
        return ("1d", (dmin, dmax), tbl)
    if ext == ".spi1d":
        dmin = np.zeros(3, np.float32)
        dmax = np.ones(3, np.float32)
        rows = []
        in_body = False
        for ln in lines:
            low = ln.lower()
            if low.startswith("from:"):
                a, b = ln.split()[1:3]
                dmin = np.full(3, float(a), np.float32)
                dmax = np.full(3, float(b), np.float32)
            elif ln == "{":
                in_body = True
            elif ln == "}":
                in_body = False
            elif in_body:
                rows.append([float(v) for v in ln.split()])
        tbl = np.asarray(rows, np.float32)
        return ("1d", (dmin, dmax), tbl)
    if ext == ".spi3d":
        dims = None
        entries = []
        for ln in lines[1:]:  # skip "SPILUT 1.0"
            u = ln.split()
            if len(u) == 2:
                continue  # "3 3" components line
            if len(u) == 3 and dims is None:
                dims = (int(u[0]), int(u[1]), int(u[2]))
                continue
            if len(u) >= 6:
                entries.append([float(v) for v in u[:6]])
        if dims is None:
            raise OcioError(f"{path}: no dimensions line")
        tbl = np.zeros(dims + (3,), np.float32)
        for i, j, k, r, g, b in entries:
            tbl[int(i), int(j), int(k)] = (r, g, b)
        dmin = np.zeros(3, np.float32)
        dmax = np.ones(3, np.float32)
        # spi3d stores blue fastest with (r, g, b) indices: transpose
        # to the .cube convention (b, g, r) used by _lut3d_fn
        return ("3d", (dmin, dmax), tbl.transpose(2, 1, 0, 3))
    raise OcioError(f"{path}: unsupported LUT format {ext!r}")


def _lut1d_fn(domain, tbl: np.ndarray, invert: bool) -> _F:
    dmin, dmax = domain
    n, c = tbl.shape

    def fwd(a):
        out = np.empty_like(a, np.float32)
        for ch in range(a.shape[-1] if a.ndim else 1):
            col = tbl[:, min(ch, c - 1)]
            x = np.linspace(dmin[min(ch, 2)], dmax[min(ch, 2)], n)
            out[..., ch] = np.interp(a[..., ch], x, col)
        return out

    def inv(a):
        out = np.empty_like(a, np.float32)
        for ch in range(a.shape[-1] if a.ndim else 1):
            col = tbl[:, min(ch, c - 1)]
            x = np.linspace(dmin[min(ch, 2)], dmax[min(ch, 2)], n)
            if not (np.all(np.diff(col) >= 0)):
                raise OcioError("inverse Lut1D needs a monotonically "
                                "increasing table")
            out[..., ch] = np.interp(a[..., ch], col, x)
        return out

    return inv if invert else fwd


def _lut3d_fn(domain, tbl: np.ndarray, invert: bool) -> _F:
    if invert:
        raise OcioError("inverse Lut3D is not supported by the "
                        "built-in OCIO subset")
    dmin, dmax = domain
    n = tbl.shape[0]

    def f(a):
        rgb = np.asarray(a, np.float32)
        t = (rgb - dmin) / np.maximum(dmax - dmin, 1e-20) * (n - 1)
        t = np.clip(t, 0.0, n - 1)
        i0 = np.minimum(t.astype(np.int32), n - 2)
        fr = t - i0
        r0, g0, b0 = i0[..., 0], i0[..., 1], i0[..., 2]
        fr_r = fr[..., 0:1]
        fr_g = fr[..., 1:2]
        fr_b = fr[..., 2:3]
        # table index order (b, g, r): trilinear blend
        out = np.zeros(rgb.shape, np.float32)
        for db in (0, 1):
            for dg in (0, 1):
                for dr in (0, 1):
                    w = ((fr_b if db else 1.0 - fr_b)
                         * (fr_g if dg else 1.0 - fr_g)
                         * (fr_r if dr else 1.0 - fr_r))
                    out += w * tbl[b0 + db, g0 + dg, r0 + dr]
        return out

    return f


class OcioConfig:
    """Parsed subset of an OCIO YAML config."""

    def __init__(self, doc: dict, path: str = "<config>"):
        self.path = path
        base = os.path.dirname(os.path.abspath(path))
        sp = doc.get("search_path") or "."
        if isinstance(sp, str):
            sp = sp.split(":")
        self.search_dirs = [os.path.join(base, str(p)) for p in sp]
        self.search_dirs.append(base)
        self._luts: Dict[str, tuple] = {}
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
        if kind == "LogAffineTransform":
            return _log_affine_fn(body, inv)
        if kind == "LogCameraTransform":
            return _log_camera_fn(body, inv)
        if kind == "LogTransform":
            base = float(body.get("base", 2.0))
            return _log_affine_fn({"base": base}, inv)
        if kind == "ColorSpaceTransform":
            src = self.resolve(str(body.get("src", "")))
            dst = self.resolve(str(body.get("dst", "")))
            if src is None or dst is None:
                raise OcioError(f"{name}: ColorSpaceTransform with "
                                f"unknown spaces {body!r}")
            if inv:
                src, dst = dst, src
            return lambda a: self.apply(a, src, dst)
        if kind == "FileTransform":
            fname = str(body.get("src", ""))
            lut = self._luts.get(fname)
            if lut is None:
                for d in self.search_dirs:
                    cand = os.path.join(d, fname)
                    if os.path.exists(cand):
                        lut = self._luts[fname] = _read_lut_file(cand)
                        break
                else:
                    raise OcioError(f"{name}: LUT file {fname!r} not "
                                    f"found under {self.search_dirs}")
            kind_l, domain, tbl = lut
            if kind_l == "1d":
                return _lut1d_fn(domain, tbl, inv)
            return _lut3d_fn(domain, tbl, inv)
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
            "built-in OCIO subset")

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
