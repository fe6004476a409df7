"""Built-in colour space conversions.

The reference delegates colour management to OpenImageIO/OCIO
(README.md:322-399: in/working/output colour spaces, default working
space scene_linear). PyOpenColorIO is optional here; this module
provides the standard RGB colour spaces self-contained so the common
conversions work everywhere: matrices are *derived* from primaries and
white points (not hard-coded), with Bradford chromatic adaptation
between white points, plus the standard transfer functions.

Space names follow OCIO/ACES conventions with the aliases the
reference's ecosystems (lux, hugin) use. A space is (primaries, white,
transfer): conversion = decode -> RGB-to-XYZ -> adapt white -> XYZ-to-
RGB -> encode.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

# chromaticities (x, y) and white points
_D65 = (0.3127, 0.3290)
_D60 = (0.32168, 0.33767)  # ACES white

_PRIMARIES = {
    "rec709": (((0.64, 0.33), (0.30, 0.60), (0.15, 0.06)), _D65),
    "rec2020": (((0.708, 0.292), (0.170, 0.797), (0.131, 0.046)), _D65),
    "p3d65": (((0.680, 0.320), (0.265, 0.690), (0.150, 0.060)), _D65),
    "ap1": (((0.713, 0.293), (0.165, 0.830), (0.128, 0.044)), _D60),
    "ap0": (((0.7347, 0.2653), (0.0, 1.0), (0.0001, -0.0770)), _D60),
}

# Bradford cone-response matrix (the standard CAT02 predecessor used
# by ICC/OCIO for white adaptation)
_BRADFORD = np.array([[0.8951, 0.2664, -0.1614],
                      [-0.7502, 1.7135, 0.0367],
                      [0.0389, -0.0685, 1.0296]])


def _xy_to_xyz(xy) -> np.ndarray:
    x, y = xy
    return np.array([x / y, 1.0, (1.0 - x - y) / y])


def rgb_to_xyz_matrix(prims, white) -> np.ndarray:
    """Derive the RGB->XYZ matrix from primaries + white (the standard
    construction: scale primary columns so white maps to the white
    point's XYZ)."""
    cols = np.stack([_xy_to_xyz(p) / _xy_to_xyz(p)[1] for p in prims],
                    axis=1)
    # solve for the per-primary scales
    s = np.linalg.solve(cols, _xy_to_xyz(white))
    return cols * s[None, :]


def bradford_adaptation(src_white, dst_white) -> np.ndarray:
    """XYZ-to-XYZ Bradford chromatic adaptation matrix."""
    sw = _BRADFORD @ _xy_to_xyz(src_white)
    dw = _BRADFORD @ _xy_to_xyz(dst_white)
    return np.linalg.inv(_BRADFORD) @ np.diag(dw / sw) @ _BRADFORD


# -- transfer functions ------------------------------------------------

def _srgb_decode(v):
    return np.where(v <= 0.04045, v / 12.92,
                    ((np.abs(v) + 0.055) / 1.055) ** 2.4 * np.sign(v))


def _srgb_encode(v):
    return np.where(v <= 0.0031308, 12.92 * v,
                    1.055 * np.clip(v, 0, None) ** (1.0 / 2.4) - 0.055)


def _g22_decode(v):
    return np.sign(v) * np.abs(v) ** 2.2


def _g22_encode(v):
    return np.sign(v) * np.abs(v) ** (1.0 / 2.2)


def _rec709_decode(v):
    # BT.709 camera OETF inverse
    return np.where(v < 0.081, v / 4.5,
                    ((np.abs(v) + 0.099) / 1.099) ** (1.0 / 0.45))


def _rec709_encode(v):
    return np.where(v < 0.018, 4.5 * v,
                    1.099 * np.clip(v, 0, None) ** 0.45 - 0.099)


_IDENT = (None, None)
_TRANSFERS = {
    "linear": _IDENT,
    "srgb": (_srgb_decode, _srgb_encode),
    "g22": (_g22_decode, _g22_encode),
    "rec709": (_rec709_decode, _rec709_encode),
}


class Space:
    def __init__(self, gamut: str, transfer: str):
        self.gamut = gamut
        self.transfer = transfer


# canonical name -> Space; aliases lower-cased
_SPACES: Dict[str, Space] = {
    "scene_linear": Space("rec709", "linear"),
    "linear": Space("rec709", "linear"),
    "lin_rec709": Space("rec709", "linear"),
    "lin_srgb": Space("rec709", "linear"),
    "srgb": Space("rec709", "srgb"),
    "srgb_texture": Space("rec709", "srgb"),
    "g22_rec709": Space("rec709", "g22"),
    "gamma2.2": Space("rec709", "g22"),
    "rec709": Space("rec709", "rec709"),
    "bt.709": Space("rec709", "rec709"),
    "lin_rec2020": Space("rec2020", "linear"),
    "lin_p3d65": Space("p3d65", "linear"),
    "lin_displayp3": Space("p3d65", "linear"),
    "acescg": Space("ap1", "linear"),
    "lin_ap1": Space("ap1", "linear"),
    "aces2065-1": Space("ap0", "linear"),
    "aces": Space("ap0", "linear"),
    "lin_ap0": Space("ap0", "linear"),
}


def find_space(name: str) -> Space | None:
    return _SPACES.get(name.strip().lower())


def known(name: str) -> bool:
    return find_space(name) is not None


def conversion_matrix(src: Space, dst: Space) -> np.ndarray:
    """Linear-RGB to linear-RGB gamut matrix (with white adaptation)."""
    sp, sw = _PRIMARIES[src.gamut]
    dp, dw = _PRIMARIES[dst.gamut]
    m = rgb_to_xyz_matrix(sp, sw)
    if sw != dw:
        m = bradford_adaptation(sw, dw) @ m
    return np.linalg.inv(rgb_to_xyz_matrix(dp, dw)) @ m


def convert(arr: np.ndarray, src_name: str, dst_name: str
            ) -> np.ndarray:
    """Convert (..., 3) float RGB between two known spaces."""
    src = find_space(src_name)
    dst = find_space(dst_name)
    if src is None or dst is None:
        raise KeyError(src_name if src is None else dst_name)
    out = np.asarray(arr, np.float32)
    dec = _TRANSFERS[src.transfer][0]
    if dec is not None:
        out = dec(out)
    if src.gamut != dst.gamut:
        m = conversion_matrix(src, dst).astype(np.float32)
        out = out @ m.T
    enc = _TRANSFERS[dst.transfer][1]
    if enc is not None:
        out = enc(out)
    return np.asarray(out, np.float32)
