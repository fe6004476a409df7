"""Built-in colour space tests (io/colour.py): matrices derived from
primaries match the published standards, round trips are exact, and
the imgio hook routes non-sRGB pairs through the built-ins."""

import numpy as np
import pytest

from envutil_tpu.io import colour as C
from envutil_tpu.io import imgio

RNG = np.random.default_rng(11)


def test_rec709_matrix_matches_bt709_spec():
    """Derived Rec.709->XYZ matrix equals the published BT.709 /
    IEC 61966 values."""
    m = C.rgb_to_xyz_matrix(*C._PRIMARIES["rec709"])
    ref = np.array([[0.4123908, 0.35758434, 0.18048079],
                    [0.21263901, 0.71516868, 0.07219232],
                    [0.01933082, 0.11919478, 0.95053215]])
    np.testing.assert_allclose(m, ref, atol=2e-4)


def test_white_maps_to_white():
    """Equal-energy white survives every gamut pair (white adaptation
    correctness)."""
    spaces = ["scene_linear", "lin_rec2020", "ACEScg", "ACES2065-1",
              "lin_p3d65"]
    w = np.ones((1, 3), np.float32)
    for a in spaces:
        for b in spaces:
            out = C.convert(w, a, b)
            np.testing.assert_allclose(out, w, atol=2e-4,
                                        err_msg=f"{a}->{b}")


@pytest.mark.parametrize("pair", [("scene_linear", "ACEScg"),
                                  ("sRGB", "lin_rec2020"),
                                  ("rec709", "gamma2.2"),
                                  ("ACES2065-1", "lin_p3d65")])
def test_round_trip(pair):
    a, b = pair
    x = RNG.uniform(0.0, 1.0, (64, 3)).astype(np.float32)
    y = C.convert(C.convert(x, a, b), b, a)
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_srgb_transfer_matches_imgio():
    x = RNG.uniform(0.0, 1.0, (32, 3)).astype(np.float32)
    np.testing.assert_allclose(C.convert(x, "sRGB", "scene_linear"),
                               imgio.srgb_to_linear(x), atol=1e-6)


def test_imgio_convert_colour_uses_builtin():
    x = RNG.uniform(0.0, 1.0, (4, 4, 3)).astype(np.float32)
    out = imgio.convert_colour(x, "ACEScg", "scene_linear")
    ref = C.convert(x, "ACEScg", "scene_linear")
    np.testing.assert_allclose(out, ref)
    # alpha passes through
    xa = np.concatenate([x, np.full((4, 4, 1), 0.7, np.float32)], -1)
    outa = imgio.convert_colour(xa, "ACEScg", "scene_linear")
    np.testing.assert_allclose(outa[..., 3], 0.7)
    np.testing.assert_allclose(outa[..., :3], ref)
    # unknown spaces still raise (OCIO absent)
    with pytest.raises(ValueError, match="OCIO"):
        imgio.convert_colour(x, "weird_cam_log", "scene_linear")


def test_acescg_to_rec709_known_value():
    """AP1 pure green is out of the 709 gamut: conversion must land on
    the documented (negative-R) linear value."""
    g = np.array([[0.0, 1.0, 0.0]], np.float32)
    out = C.convert(g, "ACEScg", "lin_rec709")
    # published ACEScg->Rec709 (Bradford D60->D65) middle column
    np.testing.assert_allclose(out[0], [-0.62179, 1.14080, -0.12897],
                               atol=2e-4)


def test_ocio_subset_config(tmp_path, monkeypatch):
    """Built-in OCIO config reader: roles/aliases resolve, matrix +
    exponent-with-linear chains apply, and the inverse direction is
    derived from the forward spec."""
    import textwrap

    import numpy as np

    from envutil_tpu.io import imgio, ocio

    cfg = tmp_path / "test.ocio"
    cfg.write_text(textwrap.dedent("""\
        ocio_profile_version: 2
        roles:
          scene_linear: lin
        colorspaces:
          - name: lin
            aliases: [linear, reference]
          - name: srgbish
            aliases: [my_srgb]
            to_scene_reference: !<ExponentWithLinearTransform>
              gamma: [2.4, 2.4, 2.4, 1]
              offset: [0.055, 0.055, 0.055, 0]
          - name: halfscale
            from_scene_reference: !<MatrixTransform>
              matrix: [0.5, 0, 0, 0,
                       0, 0.5, 0, 0,
                       0, 0, 0.5, 0,
                       0, 0, 0, 1]
          - name: wide
            to_scene_reference: !<GroupTransform>
              children:
                - !<ExponentTransform> {value: [2.2, 2.2, 2.2, 1]}
                - !<MatrixTransform>
                  matrix: [2, 0, 0, 0,
                           0, 2, 0, 0,
                           0, 0, 2, 0,
                           0, 0, 0, 1]
        """))
    monkeypatch.setenv("OCIO", str(cfg))
    ocio._CACHE.clear()

    v = np.linspace(0.01, 0.95, 33 * 3,
                    dtype=np.float32).reshape(-1, 1, 3)

    # the monCurve with gamma 2.4 / offset 0.055 IS the sRGB EOTF
    out = imgio.convert_colour(v, "my_srgb", "scene_linear")
    np.testing.assert_allclose(out, imgio.srgb_to_linear(v),
                               atol=2e-5)
    # inverse derived from the same forward spec
    back = imgio.convert_colour(out, "lin", "srgbish")
    np.testing.assert_allclose(back, v, atol=2e-5)

    # matrix space, from_reference given: lin -> halfscale halves
    out = imgio.convert_colour(v, "linear", "halfscale")
    np.testing.assert_allclose(out, v * 0.5, atol=1e-6)
    # and the to_reference direction inverts the matrix
    back = imgio.convert_colour(out, "halfscale", "lin")
    np.testing.assert_allclose(back, v, atol=1e-6)

    # group chain: decode gamma 2.2 then scale x2; srgbish -> wide
    # goes through the reference
    out = imgio.convert_colour(v, "srgbish", "wide")
    ref = (imgio.srgb_to_linear(v) / 2.0) ** (1 / 2.2)
    np.testing.assert_allclose(out, ref, atol=2e-5)

    # unknown name in the config -> None path falls through to the
    # built-in spaces (Rec709 etc.) without raising
    out = imgio.convert_colour(v, "sRGB", "scene_linear")
    np.testing.assert_allclose(out, imgio.srgb_to_linear(v),
                               atol=2e-5)


def test_ocio_file_transform_luts(tmp_path, monkeypatch):
    """FileTransform LUTs: .cube 1D (forward + monotone inverse),
    .cube 3D (trilinear), .spi1d, resolved via search_path."""
    import textwrap

    import numpy as np

    from envutil_tpu.io import imgio, ocio

    luts = tmp_path / "luts"
    luts.mkdir()
    # 1D gamma-ish LUT: y = x^2 over [0, 1], 65 knots
    n = 65
    x = np.linspace(0, 1, n)
    (luts / "sq.cube").write_text(
        "LUT_1D_SIZE 65\n"
        + "".join(f"{v:.8f} {v:.8f} {v:.8f}\n" for v in x ** 2))
    # 3D LUT: channel-wise scale (r*0.5, g*0.25, b*1.0), 9^3 lattice
    m = 9
    g = np.linspace(0, 1, m)
    rows = []
    for b in g:
        for gg in g:
            for r in g:  # red fastest
                rows.append(f"{r * 0.5:.8f} {gg * 0.25:.8f} {b:.8f}\n")
    (luts / "scale.cube").write_text(f"LUT_3D_SIZE {m}\n" + "".join(rows))
    # spi1d: y = 2x over [0, 2]
    (luts / "dbl.spi1d").write_text(
        "Version 1\nFrom: 0.0 2.0\nLength: 3\nComponents: 1\n"
        "{\n0.0\n2.0\n4.0\n}\n")

    cfg = tmp_path / "test.ocio"
    cfg.write_text(textwrap.dedent("""\
        ocio_profile_version: 2
        search_path: luts
        roles:
          scene_linear: lin
        colorspaces:
          - name: lin
          - name: squared
            to_scene_reference: !<FileTransform> {src: sq.cube}
          - name: scaled
            from_scene_reference: !<FileTransform> {src: scale.cube, interpolation: tetrahedral}
          - name: doubled
            from_scene_reference: !<FileTransform> {src: dbl.spi1d}
        """))
    monkeypatch.setenv("OCIO", str(cfg))
    ocio._CACHE.clear()

    v = np.linspace(0.05, 0.9, 24, dtype=np.float32).reshape(-1, 1, 3)

    # 1D forward: squared -> lin applies x^2 (exact at this density)
    out = imgio.convert_colour(v, "squared", "scene_linear")
    np.testing.assert_allclose(out, v ** 2, atol=2e-4)
    # 1D inverse (monotone): lin -> squared applies sqrt
    back = imgio.convert_colour(out, "lin", "squared")
    np.testing.assert_allclose(back, v, atol=2e-4)

    # 3D trilinear: lin -> scaled is exact for a linear lattice
    out = imgio.convert_colour(v, "lin", "scaled")
    np.testing.assert_allclose(
        out, v * np.asarray([0.5, 0.25, 1.0], np.float32), atol=1e-5)

    # spi1d with a [0, 2] domain
    out = imgio.convert_colour(v, "lin", "doubled")
    np.testing.assert_allclose(out, v * 2.0, atol=1e-5)


def test_ocio_log_and_cdl_sat(tmp_path, monkeypatch):
    """LogCameraTransform (ARRI LogC3 parameterization),
    LogAffineTransform round trip, CDL saturation."""
    import textwrap

    import numpy as np

    from envutil_tpu.io import imgio, ocio

    # ARRI LogC3 EI800 as an OCIO v2 LogCameraTransform (the standard
    # published parameterization)
    cfg = tmp_path / "log.ocio"
    cfg.write_text(textwrap.dedent("""\
        ocio_profile_version: 2
        roles:
          scene_linear: lin
        colorspaces:
          - name: lin
          - name: logc3
            to_scene_reference: !<LogCameraTransform>
              base: 10
              log_side_slope: [0.24719, 0.24719, 0.24719]
              log_side_offset: [0.385537, 0.385537, 0.385537]
              lin_side_slope: [5.555556, 5.555556, 5.555556]
              lin_side_offset: [0.052272, 0.052272, 0.052272]
              lin_side_break: [0.010591, 0.010591, 0.010591]
              direction: inverse
          - name: log2
            to_scene_reference: !<LogAffineTransform>
              base: 2
              log_side_slope: [0.3, 0.3, 0.3]
              log_side_offset: [0.5, 0.5, 0.5]
              direction: inverse
          - name: desat
            from_scene_reference: !<CDLTransform>
              slope: [1, 1, 1]
              offset: [0, 0, 0]
              power: [1, 1, 1]
              sat: 0.5
        """))
    monkeypatch.setenv("OCIO", str(cfg))
    ocio._CACHE.clear()

    v = np.linspace(0.002, 0.9, 30, dtype=np.float32).reshape(-1, 1, 3)

    # LogC3 encode: known reference point - mid grey 0.18 encodes to
    # ~0.391 (ARRI's published LogC3 EI800 value)
    grey = np.full((1, 1, 3), 0.18, np.float32)
    enc = imgio.convert_colour(grey, "lin", "logc3")
    np.testing.assert_allclose(enc, 0.391, atol=0.002)
    # round trip through the break region and above
    enc = imgio.convert_colour(v, "lin", "logc3")
    back = imgio.convert_colour(enc, "logc3", "lin")
    np.testing.assert_allclose(back, v, rtol=2e-4, atol=2e-6)

    # LogAffine round trip
    enc = imgio.convert_colour(v, "lin", "log2")
    back = imgio.convert_colour(enc, "log2", "scene_linear")
    np.testing.assert_allclose(back, v, rtol=2e-4, atol=2e-6)

    # CDL saturation: greys unchanged, chroma halved toward luma
    px = np.asarray([[[0.6, 0.2, 0.4]]], np.float32)
    out = imgio.convert_colour(px, "lin", "desat")
    luma = float((px * np.asarray([0.2126, 0.7152, 0.0722])).sum())
    np.testing.assert_allclose(out, luma + 0.5 * (px - luma),
                               atol=1e-6)
    back = imgio.convert_colour(out, "desat", "lin")
    np.testing.assert_allclose(back, px, atol=1e-6)
