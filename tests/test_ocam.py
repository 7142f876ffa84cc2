"""CameraOCAM (Scaramuzza omnidirectional model) tests: unit-norm rays,
unproject -> project roundtrip through a numerically fitted inverse
polynomial, and the reference calib-file layout (CameraOCAM.cpp:9-75).
"""
import numpy as np

from pislamfusion_tpu.core.camera import CameraOCAM


def _synthetic_ocam():
    pol = (-250.0, 0.0, 8.0e-4)
    # fit invpol: theta(r) = atan2(pol(r), r); rho(theta) must return r
    r = np.linspace(0.0, 380.0, 500)
    zp = pol[0] + pol[2] * r * r
    theta = np.arctan2(zp, r)
    inv = np.polyfit(theta, r, 8)[::-1]
    return CameraOCAM(width=800, height=600, cx=405.0, cy=302.0,
                      pol=pol, invpol=tuple(inv),
                      c=1.001, d=-0.002, e=0.0015)


def test_unproject_unit_norm_and_roundtrip():
    cam = _synthetic_ocam()
    rng = np.random.default_rng(0)
    ang = rng.uniform(0, 2 * np.pi, 200)
    rad = rng.uniform(5.0, 350.0, 200)
    px = np.stack([cam.cx + rad * np.cos(ang),
                   cam.cy + rad * np.sin(ang)], -1)
    rays = cam.unproject(px)
    assert np.abs(np.linalg.norm(rays, axis=-1) - 1.0).max() < 1e-6
    back = cam.project(rays)
    assert np.abs(back - px).max() < 0.5   # invpol fit residual

    # forward-looking rays (z > 0 under the -zp convention near center)
    center_ray = cam.unproject(np.array([cam.cx + 1e-3, cam.cy]))
    assert center_ray[2] > 0.99


def test_project_center_degenerate():
    cam = _synthetic_ocam()
    px = cam.project(np.array([0.0, 0.0, 1.0]))
    assert np.allclose(px, [cam.cx, cam.cy])


def test_from_file_layout(tmp_path):
    cam = _synthetic_ocam()
    p = tmp_path / "calib_results.txt"
    lines = [
        " ".join([str(len(cam.pol))] + [f"{v:.17g}" for v in cam.pol]),
        " ".join([str(len(cam.invpol))]
                 + [f"{v:.17g}" for v in cam.invpol]),
        f"{cam.cy} {cam.cx}",            # file stores (row, col)
        f"{cam.c} {cam.d} {cam.e}",
        f"{cam.height} {cam.width}",
    ]
    p.write_text("# pol\n" + lines[0] + "\n# invpol\n" + lines[1]
                 + "\n# center\n" + lines[2] + "\n# affine\n" + lines[3]
                 + "\n# size\n" + lines[4] + "\n")
    got = CameraOCAM.from_file(str(p))
    assert got == cam
    assert got.name == "OCAM" and got.is_valid()


def test_parameters_roundtrip_via_factory():
    """Checkpointed maps reconstruct cameras through
    Camera.from_parameters — the OCAM vector must dispatch back."""
    from pislamfusion_tpu.core.camera import Camera
    cam = _synthetic_ocam()
    got = Camera.from_parameters(cam.parameters())
    assert isinstance(got, CameraOCAM)
    assert got == cam
    # the standard fixed-length vectors still win their counts
    assert Camera.from_parameters([640, 480]).name == "Ideal"
    assert Camera.from_parameters(
        [640, 480, 500, 500, 320, 240, 0.1, 0, 0, 0, 0]).name == "OpenCV"
