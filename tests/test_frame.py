"""Frame device-feature materialization: the packed single-fetch transfer
must reproduce every feature array bit-exactly (desc bytes, octave indices,
valid mask — see models/frame._pack_feats)."""
import jax.numpy as jnp
import numpy as np
import pytest

from pislamfusion_tpu.core.camera import Camera
from pislamfusion_tpu.models.frame import Frame


def _frame():
    return Frame(id=0, timestamp=0.0,
                 camera=Camera(64, 48, 50.0, 50.0, 32.0, 24.0))


@pytest.mark.parametrize("kind,desc", [
    ("orb", np.random.default_rng(0).integers(0, 256, (100, 32),
                                              dtype=np.uint8)),
    ("sift", np.random.default_rng(1).normal(0, 0.2, (100, 128)).astype(
        np.float32)),
])
def test_materialize_packed_roundtrip(kind, desc):
    rng = np.random.default_rng(2)
    n = len(desc)
    feats = {
        "xy": rng.uniform(0, 64, (n, 2)).astype(np.float32),
        "desc": desc,
        "angle": rng.uniform(-np.pi, np.pi, n).astype(np.float32),
        "octave": rng.integers(0, 8, n).astype(np.int32),
        "response": rng.uniform(0, 1e3, n).astype(np.float32),
        "valid": rng.integers(0, 2, n).astype(bool),
    }
    fr = _frame()
    fr.set_features_device({k: jnp.asarray(v) for k, v in feats.items()},
                           kind)
    fr.ensure_host_features()
    for k, v in feats.items():
        got = fr._feats[k]
        assert got.dtype == v.dtype, k
        np.testing.assert_array_equal(got, v, err_msg=k)
    # the public views agree too
    np.testing.assert_array_equal(fr.desc, feats["desc"])
    np.testing.assert_array_equal(fr.valid, feats["valid"])
