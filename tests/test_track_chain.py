"""K-frame chained fused tracking (pipeline.fused_track_chain).

The chain keeps the per-frame carry (features, point bindings, motion
model) on device across a lax.scan so the host pays ONE packed fetch per K
frames. These tests pin the carry semantics: every chain row must equal
the per-frame program (fused_track_packed_feats) fed the SAME carry the
device computed — reconstructed on the host from the previous row exactly
the way models/tracker._apply_packed + _gather_frame_points would.
"""
import numpy as np
import jax.numpy as jnp

from pislamfusion_tpu.models import pipeline
from pislamfusion_tpu.utils import host_se3 as hse3

FX = FY = 260.0
CX, CY = 160.0, 120.0
W, H = 320, 240
CHI2 = 5.991
RADIUS, R_LOCAL = 20.0, 8.0


def _project(pose_c2w, pts):
    T = hse3.se3_inv(pose_c2w)
    pc = hse3.se3_apply(T, pts)
    z = np.maximum(pc[:, 2], 1e-6)
    return np.stack([FX * pc[:, 0] / z + CX, FY * pc[:, 1] / z + CY], -1), pc[:, 2]


def _make_scene(rng, n_pts=64):
    """Ground-ish cloud + a nadir camera strafing in x (rot 180 about x so
    the camera looks down +z_world -> depth ~10)."""
    pts = np.stack([rng.uniform(-2.0, 6.0, n_pts),
                    rng.uniform(-2.0, 2.0, n_pts),
                    rng.uniform(0.0, 0.5, n_pts)], -1).astype(np.float32)
    desc = rng.integers(0, 256, (n_pts, 32), dtype=np.uint8)
    poses = [np.array([0.15 * k, 0.02 * k, 10.0, 1, 0, 0, 0], np.float32)
             for k in range(5)]
    return pts, desc, poses


def _frame_feats(rng, pts, desc, pose, n_slots):
    """Padded per-frame features: each visible point lands on a random
    slot with the point's descriptor and its (slightly noisy) pixel."""
    pix, z = _project(pose, pts)
    vis = ((pix[:, 0] > 5) & (pix[:, 0] < W - 5)
           & (pix[:, 1] > 5) & (pix[:, 1] < H - 5) & (z > 0.1))
    order = rng.permutation(n_slots)
    xy = np.zeros((n_slots, 2), np.float32)
    dsc = rng.integers(0, 256, (n_slots, 32), dtype=np.uint8)
    valid = np.zeros(n_slots, bool)
    slot_of = np.full(len(pts), -1)
    j = 0
    for i in np.nonzero(vis)[0]:
        s = order[j]
        j += 1
        xy[s] = pix[i] + rng.normal(0, 0.2, 2)
        dsc[s] = desc[i]
        valid[s] = True
        slot_of[i] = s
    return {"xy": jnp.asarray(xy), "desc": jnp.asarray(dsc),
            "valid": jnp.asarray(valid)}, slot_of


def _emulate_next_carry(packed, prev_p3d, lpos, n, P):
    """Host replication of the device carry merge (_track_core /
    _localmap_core): next frame's per-slot (p3d, has) from one packed row."""
    a = packed[16:16 + 6 * n].reshape(6, n)
    b = packed[16 + 6 * n:].reshape(2, P)
    idx1, ok1 = a[0].astype(int), a[1] > 0.5
    chi2_1, w1, chi2_2, w2 = a[2], a[3], a[4], a[5]
    idx2, ok2 = b[0].astype(int), b[1] > 0.5
    th = CHI2 / FX ** 2
    p3d_cur = np.zeros((n, 3), np.float32)
    w_cur = np.zeros(n, np.float32)
    for i in np.nonzero(ok1)[0]:
        p3d_cur[idx1[i]] = prev_p3d[i]
        w_cur[idx1[i]] = 1.0
    inl = (w_cur > 0) & (chi2_1 < th)
    w_cur = np.where(inl, w_cur, 0.0)
    p3d_new = np.zeros((n, 3), np.float32)
    w_new = np.zeros(n, np.float32)
    for p in np.nonzero(ok2)[0]:
        p3d_new[idx2[p]] = lpos[p]
        w_new[idx2[p]] = 1.0
    free = w_cur <= 0
    p3d = np.where(free[:, None], p3d_new, p3d_cur)
    w = np.where(free, w_new, w_cur)
    has = (w > 0) & (chi2_2 < th)
    pose_new_c2w = hse3.se3_inv(packed[8:15])
    return p3d.astype(np.float32), has, pose_new_c2w.astype(np.float32)


def test_chain_matches_sequential():
    """fused_track_chain rows == sequential fused_track_packed_feats calls
    fed the device-identical carry (reconstructed per frame on host)."""
    rng = np.random.default_rng(0)
    n = 64
    pts, desc, poses = _make_scene(rng)
    feats = []
    for pose in poses:
        f, _ = _frame_feats(rng, pts, desc, pose, n)
        feats.append(f)

    # local stage: the full cloud, padded to P
    P = 96
    lpos = np.zeros((P, 3), np.float32)
    lpos[:len(pts)] = pts
    ldesc = np.zeros((P, 32), np.uint8)
    ldesc[:len(pts)] = desc
    lvalid = np.zeros(P, bool)
    lvalid[:len(pts)] = True
    lpos_j, ldesc_j, lvalid_j = map(jnp.asarray, (lpos, ldesc, lvalid))

    # frame 0 is "last": its slots carry the true points
    f0, slot_of = _frame_feats(rng, pts, desc, poses[0], n)
    prev_p3d = np.zeros((n, 3), np.float32)
    prev_has = np.zeros(n, bool)
    for i, s in enumerate(slot_of):
        if s >= 0:
            prev_p3d[s] = pts[i]
            prev_has[s] = True
    pose_est = poses[0].copy()
    motion = np.array([0, 0, 0, 0, 0, 0, 1.0], np.float32)

    K = 4
    chain_aux = np.concatenate([prev_p3d.reshape(-1),
                                prev_has.astype(np.float32),
                                pose_est, motion])
    kw = dict(fx=FX, fy=FY, cx=CX, cy=CY, width=W, height=H,
              radius=RADIUS, radius_local=R_LOCAL, chi2_th=CHI2)
    packed_k = np.asarray(pipeline.fused_track_chain(
        jnp.stack([feats[k]["desc"] for k in range(1, K + 1)]),
        jnp.stack([feats[k]["valid"] for k in range(1, K + 1)]),
        jnp.stack([feats[k]["xy"] for k in range(1, K + 1)]),
        f0["desc"], f0["valid"], jnp.asarray(chain_aux),
        lpos_j, ldesc_j, lvalid_j, **kw))
    assert packed_k.shape == (K, 16 + 6 * n + 2 * P)

    # sequential reference: per-frame program + host-reconstructed carry
    p3d, has = prev_p3d, prev_has
    pose, mot = pose_est, motion
    pdesc, pvalid = f0["desc"], f0["valid"]
    for k in range(K):
        T_pred = hse3.se3_inv(hse3.se3_mul(pose, mot)).astype(np.float32)
        aux = np.concatenate([p3d.reshape(-1), has.astype(np.float32),
                              T_pred])
        row = np.asarray(pipeline.fused_track_packed_feats(
            feats[k + 1], pdesc, pvalid, jnp.asarray(aux),
            lpos_j, ldesc_j, lvalid_j, **kw))
        np.testing.assert_allclose(packed_k[k], row, rtol=1e-4, atol=1e-4,
                                   err_msg=f"chain row {k} != sequential")
        # healthy tracking throughout (not vacuous equality)
        assert row[15] >= 20, f"frame {k}: only {row[15]} inliers"
        p3d, has, pose_new = _emulate_next_carry(row, p3d, lpos, n, P)
        mot = hse3.se3_mul(hse3.se3_inv(pose), pose_new).astype(np.float32)
        pose = pose_new
        pdesc, pvalid = feats[k + 1]["desc"], feats[k + 1]["valid"]

    # and the recovered poses are near ground truth
    for k in range(K):
        T2 = packed_k[k][8:15]
        c2w = hse3.se3_inv(T2)
        assert np.linalg.norm(c2w[:3] - poses[k + 1][:3]) < 0.05, \
            (k, c2w[:3], poses[k + 1][:3])
