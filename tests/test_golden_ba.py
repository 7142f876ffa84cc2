"""ops/ba.py vs the REFERENCE'S OWN vendored g2o solver (golden fixtures).

tests/data/golden/ref_ba_expect.txt is emitted by native/golden_ba_writer.cpp,
which compiles the reference's optimizerG2O (GSLAM-DIYSLAM/src/zhaoyong/
optimizerG2O/Optimizer.cpp over the vendored Eigen-only g2o) and solves the
reference's own simulation shapes (tests/OptimizerTest.cpp:121-560). Every
input AND the solved output are in the fixture, so these tests anchor
ops/ba.py to reference-code output the way MapHash/.gbow already are.

Reference audit (verified while building the writer; see its header):
  * OptimizerG2O implements optimizePnP (Optimizer.cpp:18-165) and
    optimize() = mappoint bundle + EdgeSE3GPS priors (:227-443). These are
    the paths the runtime actually uses (TrackerOpt pose refinement,
    MapperDemo local BA + GPS fusion) and are anchored EXACTLY here.
  * optimizeICP / optimizePose fall through to the GSLAM::Optimizer base
    class, which returns false — the reference's ICP/invdepth-pose layer
    is a stub. ops/ransac.sim3_horn + ba.optimize_pose_invdepth remain
    validated by synthetic ground-truth + cv2 oracles instead.
  * optimize() IGNORES se3Graph/sim3Graph/invDepth edges (:228 commented
    dispatch); optimizeSE3Graph (:167-225) is unreachable from the
    runtime, and its EdgeSE3 enforces T2 = M*T1 while the reference's own
    test generator chains T2 = T1*M. The se3_graph fixture records its
    output anyway; the test here holds ops/ba.py to a NON-INFERIORITY bar
    against it under the generator's convention.
  * EdgeSE3GPS applies the information diagonal {1,1,0.5,0.1,0.1,0.1} in
    g2o log order = (rotation, translation) — i.e. the reference weights
    ROTATION by {1,1,0.5} despite its "translation constraint" comment.
    The bundle_gps test mirrors that actual behavior.
"""
import os

import numpy as np
import pytest

from pislamfusion_tpu.ops import ba, lie

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "golden")
FIX = os.path.join(GOLDEN, "ref_ba_expect.txt")


def _parse_sections():
    sections = {}
    cur = None
    with open(FIX) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "##":
                cur = {"name": parts[1], "meta": parts[2:], "rows": []}
                sections[parts[1]] = cur
            else:
                cur["rows"].append(parts)
    return sections


@pytest.fixture(scope="module")
def gold():
    if not os.path.isfile(FIX):
        pytest.skip("golden BA fixture missing")
    return _parse_sections()


def _se3(vals):
    return np.asarray([float(v) for v in vals[:7]], np.float32)


def _rows(sec, tag):
    return [r[1:] for r in sec["rows"] if r[0] == tag]


def _se3_diff(Ta, Tb):
    """(translation distance, rotation angle) between two [7] SE3s."""
    d = lie.se3_mul(lie.se3_inv(np.asarray(Ta)), np.asarray(Tb))
    d = np.asarray(d)
    trans = float(np.linalg.norm(d[:3]))
    rot = 2.0 * float(np.arcsin(min(1.0, np.linalg.norm(d[3:6]))))
    return trans, rot


def test_pnp_matches_reference_g2o(gold):
    sec = gold["pnp"]
    ground = _se3(_rows(sec, "ground")[0])
    init = _se3(_rows(sec, "init")[0])
    solved_ref = _se3(_rows(sec, "solved")[0])
    m = np.asarray([[float(v) for v in r] for r in _rows(sec, "m")],
                   np.float32)
    p3d, p2n = m[:, :3], m[:, 3:5]
    w = np.ones(len(m), np.float32)
    T, cost, chi2 = ba.optimize_pose(
        init, p3d, p2n, w, iters=30, huber_delta=float(np.sqrt(1e-5)))
    T = np.asarray(T)
    trans, rot = _se3_diff(T, solved_ref)
    # both optimize the same Huber cost from the same start; they must
    # land in the same optimum well under the measurement noise floor
    assert trans < 5e-3 and rot < 5e-3, (trans, rot)
    # non-inferiority vs ground truth
    t_ba, r_ba = _se3_diff(T, ground)
    t_ref, r_ref = _se3_diff(solved_ref, ground)
    assert t_ba <= t_ref * 1.5 + 1e-3


def test_bundle_matches_reference_g2o(gold):
    sec = gold["bundle"]
    kf0 = _se3(_rows(sec, "kf0")[0])                 # c2w
    kf1_init = _se3(_rows(sec, "kf1_init")[0])
    kf1_ground = _se3(_rows(sec, "kf1_ground")[0])
    solved_ref = _se3(_rows(sec, "solved_kf1")[0])   # c2w
    pts, gpts = [], []
    for r in _rows(sec, "pt"):
        pts.append([float(v) for v in r[:3]])
        gpts.append([float(v) for v in r[4:7]])
    ob0 = np.asarray([[float(v) for v in r[:2]] for r in _rows(sec, "ob0")],
                     np.float32)
    ob1 = np.asarray([[float(v) for v in r[:2]] for r in _rows(sec, "ob1")],
                     np.float32)
    P = len(pts)
    poses_w2c = np.stack([np.asarray(lie.se3_inv(kf0)),
                          np.asarray(lie.se3_inv(kf1_init))])
    obs_frame = np.concatenate([np.zeros(P), np.ones(P)]).astype(np.int32)
    obs_point = np.concatenate([np.arange(P), np.arange(P)]).astype(np.int32)
    obs_uv = np.concatenate([ob0, ob1], 0)
    prob = ba.make_problem(
        poses=poses_w2c, pose_fixed=[True, False],
        points=np.asarray(pts, np.float32),
        point_fixed=np.zeros(P, bool),
        obs_frame=obs_frame, obs_point=obs_point, obs_uv=obs_uv,
        obs_weight=np.ones(2 * P, np.float32))
    poses, points, cost = ba.optimize(prob, iters=40,
                                      huber_delta=float(np.sqrt(1e-5)))
    kf1_ba_c2w = np.asarray(lie.se3_inv(np.asarray(poses)[1]))
    trans, rot = _se3_diff(kf1_ba_c2w, solved_ref)
    assert trans < 1e-2 and rot < 1e-2, (trans, rot)
    # non-inferiority on the pose vs ground truth
    t_ba, _ = _se3_diff(kf1_ba_c2w, kf1_ground)
    t_ref, _ = _se3_diff(solved_ref, kf1_ground)
    assert t_ba <= t_ref * 1.5 + 2e-3
    # points: RMS agreement with the reference's solved cloud
    spts = np.asarray([[float(v) for v in r]
                       for r in _rows(sec, "solved_pt")], np.float32)
    rms = float(np.sqrt(np.mean(np.sum(
        (np.asarray(points) - spts) ** 2, -1))))
    assert rms < 2e-2, rms
    # and non-inferior vs the ground-truth cloud
    g = np.asarray(gpts, np.float32)
    rms_ba = float(np.sqrt(np.mean(np.sum((np.asarray(points) - g) ** 2,
                                          -1))))
    rms_ref = float(np.sqrt(np.mean(np.sum((spts - g) ** 2, -1))))
    assert rms_ba <= rms_ref * 1.5 + 2e-3


def test_bundle_gps_matches_reference_g2o(gold):
    sec = gold["bundle_gps"]
    kfg = [_se3(r) for r in _rows(sec, "kf_ground")]
    kfi = [_se3(r) for r in _rows(sec, "kf_init")]
    gps = [_se3(r) for r in _rows(sec, "gps")]
    info = [float(v) for v in _rows(sec, "gpsinfo")[0]]
    solved_ref = [_se3(r) for r in _rows(sec, "solved_kf")]
    pts = np.asarray([[float(v) for v in r[:3]] for r in _rows(sec, "pt")],
                     np.float32)
    obs = [(int(r[0]), int(r[1]), float(r[2]), float(r[3]))
           for r in _rows(sec, "ob")]
    NK, P = len(kfi), len(pts)
    poses_w2c = np.stack([np.asarray(lie.se3_inv(T)) for T in kfi])
    obs_point = np.asarray([o[0] for o in obs], np.int32)
    obs_frame = np.asarray([o[1] for o in obs], np.int32)
    obs_uv = np.asarray([[o[2], o[3]] for o in obs], np.float32)
    # reference info diag is in g2o log order (rotation, translation);
    # ba's prior_info is (translation, rotation)
    prior_info = np.tile(np.asarray(info[3:6] + info[0:3], np.float32),
                         (NK, 1))
    prior_pose = np.stack([np.asarray(lie.se3_inv(T)) for T in gps])
    prob = ba.make_problem(
        poses=poses_w2c, pose_fixed=[False] * NK,
        points=pts, point_fixed=np.zeros(P, bool),
        obs_frame=obs_frame, obs_point=obs_point, obs_uv=obs_uv,
        obs_weight=np.ones(len(obs), np.float32),
        prior_frame=np.arange(NK, dtype=np.int32),
        prior_pose=prior_pose, prior_info=prior_info)
    poses, points, cost = ba.optimize(prob, iters=40,
                                      huber_delta=float(np.sqrt(1e-5)))
    for k in range(NK):
        c2w = np.asarray(lie.se3_inv(np.asarray(poses)[k]))
        trans, rot = _se3_diff(c2w, solved_ref[k])
        # the reference applies the GPS residual on the conjugate side
        # (log(meas*T) vs log(T*prior^-1)) — identical costs for isotropic
        # info, a small anisotropy-induced offset here
        assert trans < 3e-2 and rot < 3e-2, (k, trans, rot)
        t_ba, _ = _se3_diff(c2w, kfg[k])
        t_ref, _ = _se3_diff(solved_ref[k], kfg[k])
        assert t_ba <= t_ref * 2.0 + 1e-2


def test_se3_graph_noninferior_to_reference(gold):
    """The reference's optimizeSE3Graph is unreachable from its runtime
    and enforces the transposed constraint (see module docstring); hold
    ops/ba.optimize_se3_graph to: under the GENERATOR's convention
    (T2 = T1 * M, the one its own test builds), our solution's edge
    consistency must beat the reference output's."""
    sec = gold["se3_graph"]
    kfs = [_se3(r) for r in _rows(sec, "kf")]
    solved_ref = [_se3(r) for r in _rows(sec, "solved")]
    edges = []
    for r in _rows(sec, "edge"):
        edges.append((int(r[0]), int(r[1]),
                      np.asarray([float(v) for v in r[2:9]], np.float32)))
    N = len(kfs)
    poses_w2c = np.stack([np.asarray(lie.se3_inv(T)) for T in kfs])
    rel_i = np.asarray([e[0] for e in edges], np.int32)
    rel_j = np.asarray([e[1] for e in edges], np.int32)
    rel_meas = np.stack([e[2] for e in edges])
    fixed = np.zeros(N, bool)
    fixed[0] = True
    new_poses, cost = ba.optimize_se3_graph(
        poses_w2c, fixed, rel_i, rel_j, rel_meas,
        np.ones(len(edges), np.float32), iters=40)
    ba_c2w = np.stack([np.asarray(lie.se3_inv(T))
                       for T in np.asarray(new_poses)])

    def gen_cost(c2w_list):
        tot = 0.0
        for (i, j, m) in edges:
            pred = np.asarray(lie.se3_mul(c2w_list[i], m))
            d = np.asarray(lie.se3_log(np.asarray(
                lie.se3_mul(lie.se3_inv(pred), c2w_list[j]))))
            tot += float(np.sum(d * d))
        return tot

    c_init = gen_cost(np.stack(kfs))
    c_ba = gen_cost(ba_c2w)
    c_ref = gen_cost(np.stack(solved_ref))
    assert c_ba < c_init * 0.5          # we actually optimize the graph
    assert c_ba <= c_ref + 1e-6, (c_ba, c_ref)
