"""Bundle adjustment simulation tests — ports of the reference's
tests/OptimizerTest.cpp fixtures (OptimizePnPSimulate:171,
MapPointBundleSimulate:448, SE3GraphSimulate:259, GPSGraphSimulate:369):
random geometry + noise, assert the solver recovers ground truth."""
import numpy as np
import jax
import jax.numpy as jnp

from pislamfusion_tpu.ops import ba, lie


def make_world(rng, n_frames=6, n_points=120, noise=0.0):
    """Cameras on an arc looking at a point cloud around the origin."""
    poses_c2w = []
    for i in range(n_frames):
        ang = 0.25 * i
        c = np.array([4.0 * np.sin(ang), 0.5 * i, -6.0 + 0.3 * i])
        # look roughly toward origin: keep identity rotation + small yaw
        q = np.array([0.0, np.sin(ang * 0.1), 0.0, np.cos(ang * 0.1)])
        poses_c2w.append(np.concatenate([c, q]))
    poses_c2w = jnp.asarray(np.stack(poses_c2w), jnp.float32)
    points = jnp.asarray(rng.uniform(-3, 3, size=(n_points, 3)), jnp.float32)
    points = points.at[:, 2].set(points[:, 2] * 0.5)

    # observations: all frames see all points (if in front)
    T_w2c = lie.se3_inv(poses_c2w)
    obs_f, obs_p, obs_uv = [], [], []
    for f in range(n_frames):
        pc = np.asarray(lie.se3_apply(T_w2c[f], points))
        ok = pc[:, 2] > 1.0
        uv = pc[:, :2] / pc[:, 2:]
        for p in np.nonzero(ok)[0]:
            obs_f.append(f)
            obs_p.append(int(p))
            obs_uv.append(uv[p])
    obs_uv = np.stack(obs_uv) + rng.normal(0, noise, (len(obs_f), 2))
    return (np.asarray(poses_c2w), np.asarray(points),
            np.asarray(obs_f), np.asarray(obs_p),
            obs_uv.astype(np.float32))


def ate(poses_a, poses_b):
    return float(np.sqrt(np.mean(np.sum((poses_a[:, :3] - poses_b[:, :3]) ** 2,
                                        -1))))


def test_optimize_pose_recovers(rng):
    """OptimizePnPSimulate: perturb one pose, points fixed."""
    poses_c2w, points, of, op, uv = make_world(rng, n_frames=1, noise=0.001)
    T_true_w2c = np.asarray(lie.se3_inv(jnp.asarray(poses_c2w[0])))
    pert = lie.se3_exp(jnp.asarray([0.1, -0.1, 0.05, 0.03, -0.02, 0.04]))
    T0 = np.asarray(lie.se3_mul(pert, jnp.asarray(T_true_w2c)))
    w = np.zeros(len(points), np.float32)
    p2n = np.zeros((len(points), 2), np.float32)
    p2n[op] = uv
    w[op] = 1.0
    T, cost, chi2 = ba.optimize_pose(jnp.asarray(T0), jnp.asarray(points),
                                     jnp.asarray(p2n), jnp.asarray(w))
    T = np.asarray(T)
    assert np.linalg.norm(T[:3] - T_true_w2c[:3]) < 0.01
    qd = min(np.abs(T[3:] - T_true_w2c[3:]).max(),
             np.abs(T[3:] + T_true_w2c[3:]).max())
    assert qd < 0.005


def test_full_ba_recovers(rng):
    """MapPointBundleSimulate: perturb poses+points, first pose fixed."""
    poses_c2w, points_true, of, op, uv = make_world(rng, noise=0.0005)
    F = len(poses_c2w)
    T_w2c_true = np.asarray(lie.se3_inv(jnp.asarray(poses_c2w)))
    rngj = jax.random.PRNGKey(0)
    pert = np.asarray(lie.se3_exp(
        jax.random.normal(rngj, (F, 6)) * 0.03))
    T0 = np.array(lie.se3_mul(jnp.asarray(pert), jnp.asarray(T_w2c_true)))
    # fix two poses: one for the SE3 gauge, the second for the monocular
    # scale gauge (otherwise ATE reflects harmless scale drift)
    T0[0] = T_w2c_true[0]
    T0[1] = T_w2c_true[1]
    pts0 = points_true + rng.normal(0, 0.05, points_true.shape).astype(
        np.float32)
    fixed = np.zeros(F, bool)
    fixed[0] = True
    fixed[1] = True
    prob = ba.make_problem(
        poses=T0, pose_fixed=fixed, points=pts0,
        point_fixed=np.zeros(len(pts0), bool),
        obs_frame=of, obs_point=op, obs_uv=uv,
        obs_weight=np.ones(len(of), np.float32))
    new_poses, new_points, cost = ba.optimize(prob, iters=25)
    new_poses = np.asarray(new_poses)
    err0 = ate(T0, T_w2c_true)
    err1 = ate(new_poses, T_w2c_true)
    assert err1 < 0.01, (err0, err1)
    assert err1 < err0 * 0.2
    pt_err = np.sqrt(np.mean(np.sum((np.asarray(new_points)
                                     - points_true) ** 2, -1)))
    assert pt_err < 0.02
    # the early-terminating variant (tol > 0, lax.while_loop) must reach
    # the same quality — it stops once an accepted step improves the cost
    # by < tol relative (the online mapper's default path)
    tp, tx, tc = ba.optimize(prob, iters=25, tol=1e-4)
    assert ate(np.asarray(tp), T_w2c_true) < 0.01
    assert float(tc) <= float(cost) * 1.5


def test_se3_graph_closes_loop(rng):
    """SE3GraphSimulate: chain of noisy odometry edges + one loop edge."""
    n = 12
    # ground truth: poses around a circle (w2c arbitrary; use c2w=identity-ish)
    poses_true = []
    for i in range(n):
        a = 2 * np.pi * i / n
        t = np.array([np.cos(a), np.sin(a), 0.0]) * 3.0
        q = np.array([0.0, 0.0, np.sin(a / 2), np.cos(a / 2)])
        poses_true.append(np.concatenate([t, q]))
    poses_true = jnp.asarray(np.stack(poses_true), jnp.float32)
    # odometry measurements: T_ij = Ti * Tj^-1 with noise; plus loop n-1 -> 0
    ei, ej, meas = [], [], []
    for i in range(n - 1):
        ei.append(i)
        ej.append(i + 1)
        Tij = lie.se3_mul(poses_true[i], lie.se3_inv(poses_true[i + 1]))
        nz = lie.se3_exp(jnp.asarray(rng.normal(0, 0.02, 6), jnp.float32))
        meas.append(np.asarray(lie.se3_mul(nz, Tij)))
    ei.append(n - 1)
    ej.append(0)
    meas.append(np.asarray(lie.se3_mul(poses_true[n - 1],
                                       lie.se3_inv(poses_true[0]))))
    # initialize by integrating noisy odometry (drift)
    init = [np.asarray(poses_true[0])]
    for i in range(n - 1):
        init.append(np.asarray(
            lie.se3_mul(lie.se3_inv(jnp.asarray(meas[i])),
                        jnp.asarray(init[i]))))
    init = np.stack(init)
    fixed = np.zeros(n, bool)
    fixed[0] = True
    new_poses, cost = ba.optimize_se3_graph(
        jnp.asarray(init, jnp.float32), jnp.asarray(fixed),
        jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
        jnp.asarray(np.stack(meas), jnp.float32),
        jnp.ones(n, jnp.float32), iters=40)
    err0 = ate(init, np.asarray(poses_true))
    err1 = ate(np.asarray(new_poses), np.asarray(poses_true))
    assert err1 < max(0.5 * err0, 0.05), (err0, err1)


def test_gps_prior_pulls_poses(rng):
    """GPSGraphSimulate: priors move free poses toward GPS positions."""
    F = 4
    T = np.tile(np.array([0, 0, 0, 0, 0, 0, 1.0], np.float32), (F, 1))
    T[:, 0] = np.arange(F)  # along x
    prior = T.copy()
    prior[:, 1] += 2.0      # GPS says: shifted in y
    prob = ba.make_problem(
        poses=T, pose_fixed=np.zeros(F, bool),
        prior_frame=np.arange(F), prior_pose=prior,
        prior_info=np.full((F, 6), 10.0, np.float32))
    new_poses, _, cost = ba.optimize(prob, iters=15)
    np.testing.assert_allclose(np.asarray(new_poses)[:, 1], 2.0, atol=1e-2)


def test_fixed_poses_stay(rng):
    poses_c2w, points_true, of, op, uv = make_world(rng, noise=0.001)
    F = len(poses_c2w)
    T_w2c = np.asarray(lie.se3_inv(jnp.asarray(poses_c2w)))
    fixed = np.ones(F, bool)  # everything fixed: nothing may move
    prob = ba.make_problem(
        poses=T_w2c, pose_fixed=fixed, points=points_true,
        point_fixed=np.ones(len(points_true), bool),
        obs_frame=of, obs_point=op, obs_uv=uv,
        obs_weight=np.ones(len(of), np.float32))
    new_poses, new_points, _ = ba.optimize(prob, iters=5)
    np.testing.assert_allclose(np.asarray(new_poses), T_w2c, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_points), points_true, atol=1e-6)


def _loop_graph(rng, n=40):
    """Noisy circular odometry chain + loop edge; returns (init, fixed,
    ei, ej, meas, w, poses_true)."""
    poses_true = []
    for i in range(n):
        a = 2 * np.pi * i / n
        t = np.array([np.cos(a), np.sin(a), 0.0]) * 3.0
        q = np.array([0.0, 0.0, np.sin(a / 2), np.cos(a / 2)])
        poses_true.append(np.concatenate([t, q]))
    poses_true = jnp.asarray(np.stack(poses_true), jnp.float32)
    ei, ej, meas = [], [], []
    for i in range(n - 1):
        ei.append(i)
        ej.append(i + 1)
        Tij = lie.se3_mul(poses_true[i], lie.se3_inv(poses_true[i + 1]))
        nz = lie.se3_exp(jnp.asarray(rng.normal(0, 0.02, 6), jnp.float32))
        meas.append(np.asarray(lie.se3_mul(nz, Tij)))
    ei.append(n - 1)
    ej.append(0)
    meas.append(np.asarray(lie.se3_mul(poses_true[n - 1],
                                       lie.se3_inv(poses_true[0]))))
    init = [np.asarray(poses_true[0])]
    for i in range(n - 1):
        init.append(np.asarray(
            lie.se3_mul(lie.se3_inv(jnp.asarray(meas[i])),
                        jnp.asarray(init[i]))))
    init = np.stack(init)
    fixed = np.zeros(n, bool)
    fixed[0] = True
    return (init, fixed, np.asarray(ei, np.int32), np.asarray(ej, np.int32),
            np.stack(meas).astype(np.float32), np.ones(len(ei), np.float32),
            np.asarray(poses_true))


def test_se3_graph_cg_matches_dense(rng):
    """The matrix-free block-Jacobi-CG pose-graph solver must reach the
    dense Schur solver's solution on the same graph."""
    init, fixed, ei, ej, meas, w, truth = _loop_graph(rng, n=40)
    dense, cost_d = ba.optimize_se3_graph(
        jnp.asarray(init, jnp.float32), jnp.asarray(fixed),
        jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(meas),
        jnp.asarray(w), iters=40)
    cg, cost_c = ba.optimize_se3_graph_cg(
        jnp.asarray(init, jnp.float32), jnp.asarray(fixed),
        jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(meas),
        jnp.asarray(w), iters=40, cg_iters=60)
    e_dense = ate(np.asarray(dense), truth)
    e_cg = ate(np.asarray(cg), truth)
    assert e_cg < max(1.2 * e_dense, 0.05), (e_dense, e_cg)
    assert float(cost_c) < 1.2 * float(cost_d) + 1e-5, (cost_d, cost_c)


def test_se3_graph_cg_padded_rows_inert(rng):
    """Padded (weight-0 edges, fixed identity poses) rows must not change
    the CG solution — the loop closer pads to capacity quanta."""
    init, fixed, ei, ej, meas, w, truth = _loop_graph(rng, n=24)
    base, _ = ba.optimize_se3_graph_cg(
        jnp.asarray(init, jnp.float32), jnp.asarray(fixed),
        jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(meas),
        jnp.asarray(w), iters=25, cg_iters=50)
    F, E = 64, 256
    init_p = np.tile(np.array([0, 0, 0, 0, 0, 0, 1.0], np.float32), (F, 1))
    init_p[:24] = init
    fixed_p = np.ones(F, bool)
    fixed_p[:24] = fixed
    ei_p = np.zeros(E, np.int32); ei_p[:len(ei)] = ei
    ej_p = np.zeros(E, np.int32); ej_p[:len(ej)] = ej
    meas_p = np.tile(np.array([0, 0, 0, 0, 0, 0, 1.0], np.float32), (E, 1))
    meas_p[:len(meas)] = meas
    w_p = np.zeros(E, np.float32); w_p[:len(w)] = w
    padded, _ = ba.optimize_se3_graph_cg(
        jnp.asarray(init_p), jnp.asarray(fixed_p),
        jnp.asarray(ei_p), jnp.asarray(ej_p), jnp.asarray(meas_p),
        jnp.asarray(w_p), iters=25, cg_iters=50)
    np.testing.assert_allclose(np.asarray(padded)[:24], np.asarray(base),
                               atol=2e-4)


def test_optimize_pose_invdepth(rng):
    """InvDepthBundleSimulate-style: mixed PnP + epipolar inverse-depth pose
    refinement (Optimizer.cpp:445-492 EdgeSE3InvDepth) must recover the pose
    with only a handful of 3D anchors when 2D-2D matches carry the rest."""
    n2, n3 = 160, 8
    pts = rng.uniform(-2, 2, (n2 + n3, 3)).astype(np.float32)
    pts[:, 2] += 6.0
    T_ref_c2w = jnp.asarray([0, 0, 0, 0, 0, 0, 1.0], jnp.float32)
    T_cur_c2w = jnp.asarray(np.concatenate([
        [0.8, -0.3, 0.1],
        np.array([0.02, 0.03, -0.01, 1.0]) / np.linalg.norm(
            [0.02, 0.03, -0.01, 1.0])]), jnp.float32)
    T_cur_true = lie.se3_inv(T_cur_c2w)

    def project(T_w2c, X):
        pc = np.asarray(lie.se3_apply(T_w2c, jnp.asarray(X)))
        return pc[:, :2] / pc[:, 2:], pc[:, 2]

    rays_ref, zr = project(lie.se3_inv(T_ref_c2w), pts)
    rays_cur, _ = project(T_cur_true, pts)
    noise = rng.normal(0, 0.5 / 400.0, rays_cur.shape).astype(np.float32)
    rays_cur = rays_cur + noise
    # split: first n2 matches are 2D-2D (depth unknown), last n3 are 3D
    w2d = np.zeros(n2 + n3, np.float32)
    w2d[:n2] = 1.0
    w3d = np.zeros(n2 + n3, np.float32)
    w3d[n2:] = 1.0
    idepth0 = np.full(n2 + n3, 1.0 / np.median(zr), np.float32)
    T_init = np.asarray(lie.se3_inv(jnp.asarray(
        [0.6, -0.1, 0.0, 0, 0, 0, 1.0], jnp.float32)))  # off init
    T, cost, q, chi2_2d, chi2_3d = ba.optimize_pose_invdepth(
        jnp.asarray(T_init, jnp.float32), T_ref_c2w,
        jnp.asarray(rays_ref, jnp.float32),
        jnp.asarray(rays_cur, jnp.float32), jnp.asarray(w2d),
        jnp.asarray(idepth0), jnp.asarray(pts),
        jnp.asarray(rays_cur, jnp.float32), jnp.asarray(w3d), iters=25)
    T_est_c2w = np.asarray(lie.se3_inv(T))
    t_err = np.linalg.norm(T_est_c2w[:3] - np.asarray(T_cur_c2w)[:3])
    assert t_err < 0.05, t_err
    # recovered inverse depths match truth for the 2D edges
    q_est = np.asarray(q)[:n2]
    rel = np.abs(1.0 / q_est - zr[:n2]) / zr[:n2]
    assert np.median(rel) < 0.08, np.median(rel)


def test_sim3_graph_corrects_scale_drift(rng):
    """SIM3GraphSimulate (OptimizerTest.cpp:313): a circular chain whose
    odometry carries cumulative SCALE drift; the sim3 graph with one loop
    edge must recover both the poses and the unit scales."""
    n = 12
    sims_true = []
    for i in range(n):
        a = 2 * np.pi * i / n
        t = np.array([np.cos(a), np.sin(a), 0.0]) * 3.0
        q = np.array([0.0, 0.0, np.sin(a / 2), np.cos(a / 2)])
        sims_true.append(np.concatenate([t, q, [1.0]]))
    sims_true = jnp.asarray(np.stack(sims_true), jnp.float32)
    ei, ej, meas = [], [], []
    for i in range(n - 1):
        ei.append(i)
        ej.append(i + 1)
        Sij = lie.sim3_mul(lie.sim3_inv(sims_true[i]), sims_true[i + 1])
        nz = lie.sim3_exp(jnp.asarray(
            np.concatenate([rng.normal(0, 0.02, 6), [0.02]]), jnp.float32))
        meas.append(np.asarray(lie.sim3_mul(nz, Sij)))  # scale-drifting odo
    ei.append(n - 1)
    ej.append(0)
    meas.append(np.asarray(lie.sim3_mul(lie.sim3_inv(sims_true[n - 1]),
                                        sims_true[0])))
    init = [np.asarray(sims_true[0])]
    for i in range(n - 1):
        init.append(np.asarray(lie.sim3_mul(jnp.asarray(init[i]),
                                            jnp.asarray(meas[i]))))
    init = np.stack(init)
    drift_scale = abs(init[-1, 7] - 1.0)
    assert drift_scale > 0.1          # the fixture genuinely drifts
    fixed = np.zeros(n, bool)
    fixed[0] = True
    out, cost = ba.optimize_sim3_graph(
        jnp.asarray(init, jnp.float32), jnp.asarray(fixed),
        jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
        jnp.asarray(np.stack(meas), jnp.float32),
        jnp.ones(n, jnp.float32), iters=40)
    out = np.asarray(out)
    terr0 = np.sqrt(np.mean(np.sum((init[:, :3]
                                    - np.asarray(sims_true)[:, :3]) ** 2,
                                   -1)))
    terr1 = np.sqrt(np.mean(np.sum((out[:, :3]
                                    - np.asarray(sims_true)[:, :3]) ** 2,
                                   -1)))
    assert terr1 < 0.5 * terr0, (terr0, terr1)
    assert np.abs(out[:, 7] - 1.0).max() < 0.08, out[:, 7]


def test_optimize_icp_recovers_sim3(rng):
    """ICPSimulate (OptimizerTest.cpp:213): 3D-3D with outliers."""
    n = 200
    pa = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    S_true = jnp.asarray(np.concatenate([
        [0.5, -1.0, 2.0],
        np.array([0.1, 0.2, -0.1, 1.0]) / np.linalg.norm([0.1, 0.2, -0.1, 1.0]),
        [1.3]]), jnp.float32)
    pb = np.array(lie.sim3_apply(S_true, jnp.asarray(pa)))
    pb += rng.normal(0, 0.01, pb.shape)
    pb[:20] += rng.uniform(2, 5, (20, 3))   # 10% outliers
    S, chi2 = ba.optimize_icp(jnp.asarray(pa), jnp.asarray(pb),
                              jnp.ones(n, jnp.float32), huber_delta=0.1)
    S = np.asarray(S)
    assert abs(S[7] - 1.3) < 0.02, S[7]
    assert np.linalg.norm(S[:3] - np.asarray(S_true)[:3]) < 0.1
    assert (np.asarray(chi2)[20:] < 0.01).mean() > 0.9


def test_fit_sim3_trajectories(rng):
    T1 = np.zeros((30, 7), np.float32)
    T1[:, :3] = rng.uniform(-5, 5, (30, 3))
    T1[:, 6] = 1.0
    S_true = jnp.asarray([1.0, 2.0, -0.5, 0, 0, 0.3826834, 0.9238795, 0.8],
                         jnp.float32)
    T2 = T1.copy()
    T2[:, :3] = np.asarray(lie.sim3_apply(S_true, jnp.asarray(T1[:, :3])))
    S = np.asarray(ba.fit_sim3(jnp.asarray(T1), jnp.asarray(T2)))
    np.testing.assert_allclose(S, np.asarray(S_true), atol=1e-3)


def test_pose_jac_analytic_matches_autodiff(rng):
    """The closed-form pose Jacobian must equal jacfwd of the residual
    (it replaced autodiff inside optimize_pose for kernel-count reasons)."""
    import jax.numpy as jnp
    from pislamfusion_tpu.ops import ba as B
    T = jnp.asarray([0.3, -0.2, 0.1, 0.1, -0.05, 0.2, 0.97], jnp.float32)
    T = T / jnp.concatenate([jnp.ones(3), jnp.full(4, jnp.linalg.norm(T[3:7]))])
    pts = jnp.asarray(rng.uniform(-2, 2, (64, 3)).astype(np.float32))
    pts = pts.at[:, 2].add(5.0)
    pts = pts.at[0, 2].set(-6.0)   # one behind-camera point
    uv = jnp.asarray(rng.uniform(-0.5, 0.5, (64, 2)).astype(np.float32))
    Tb = jnp.broadcast_to(T, (64, 7))
    z6 = jnp.zeros(6, jnp.float32)
    z3 = jnp.zeros(3, jnp.float32)
    r_ref = B._reproj_val(z6, z3, Tb, pts, uv)
    J_ref, _ = B._reproj_jac(z6, z3, Tb, pts, uv)
    r, J = B._pose_jac_analytic(T, pts, uv)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ref),
                               rtol=1e-4, atol=1e-4)


def test_local_window_chunked_overflow(rng):
    """VERDICT r3 item 10: a local window exceeding BA_P/BA_O caps is
    solved in point chunks with an alternation pass instead of silently
    truncating — accuracy must match the uncapped single solve."""
    from pislamfusion_tpu.models.mapper import Mapper as MapperDemo
    from pislamfusion_tpu.utils import host_se3 as hse3

    F, Pn, On = 6, 900, 1800
    # ground truth: 4 cameras on a line looking at a cloud of Pn points
    g_poses = []
    for k in range(4):
        T = np.array([0.4 * k, 0.02 * k, 0.0, 0, 0, 0, 1], np.float32)
        g_poses.append(T)
    g_poses = np.stack(g_poses)
    pts_g = np.stack([rng.uniform(-3, 3, Pn), rng.uniform(-3, 3, Pn),
                      rng.uniform(8, 14, Pn)], -1).astype(np.float32)
    obs_f, obs_p, obs_uv = [], [], []
    for j in range(Pn):             # point-major, as _local_ba builds it
        for k in range(4):
            Tw2c = hse3.se3_inv(g_poses[k].astype(np.float64))
            pc = hse3.se3_apply(Tw2c, pts_g[j].astype(np.float64))
            if pc[2] <= 0.1:
                continue
            uv = pc[:2] / pc[2] + rng.normal(0, 5e-4, 2)
            obs_f.append(k)
            obs_p.append(j)
            obs_uv.append(uv)
    obs_f = np.asarray(obs_f, np.int32)
    obs_p = np.asarray(obs_p, np.int32)
    obs_uv = np.asarray(obs_uv, np.float32)
    assert len(obs_f) > 1600          # overflows the (300, 600) caps below

    noise_p = g_poses.copy()
    noise_p[1:, :3] += rng.normal(0, 0.05, (3, 3)).astype(np.float32)
    pts_n = pts_g + rng.normal(0, 0.05, pts_g.shape).astype(np.float32)
    fixed = np.array([True, False, False, False])
    poses_w2c = np.stack([np.asarray(hse3.se3_inv(p.astype(np.float64)),
                                     np.float32) for p in noise_p])

    def err(new_poses, new_pts):
        c2w = np.stack([np.asarray(hse3.se3_inv(p.astype(np.float64)))
                        for p in new_poses])
        ep = float(np.linalg.norm(c2w[:, :3] - g_poses[:, :3], axis=1).max())
        ept = float(np.sqrt(np.mean(np.sum((new_pts - pts_g) ** 2, -1))))
        return ep, ept

    # uncapped single solve (caps big enough to hold everything)
    p_big, x_big = MapperDemo.solve_local_window(
        poses_w2c, fixed, pts_n, obs_f, obs_p, obs_uv,
        (F, 1024, 4096), iters=25, huber_delta=0.01)
    # chunked: point cap 300, obs cap 600 -> >= 3 chunks + alternation
    p_chk, x_chk = MapperDemo.solve_local_window(
        poses_w2c, fixed, pts_n, obs_f, obs_p, obs_uv,
        (F, 300, 600), iters=25, huber_delta=0.01)

    ep_b, ept_b = err(p_big, x_big)
    ep_c, ept_c = err(p_chk, x_chk)
    # pose at the noise floor; point depth is weakly constrained by the
    # short baseline (~0.04 irreducible at depth 10 / baseline 1.2)
    assert ep_b < 0.02 and ept_b < 0.1, (ep_b, ept_b)
    # no accuracy cliff: chunked tracks the single solve
    assert ep_c < max(1.5 * ep_b, 0.02), (ep_c, ep_b)
    assert ept_c < max(1.5 * ept_b, 0.02), (ept_c, ept_b)
