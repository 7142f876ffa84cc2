// Golden BA fixture emitter: solves the reference's own optimizer
// simulation suite (tests/OptimizerTest.cpp:121-560) with the
// reference's vendored g2o stack
// (GSLAM-DIYSLAM/src/zhaoyong/optimizerG2O/Optimizer.cpp over the
// Eigen-only vendored g2o) and emits problems + solutions as text so
// tests/test_golden_ba.py can anchor ops/ba.py to reference-code
// output the way MapHash/.gbow already are.
//
// AUDIT NOTE (what the reference actually implements): OptimizerG2O
// implements optimizePnP and optimize() (mappoint bundle + EdgeSE3GPS
// edges, Huber sqrt(1e-5), LM<=50). optimizeICP/optimizePose fall
// through to the GSLAM::Optimizer base class, which returns false;
// optimize() IGNORES se3Graph/sim3Graph/invDepth edges (Optimizer.cpp:
// 228 commented dispatch, :229 error log); optimizeSE3Graph exists
// (:167-225) but is unreachable from the runtime and its EdgeSE3
// enforces T2 = M*T1 against the generator's T2 = T1*M convention.
// The fixtures therefore anchor the REAL paths (pnp, bundle,
// bundle+gps) exactly, and record optimizeSE3Graph's output for a
// non-inferiority comparison only.
//
// TEST-ONLY: compiled by scripts/build_golden_ba_fixtures.sh against
// the read-only reference checkout; never linked into the library.
// Inputs are generated with a private LCG (not GSLAM::Random) so the
// emitted problems are platform-independent; every input is written to
// the fixture, so the test never regenerates them.
#include <cmath>
#include <cstdarg>
#include <cstdio>
#include <cstdint>
#include <string>
#include <vector>

#include "Optimizer.h"   // OptimizerG2O (optimizerG2O/)

using GSLAM::Point3d;
using GSLAM::Point2d;
using GSLAM::SE3;
using GSLAM::SIM3;
using GSLAM::SO3;

static uint32_t lcg_state = 12345u;
static double urand() {                 // uniform [0,1)
    lcg_state = (1103515245u * lcg_state + 12345u) & 0x7fffffffu;
    return double(lcg_state) / double(0x80000000u);
}
static double urange(double lo, double hi) { return lo + (hi - lo) * urand(); }
static double ngauss(double mu, double sigma) {   // Box-Muller
    double u1 = urand(), u2 = urand();
    if (u1 < 1e-12) u1 = 1e-12;
    return mu + sigma * std::sqrt(-2.0 * std::log(u1))
                      * std::cos(2.0 * M_PI * u2);
}

static FILE* out = nullptr;
static void emit(const char* fmt, ...) {
    va_list ap; va_start(ap, fmt); vfprintf(out, fmt, ap); va_end(ap);
}
static void emit_se3(const char* tag, const SE3& T) {
    const pi::Point3d& t = T.get_translation();
    const pi::SO3d& q = T.get_rotation();
    emit("%s %.17g %.17g %.17g %.17g %.17g %.17g %.17g\n", tag,
         t.x, t.y, t.z, q.x, q.y, q.z, q.w);
}
static void emit_sim3(const char* tag, const SIM3& S) {
    const pi::Point3d& t = S.get_translation();
    const pi::SO3d& q = S.get_rotation();
    emit("%s %.17g %.17g %.17g %.17g %.17g %.17g %.17g %.17g\n", tag,
         t.x, t.y, t.z, q.x, q.y, q.z, q.w, S.get_scale());
}

static double ident6[36], ident7[49], gps_info6[36];

// ---------------------------------------------------------------- pnp
static void write_pnp() {
    int N = 300;
    // ground_w2c: the VertexSE3 estimate maps world->camera
    // (EdgeSE3IdealXYZ::computeError, types.h:245-248); observations are
    // normalized image-plane anchors (z=1)
    SE3 ground_c2w(SO3::exp(Point3d(0.2, -0.1, 0.3)),
                   Point3d(0.5, -0.2, 0.8));
    SE3 ground = ground_c2w.inverse();
    SE3 init = SE3(SO3::exp(Point3d(0.05, -0.05, 0.08)),
                   Point3d(0.2, 0.15, -0.2)) * ground;
    std::vector<std::pair<Point3d, GSLAM::CameraAnchor> > matches;
    emit("## pnp N %d\n", N);
    emit_se3("ground", ground);
    emit_se3("init", init);
    for (int i = 0; i < N; i++) {
        Point3d pCam(urange(-1, 1), urange(-1, 1), 1);
        Point3d pWorld = ground_c2w * (pCam * ngauss(10., 1.));
        Point3d noise(ngauss(0., i < N / 2 ? 0.02 : 0.002),
                      ngauss(0., i < N / 2 ? 0.02 : 0.002), 0);
        Point3d anchor = pCam + noise;            // z = 1 normalized
        matches.push_back(std::make_pair(pWorld, anchor));
        emit("m %.17g %.17g %.17g %.17g %.17g %.17g\n",
             pWorld.x, pWorld.y, pWorld.z, anchor.x, anchor.y, anchor.z);
    }
    OptimizerG2O opt;
    SE3 solved = init;
    bool ok = opt.optimizePnP(matches, solved);
    emit("ok %d\n", int(ok));
    emit_se3("solved", solved);
}

// --------------------------------------------------------- se3 graph
static void write_se3_graph() {
    int N = 60;
    double noise = 1e-2;
    GSLAM::BundleGraph graph;
    GSLAM::KeyFrameEstimzation cur = {SIM3(SE3(SO3(), Point3d(1, 0, 0)), 1.0),
                                      GSLAM::UPDATE_KF_SE3};
    SE3 odo;
    double angle = M_PI * 2 / N;
    odo.get_translation() = Point3d(cos(angle) - 1., sin(angle), 0);
    odo.get_rotation() = SO3::exp(Point3d(0, 0, -angle));
    emit("## se3_graph N %d\n", N);
    for (int i = 0; i < N; i++) {
        SE3 noised = odo * SE3(SO3::exp(Point3d(ngauss(0, noise),
                                                ngauss(0, noise),
                                                ngauss(0, noise))),
                               Point3d(ngauss(0, noise), ngauss(0, noise),
                                       ngauss(0, noise)));
        graph.keyframes.push_back(cur);
        GSLAM::SE3Edge e;
        e.firstId = i; e.secondId = i + 1;
        e.measurement = noised;
        e.information = ident6;
        graph.se3Graph.push_back(e);
        if (i == 0) graph.keyframes.back().dof = GSLAM::UPDATE_KF_NONE;
        else if (i + 1 == N) graph.se3Graph.back().secondId = 0;
        cur.estimation = cur.estimation * SIM3(noised, 1.0);
    }
    for (int i = 0; i < N; i++)
        emit_sim3("kf", graph.keyframes[i].estimation);
    for (size_t i = 0; i < graph.se3Graph.size(); i++) {
        emit("edge %d %d ", int(graph.se3Graph[i].firstId),
             int(graph.se3Graph[i].secondId));
        emit_se3("", graph.se3Graph[i].measurement);
    }
    OptimizerG2O opt;
    bool ok = opt.optimizeSE3Graph(graph);   // optimize() ignores se3Graph
    emit("ok %d\n", int(ok));
    for (int i = 0; i < N; i++)
        emit_sim3("solved", graph.keyframes[i].estimation);
}

// ------------------------------------------------------------ bundle
static void write_bundle() {
    int N = 400;
    double noise = 1e-2, projNoise = 1e-4;
    SE3 firstPose(SO3::exp(Point3d(0.1, -0.2, 0.15)),
                  Point3d(0.3, 0.7, -0.2));
    SE3 secondPose = firstPose * SE3(SO3::exp(Point3d(0.1, 0.1, 0.1)),
                                     Point3d(1., 1., 1.));
    SE3 noisedSecond = secondPose * SE3(
        SO3::exp(Point3d(ngauss(0, noise), ngauss(0, noise),
                         ngauss(0, noise))),
        Point3d(ngauss(0, noise), ngauss(0, noise), ngauss(0, noise)));
    GSLAM::BundleGraph graph;
    GSLAM::KeyFrameEstimzation kf0 = {SIM3(firstPose, 1.0),
                                      GSLAM::UPDATE_KF_NONE};
    GSLAM::KeyFrameEstimzation kf1 = {SIM3(noisedSecond, 1.0),
                                      GSLAM::UPDATE_KF_SE3};
    graph.keyframes.push_back(kf0);
    graph.keyframes.push_back(kf1);
    emit("## bundle\n");
    emit_se3("kf0", firstPose);
    emit_se3("kf1_ground", secondPose);
    emit_se3("kf1_init", noisedSecond);
    static std::vector<double> obs_info(4);
    obs_info[0] = 1; obs_info[1] = 0; obs_info[2] = 0; obs_info[3] = 1;
    for (int i = 0; i < N; i++) {
        Point3d pCam(urange(-1, 1), urange(-1, 1), 1);
        Point3d pWorld = firstPose * (pCam * 10.0);
        Point3d pCam2 = secondPose.inverse() * pWorld;
        if (pCam2.z <= 1) continue;
        pCam2 = pCam2 / pCam2.z;
        if (fabs(pCam2.x) > 1 || fabs(pCam2.y) > 1) continue;
        Point3d pNoise(ngauss(0, noise), ngauss(0, noise),
                       ngauss(0, noise));
        Point3d n0(ngauss(0, projNoise), ngauss(0, projNoise), 0);
        Point3d n1(ngauss(0, projNoise), ngauss(0, projNoise), 0);
        graph.mappoints.push_back(
            std::make_pair(pWorld + pNoise, true));
        GSLAM::BundleEdge e0, e1;
        e0.pointId = graph.mappoints.size() - 1; e0.frameId = 0;
        e0.measurement = pCam + n0; e0.information = nullptr;
        e1.pointId = graph.mappoints.size() - 1; e1.frameId = 1;
        e1.measurement = pCam2 + n1; e1.information = nullptr;
        graph.mappointObserves.push_back(e0);
        graph.mappointObserves.push_back(e1);
        emit("pt %.17g %.17g %.17g ground %.17g %.17g %.17g\n",
             pWorld.x + pNoise.x, pWorld.y + pNoise.y, pWorld.z + pNoise.z,
             pWorld.x, pWorld.y, pWorld.z);
        emit("ob0 %.17g %.17g %.17g\n", e0.measurement.x,
             e0.measurement.y, e0.measurement.z);
        emit("ob1 %.17g %.17g %.17g\n", e1.measurement.x,
             e1.measurement.y, e1.measurement.z);
    }
    OptimizerG2O opt;
    bool ok = opt.optimize(graph);
    emit("ok %d\n", int(ok));
    emit_sim3("solved_kf1", graph.keyframes[1].estimation);
    for (size_t i = 0; i < graph.mappoints.size(); i++)
        emit("solved_pt %.17g %.17g %.17g\n",
             graph.mappoints[i].first.x, graph.mappoints[i].first.y,
             graph.mappoints[i].first.z);
}


// -------------------------------------------------------- bundle+gps
static void write_bundle_gps() {
    // the reference's GPS-fusion BA shape (MapperDemo gpsGraph usage):
    // free keyframes anchored by EdgeSE3GPS priors (c2w measurement,
    // diag info {1,1,0.5,0.1,0.1,0.1}) + mappoint reprojection edges
    int NK = 4, NP = 150;
    double noise = 2e-2, projNoise = 1e-4, gpsNoise = 5e-3;
    std::vector<SE3> ground_c2w;
    GSLAM::BundleGraph graph;
    emit("## bundle_gps NK %d NP %d\n", NK, NP);
    for (int k = 0; k < NK; k++) {
        SE3 g(SO3::exp(Point3d(0.02 * k, -0.01 * k, 0.03 * k)),
              Point3d(1.0 * k, 0.1 * k, 0.0));
        ground_c2w.push_back(g);
        SE3 noised = g * SE3(SO3::exp(Point3d(ngauss(0, noise),
                                              ngauss(0, noise),
                                              ngauss(0, noise))),
                             Point3d(ngauss(0, noise), ngauss(0, noise),
                                     ngauss(0, noise)));
        GSLAM::KeyFrameEstimzation kf = {SIM3(noised, 1.0),
                                         GSLAM::UPDATE_KF_SE3};
        graph.keyframes.push_back(kf);
        SE3 gps = g * SE3(SO3::exp(Point3d(ngauss(0, gpsNoise),
                                           ngauss(0, gpsNoise),
                                           ngauss(0, gpsNoise))),
                          Point3d(ngauss(0, gpsNoise), ngauss(0, gpsNoise),
                                  ngauss(0, gpsNoise)));
        GSLAM::GPSEdge e;
        e.frameId = k;
        e.measurement = gps;
        e.information = gps_info6;
        graph.gpsGraph.push_back(e);
        emit_se3("kf_ground", g);
        emit_se3("kf_init", noised);
        emit_se3("gps", gps);
    }
    emit("gpsinfo %.17g %.17g %.17g %.17g %.17g %.17g\n",
         gps_info6[0], gps_info6[7], gps_info6[14], gps_info6[21],
         gps_info6[28], gps_info6[35]);
    for (int i = 0; i < NP; i++) {
        Point3d pCam(urange(-1, 1), urange(-1, 1), 1);
        Point3d pWorld = ground_c2w[0] * (pCam * ngauss(10., 0.5));
        Point3d pNoise(ngauss(0, noise), ngauss(0, noise),
                       ngauss(0, noise));
        graph.mappoints.push_back(std::make_pair(pWorld + pNoise, true));
        emit("pt %.17g %.17g %.17g\n", pWorld.x + pNoise.x,
             pWorld.y + pNoise.y, pWorld.z + pNoise.z);
        for (int k = 0; k < NK; k++) {
            Point3d pc = ground_c2w[k].inverse() * pWorld;
            if (pc.z <= 1) continue;
            pc = pc / pc.z;
            if (fabs(pc.x) > 1.2 || fabs(pc.y) > 1.2) continue;
            Point3d n(ngauss(0, projNoise), ngauss(0, projNoise), 0);
            GSLAM::BundleEdge e;
            e.pointId = graph.mappoints.size() - 1;
            e.frameId = k;
            e.measurement = pc + n;
            e.information = nullptr;
            graph.mappointObserves.push_back(e);
            emit("ob %d %d %.17g %.17g\n", int(e.pointId), k,
                 e.measurement.x, e.measurement.y);
        }
    }
    OptimizerG2O opt;
    bool ok = opt.optimize(graph);
    emit("ok %d\n", int(ok));
    for (int k = 0; k < NK; k++)
        emit_sim3("solved_kf", graph.keyframes[k].estimation);
    for (size_t i = 0; i < graph.mappoints.size(); i++)
        emit("solved_pt %.17g %.17g %.17g\n",
             graph.mappoints[i].first.x, graph.mappoints[i].first.y,
             graph.mappoints[i].first.z);
}

int main(int argc, char** argv) {
    std::string dir = argc > 1 ? argv[1] : ".";
    for (int i = 0; i < 36; i++) ident6[i] = (i % 7 == 0) ? 1.0 : 0.0;
    for (int i = 0; i < 49; i++) ident7[i] = (i % 8 == 0) ? 1.0 : 0.0;
    double gi[6] = {1, 1, 0.5, 0.1, 0.1, 0.1};
    for (int i = 0; i < 36; i++) gps_info6[i] = 0.0;
    for (int i = 0; i < 6; i++) gps_info6[i * 7] = gi[i];

    out = fopen((dir + "/ref_ba_expect.txt").c_str(), "w");
    if (!out) { fprintf(stderr, "cannot open output\n"); return 1; }
    write_pnp();
    write_se3_graph();
    write_bundle();
    write_bundle_gps();
    fclose(out);
    printf("golden BA fixtures written to %s\n", dir.c_str());
    return 0;
}
