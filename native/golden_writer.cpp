// Golden-fixture emitter built against the REFERENCE'S OWN HEADERS.
//
// Compiled with `g++ -std=c++11 -I/root/reference/GSLAM` (see
// scripts/build_golden_fixtures.sh), this harness uses the reference's
// actual GSLAM::SIM3 / KeyPoint / GImage / Vocabulary types so every
// emitted byte carries the layouts the C++ compiler gives *the reference
// binary* — struct padding, size_t widths, quaternion component order —
// rather than our Python writer's reading of them. The fixtures it
// writes are committed under tests/data/golden/ and parsed by
// tests/test_maphash.py / tests/test_vocabulary.py.
//
// Byte semantics reproduced (cited, not copied):
//  * MapHash checkpoint stream: "Hash\nbinary\n" header, then raw
//    little-endian struct dumps per
//    /root/reference/GSLAM-DIYSLAM/src/zhaoyong/MapHash.cpp:305-456
//    (OutStream: `T tmp=obj; write((char*)&tmp,sizeof(tmp))`, vectors as
//    size_t count + elements, strings as size_t + bytes, GImage as
//    cols/rows/flags + data).
//  * .gbow vocabulary files and BoW transforms come from the reference's
//    own header-only implementation (GSLAM/core/Vocabulary.h:98-158) —
//    nothing re-implemented here at all.
//
// The harness also dumps a transform/score/distance expectation table
// (plain text) produced by the reference Vocabulary code on
// deterministically generated descriptors, so the Python side can run
// the identical queries and compare.
//
// Build WITHOUT -msse3/-msse4.2 (scripts/build_golden_fixtures.sh):
// the reference's own CMake sets no SSE flags, so its binary compiles
// CameraATAN::Project's scalar branch. The #ifdef __SSE3__ branch in
// Camera.h:259-267 is BUGGY (it subtracts z from x/y instead of
// dividing — `_mm_sub_pd(xy, {z,z})`) and never ships; enabling SSE3
// here would bake that wrong projection into the expectations.
#include <immintrin.h>

#include <GSLAM/core/GSLAM.h>
#include <GSLAM/core/Vocabulary.h>
#include <GSLAM/core/GPS.h>

#include <cstdint>
#include <cstdio>
#include <fstream>
#include <string>
#include <vector>

// ---------------------------------------------------------------- writer
// Same byte behavior as the reference's OutStream (MapHash.cpp:305-336):
// raw struct copy for PODs (including any padding bytes the copy carries),
// size_t-prefixed vectors/strings, cols/rows/flags + data for GImage.
struct RawWriter {
    std::ostream& os;
    template <class T>
    void put(const T& v) {
        T tmp = v;
        os.write(reinterpret_cast<const char*>(&tmp), sizeof(tmp));
    }
    template <class T>
    void put_vec(const std::vector<T>& v) {
        put<size_t>(v.size());
        for (const T& t : v) put(t);
    }
    void put_str(const std::string& s) {
        put<size_t>(s.size());
        os.write(s.data(), (std::streamsize)s.size());
    }
    void put_gimage(const GSLAM::GImage& im) {
        put<int>(im.cols);
        put<int>(im.rows);
        put<int>(im.flags);
        os.write(reinterpret_cast<const char*>(im.data),
                 (std::streamsize)(im.total() * im.elemSize()));
    }
};

// Deterministic descriptor source shared with the Python tests
// (tests/test_vocabulary.py::_lcg_descriptors): a bare 31-bit LCG.
static uint32_t g_lcg = 12345;
static uint32_t lcg_next() {
    g_lcg = (1103515245u * g_lcg + 12345u) & 0x7fffffffu;
    return g_lcg;
}

static GSLAM::GImage orb_descs(int n) {
    GSLAM::GImage m = GSLAM::GImage::create(
        n, 32, GSLAM::GImageType<uchar, 1>::Type);
    for (size_t i = 0; i < m.total(); ++i)
        m.data[i] = (uchar)((lcg_next() >> 16) & 0xff);
    return m;
}

static GSLAM::GImage sift_descs(int n) {
    GSLAM::GImage m = GSLAM::GImage::create(
        n, 128, GSLAM::GImageType<float, 1>::Type);
    float* p = reinterpret_cast<float*>(m.data);
    for (int i = 0; i < n * 128; ++i)
        p[i] = (float)(lcg_next() % 1000) / 250.0f;
    return m;
}

// ------------------------------------------------------------ map fixture
// A tiny but fully-populated map: 3 points, 2 frames with keypoints,
// colors, observations, parent/child connections, GPS vectors of two
// layouts, non-identity SIM3 poses. Field order follows
// MapHash::save (MapHash.cpp:376-456) exactly.
static void write_map(const std::string& path) {
    std::ofstream ofs(path.c_str(), std::ios::out | std::ios::binary);
    RawWriter w{ofs};
    ofs << "Hash" << std::endl;
    ofs << "binary" << std::endl;
    w.put<size_t>(2);  // frames
    w.put<size_t>(3);  // points

    struct P { size_t id; GSLAM::Point3d pos, nrm; GSLAM::ColorType c;
               size_t ref; };
    P pts[3] = {
        {7, {1.5, -2.0, 30.0}, {0, 0, -1}, GSLAM::ColorType(10, 20, 30), 4},
        {8, {-4.25, 8.5, 31.0}, {0.6, 0, -0.8},
         GSLAM::ColorType(200, 100, 50), 4},
        {9, {0.125, 0.5, 29.75}, {0, 0.28, -0.96},
         GSLAM::ColorType(1, 2, 3), 5},
    };
    for (const P& p : pts) {
        w.put<size_t>(p.id);
        w.put(p.pos);
        w.put(p.nrm);
        w.put(p.c);
        w.put<size_t>(p.ref);
        w.put_gimage(GSLAM::GImage());  // descriptor slot left empty,
                                        // like the reference writer
    }

    // frame 4: 6-vector GPS (lng lat alt sigmaH sigmaH sigmaV)
    {
        GSLAM::SO3 R = GSLAM::SO3::exp(GSLAM::Point3d(0.02, -0.01, 0.3));
        GSLAM::SIM3 pose(GSLAM::SE3(R, GSLAM::Point3d(10., 20., 120.)),
                         1.25);
        w.put<size_t>(4);
        w.put<double>(123.25);
        w.put(pose);
        w.put_gimage(GSLAM::GImage());
        w.put_str("img/000004.jpg");
        w.put<int>(3);
        std::vector<double> cam = {1920, 1080, 1200, 1200, 960, 540};
        w.put_vec(cam);
        std::vector<double> gps = {116.3, 39.9, 50.0, 2.0, 2.0, 5.0};
        w.put_vec(gps);
        w.put_gimage(GSLAM::GImage());
        std::vector<GSLAM::KeyPoint> kps;
        kps.push_back(GSLAM::KeyPoint(100.f, 200.f, 31.f, 90.f, 5.f, 0, -1));
        kps.push_back(GSLAM::KeyPoint(300.f, 400.f, 37.2f, -1.f, 3.f, 1, -1));
        kps.push_back(GSLAM::KeyPoint(640.5f, 360.25f, 31.f, 12.5f, 8.f,
                                      2, -1));
        w.put_vec(kps);
        std::vector<GSLAM::ColorType> cols;
        cols.push_back(GSLAM::ColorType(1, 2, 3));
        cols.push_back(GSLAM::ColorType(4, 5, 6));
        cols.push_back(GSLAM::ColorType(7, 8, 9));
        w.put_vec(cols);
        std::vector<std::pair<GSLAM::PointID, size_t> > obs;
        obs.push_back(std::make_pair((size_t)7, (size_t)0));
        obs.push_back(std::make_pair((size_t)8, (size_t)2));
        w.put_vec(obs);
        std::vector<std::pair<GSLAM::FrameID, int> > children, parents;
        children.push_back(std::make_pair((size_t)5, 42));
        w.put_vec(children);  // pair<size_t,int> carries 4 pad bytes of
        w.put_vec(parents);   // whatever the copy ctor leaves — as in C++
    }
    // frame 5: 14-vector GPS/PYR layout, no connections, scale 1
    {
        GSLAM::SO3 R = GSLAM::SO3::exp(GSLAM::Point3d(-0.1, 0.05, 1.1));
        GSLAM::SIM3 pose(GSLAM::SE3(R, GSLAM::Point3d(-3.5, 7.25, 119.)),
                         1.0);
        w.put<size_t>(5);
        w.put<double>(124.0);
        w.put(pose);
        w.put_gimage(GSLAM::GImage());
        w.put_str("img/000005.jpg");
        w.put<int>(1);
        std::vector<double> cam = {1920, 1080, 1200, 1200, 960, 540};
        w.put_vec(cam);
        std::vector<double> gps = {116.301, 39.901, 51.0, 2.0, 2.0, 5.0,
                                   1.0, -2.0, 30.0, 1.0, 1.0, 1.0,
                                   0.5, 0.5};
        w.put_vec(gps);
        w.put_gimage(GSLAM::GImage());
        std::vector<GSLAM::KeyPoint> kps;
        kps.push_back(GSLAM::KeyPoint(12.f, 34.f, 31.f, 45.f, 9.f, 0, -1));
        w.put_vec(kps);
        std::vector<GSLAM::ColorType> cols;
        cols.push_back(GSLAM::ColorType(9, 8, 7));
        w.put_vec(cols);
        std::vector<std::pair<GSLAM::PointID, size_t> > obs;
        obs.push_back(std::make_pair((size_t)9, (size_t)0));
        w.put_vec(obs);
        std::vector<std::pair<GSLAM::FrameID, int> > children, parents;
        parents.push_back(std::make_pair((size_t)4, 42));
        w.put_vec(children);
        w.put_vec(parents);
    }
    std::printf("wrote %s\n", path.c_str());
}

// ------------------------------------------------------- vocab fixtures
// Train a small vocabulary with the reference's own hierarchical k-means
// (Vocabulary.h:926+), save the .gbow with its own writer (:98-107), and
// dump the expectation table: transform word ids/weights for LCG query
// descriptors, pairwise BowVector L1 scores, and raw distances.
static void write_vocab(const std::string& stem, bool orb) {
    // few descriptors per image vs vocab size, so some words miss some
    // training images and the TF_IDF idf term is non-degenerate
    std::vector<GSLAM::TinyMat> train;
    for (int i = 0; i < 8; ++i)
        train.push_back(orb ? orb_descs(10) : sift_descs(10));
    SPtr<GSLAM::Vocabulary> voc = GSLAM::Vocabulary::create(
        train, 4, 2, GSLAM::Vocabulary::TF_IDF, GSLAM::Vocabulary::L1_NORM);
    voc->save(stem + ".gbow");

    GSLAM::TinyMat q1 = orb ? orb_descs(8) : sift_descs(8);
    GSLAM::TinyMat q2 = orb ? orb_descs(8) : sift_descs(8);
    GSLAM::BowVector v1, v2;
    GSLAM::FeatureVector f1, f2;
    voc->transform(q1, v1, f1, 1);
    voc->transform(q2, v2, f2, 1);

    std::ofstream txt((stem + "_expect.txt").c_str());
    txt.precision(10);
    txt << "words " << voc->size() << "\n";
    for (GSLAM::BowVector::const_iterator it = v1.begin(); it != v1.end();
         ++it)
        txt << "bow1 " << it->first << " " << it->second << "\n";
    for (GSLAM::BowVector::const_iterator it = v2.begin(); it != v2.end();
         ++it)
        txt << "bow2 " << it->first << " " << it->second << "\n";
    for (GSLAM::FeatureVector::const_iterator it = f1.begin();
         it != f1.end(); ++it) {
        txt << "fv1 " << it->first;
        for (size_t j = 0; j < it->second.size(); ++j)
            txt << " " << it->second[j];
        txt << "\n";
    }
    // per-feature word id for each query row (transform(feature) path,
    // Vocabulary.h:158)
    for (int i = 0; i < q1.rows; ++i) {
        GSLAM::TinyMat row(1, q1.cols, q1.type(),
                           q1.data + (size_t)i * q1.elemSize() * q1.cols);
        txt << "wid1 " << i << " " << voc->transform(row) << "\n";
    }
    // raw descriptor distances (L2^2 for float, Hamming for binary —
    // Vocabulary.h:278-287 / 2040-2116)
    for (int i = 0; i + 1 < 4; ++i) {
        GSLAM::TinyMat a(1, q1.cols, q1.type(),
                         q1.data + (size_t)i * q1.elemSize() * q1.cols);
        GSLAM::TinyMat b(1, q2.cols, q2.type(),
                         q2.data + (size_t)i * q2.elemSize() * q2.cols);
        txt << "dist " << i << " " << GSLAM::Vocabulary::distance(a, b)
            << "\n";
    }
    std::printf("wrote %s.gbow (+expect)\n", stem.c_str());
}

// ------------------------------------------------------- math fixtures
// Expectation table computed by the reference's own header-inline math:
// SO3 exp/ln, SE3 compose/inverse/apply, SIM3 apply, Camera model
// Project/UnProject (PinHole/ATAN/OpenCV), WGS84 GPS2XYZ/XYZ2GPS
// (SO3.h / SE3.h / SIM3.h / Camera.h / GPS.h:55-90). The Python side
// (tests/test_golden_reference.py) evaluates our lie/camera/gps modules
// on the same inputs and must match to double precision.
static void write_math(const std::string& path) {
    std::ofstream txt(path.c_str());
    txt.precision(17);
    const double ws[4][3] = {{0.02, -0.01, 0.3}, {1.2, -0.7, 0.4},
                             {0, 0, 0}, {-2.9, 0.1, 0.05}};
    for (int i = 0; i < 4; ++i) {
        GSLAM::SO3 q = GSLAM::SO3::exp(
            GSLAM::Point3d(ws[i][0], ws[i][1], ws[i][2]));
        txt << "so3exp " << i << " " << q.x << " " << q.y << " " << q.z
            << " " << q.w << "\n";
        GSLAM::Point3d l = q.ln();
        txt << "so3ln " << i << " " << l.x << " " << l.y << " " << l.z
            << "\n";
    }
    GSLAM::SE3 A(GSLAM::SO3::exp(GSLAM::Point3d(0.1, 0.2, -0.3)),
                 GSLAM::Point3d(1.0, -2.0, 3.0));
    GSLAM::SE3 B(GSLAM::SO3::exp(GSLAM::Point3d(-0.5, 0.05, 0.6)),
                 GSLAM::Point3d(0.5, 4.0, -1.5));
    GSLAM::SE3 C = A * B;
    GSLAM::SE3 Ai = A.inverse();
    GSLAM::Point3d pw(2.5, -1.25, 7.0);
    GSLAM::Point3d pA = A * pw;
    txt << "se3mul " << C.get_translation().x << " "
        << C.get_translation().y << " " << C.get_translation().z << " "
        << C.get_rotation().x << " " << C.get_rotation().y << " "
        << C.get_rotation().z << " " << C.get_rotation().w << "\n";
    txt << "se3inv " << Ai.get_translation().x << " "
        << Ai.get_translation().y << " " << Ai.get_translation().z << " "
        << Ai.get_rotation().x << " " << Ai.get_rotation().y << " "
        << Ai.get_rotation().z << " " << Ai.get_rotation().w << "\n";
    txt << "se3apply " << pA.x << " " << pA.y << " " << pA.z << "\n";
    GSLAM::SIM3 S(A, 1.75);
    GSLAM::Point3d pS = S * pw;
    txt << "sim3apply " << pS.x << " " << pS.y << " " << pS.z << "\n";

    // cameras: parameter-vector construction (Camera.h:407+ dispatch)
    const GSLAM::Point3d p3(0.35, -0.2, 2.0);
    {
        std::vector<double> ps = {1920, 1080, 1200, 1210, 955, 545};
        GSLAM::Camera cam(ps);
        GSLAM::Point2d uv = cam.Project(p3);
        GSLAM::Point3d ray = cam.UnProject(GSLAM::Point2d(100.5, 700.25));
        txt << "pinhole " << cam.CameraType() << " " << uv.x << " "
            << uv.y << " " << ray.x << " " << ray.y << " " << ray.z
            << "\n";
    }
    {
        std::vector<double> ps = {1920, 1080, 1200, 1210, 955, 545, 0.85};
        GSLAM::Camera cam(ps);
        GSLAM::Point2d uv = cam.Project(p3);
        GSLAM::Point3d ray = cam.UnProject(GSLAM::Point2d(100.5, 700.25));
        txt << "atan " << cam.CameraType() << " " << uv.x << " " << uv.y
            << " " << ray.x << " " << ray.y << " " << ray.z << "\n";
    }
    {
        std::vector<double> ps = {1920, 1080, 1200, 1210, 955, 545,
                                  0.1, -0.05, 0.001, -0.002, 0.02};
        GSLAM::Camera cam(ps);
        GSLAM::Point2d uv = cam.Project(p3);
        GSLAM::Point3d ray = cam.UnProject(GSLAM::Point2d(100.5, 700.25));
        txt << "opencv " << cam.CameraType() << " " << uv.x << " " << uv.y
            << " " << ray.x << " " << ray.y << " " << ray.z << "\n";
    }
    // WGS84 ECEF (GPS.h:55-90)
    GSLAM::Point3d ecef = GSLAM::GPS<>::GPS2XYZ(39.90, 116.30, 50.0);
    txt << "gps2xyz " << ecef.x << " " << ecef.y << " " << ecef.z << "\n";
    GSLAM::Point3d back = GSLAM::GPS<>::XYZ2GPS(ecef.x, ecef.y, ecef.z);
    txt << "xyz2gps " << back.x << " " << back.y << " " << back.z << "\n";
    std::printf("wrote %s\n", path.c_str());
}

int main(int argc, char** argv) {
    std::string outdir = argc > 1 ? argv[1] : ".";
    write_map(outdir + "/ref_map.maphash");
    g_lcg = 12345;
    write_vocab(outdir + "/ref_vocab_orb", true);
    g_lcg = 999331;
    write_vocab(outdir + "/ref_vocab_sift", false);
    write_math(outdir + "/ref_math_expect.txt");
    return 0;
}
