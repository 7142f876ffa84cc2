"""Svar config parser parity tests (reference: GSLAM Svar.h + Default.cfg)."""
import textwrap

from pislamfusion_tpu.core.svar import Svar, Scommand


def write(tmp_path, name, content):
    p = tmp_path / name
    p.write_text(textwrap.dedent(content))
    return str(p)


def test_basic_assign_and_default(tmp_path):
    cfg = write(tmp_path, "a.cfg", """\
        Tracker?=opt
        Tracker?=other
        Mapper=demo
        SLAM.nFeature  ?= 1000
    """)
    s = Svar()
    s.parse_file(cfg)
    assert s.get_string("Tracker") == "opt"       # ?= keeps first
    assert s.get_string("Mapper") == "demo"
    assert s.get_int("SLAM.nFeature") == 1000


def test_expansion_and_comments(tmp_path):
    cfg = write(tmp_path, "a.cfg", """\
        DataPath?=/data/npu
        # full line comment
        Dataset=$(DataPath)/phantom3-npu.rtm   // trailing comment
        Map.File2Save=$(DataPath)/result.png
    """)
    s = Svar()
    s.parse_file(cfg)
    assert s.get_string("Dataset") == "/data/npu/phantom3-npu.rtm"
    assert s.get_string("Map.File2Save") == "/data/npu/result.png"


def test_conditionals(tmp_path):
    cfg = write(tmp_path, "a.cfg", """\
        FeatureDetector?=Sift
        if $(FeatureDetector)=Sift
        Vocabulary?=sift_10_4_tf_l1.gbow
        else
        Vocabulary?=orb_10_5_tfidf_l1.gbow
        endif
        Map2D.Type?=3
        if $(Map2D.Type)=4
        Win3D.Enable=0
        endif
        Win3D.Enable?=1
    """)
    s = Svar()
    s.parse_file(cfg)
    assert s.get_string("Vocabulary") == "sift_10_4_tf_l1.gbow"
    assert s.get_int("Win3D.Enable") == 1


def test_else_branch(tmp_path):
    cfg = write(tmp_path, "a.cfg", """\
        FeatureDetector=ORB
        if $(FeatureDetector)=Sift
        Vocabulary=sift.gbow
        else
        Vocabulary=orb.gbow
        endif
    """)
    s = Svar()
    s.parse_file(cfg)
    assert s.get_string("Vocabulary") == "orb.gbow"


def test_include(tmp_path):
    write(tmp_path, "inc.cfg", "Child=1\n")
    cfg = write(tmp_path, "a.cfg", """\
        include inc.cfg
        Parent=2
    """)
    s = Svar()
    s.parse_file(cfg)
    assert s.get_int("Child") == 1 and s.get_int("Parent") == 2


def test_parse_main_overrides(tmp_path):
    cfg = write(tmp_path, "Default.cfg", "A=1\nB=2\n")
    s = Svar()
    pos = s.parse_main([f"conf={cfg}", "B=3", "/data/x.rtm"])
    assert s.get_int("A") == 1
    assert s.get_int("B") == 3          # CLI wins over file
    assert pos == ["/data/x.rtm"]


def test_get_vec():
    s = Svar()
    s.set("Camera.Paraments", "1000 750 717.485 717.485 500 375")
    assert s.get_vec("Camera.Paraments") == [1000, 750, 717.485, 717.485, 500, 375]


def test_scommand():
    bus = Scommand()
    seen = []
    bus.register("MapWidget", lambda p: seen.append(p))
    bus.call("MapWidget Map2DUpdate 108.9 34.2")
    assert seen == ["Map2DUpdate 108.9 34.2"]
    bus.call("Unknown foo")  # no raise


def test_glog_sinks_and_scoped_logger(tmp_path):
    """Glog.h equivalents: sinks + severity gating + ScopedLogger bitmask."""
    from pislamfusion_tpu.core import glog
    from pislamfusion_tpu.core.svar import Svar
    path = str(tmp_path / "run.log")
    sink = glog.LogFileSink(path)
    glog.logger.add_sink(sink)
    glog.logger.info("hello info")
    glog.logger.error("bad thing")
    glog.logger.remove_sink(sink)
    sink.close()
    text = open(path).read()
    assert "hello info" in text and "bad thing" in text
    assert text.splitlines()[0].startswith("I")
    # ScopedLogger: flushes only when the Verbose bit is set
    cfg = Svar()
    got = []
    with glog.ScopedLogger(cfg, bit=1, sink=got.append) as lg:
        lg << "frame 1" << ",tracked"
    assert got == []            # SLAM.Verbose unset
    cfg.set("SLAM.Verbose", "1")
    with glog.ScopedLogger(cfg, bit=1, sink=got.append) as lg:
        lg << "frame 2" << ",tracked"
    assert got == ["frame 2,tracked"]
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        glog.check(False, "fatal check")
