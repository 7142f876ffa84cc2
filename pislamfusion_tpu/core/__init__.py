from .svar import Svar, Scommand, svar, scommand
from .registry import (Registry, TRACKERS, MAPPERS, MATCHERS, INITIALIZERS,
                       FEATURE_DETECTORS, MAPS, LOOP_DETECTORS, LOOP_CLOSERS,
                       RELOCALIZERS, ESTIMATORS, OPTIMIZERS, DATASETS, MAP2DS)
from .camera import Camera, CameraATAN, CameraOpenCV, undistort_map
from .timer import Timer, Rate, timer
from .messenger import Messenger, DataTrans, ThreadPool, messenger, trans, trans_plane
from . import gps
