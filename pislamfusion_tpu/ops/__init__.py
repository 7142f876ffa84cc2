from . import lie
