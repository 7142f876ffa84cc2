from . import orb
