from .map2d import MultiBandMap2D, WeightedMap2D, create_map2d
