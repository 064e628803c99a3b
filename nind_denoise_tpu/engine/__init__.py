from .tile_engine import TileEngine
