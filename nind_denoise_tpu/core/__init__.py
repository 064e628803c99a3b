from . import imgio, tiles
